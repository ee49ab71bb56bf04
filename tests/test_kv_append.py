"""Pallas in-place KV append vs the XLA scatter path (kernel-vs-oracle,
SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.kv_cache import PAD_SLOT
from lightvllm_tpu.ops.pallas.kv_append import kv_append_pallas


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B", [3, 8])
def test_append_matches_scatter(dtype, B):
    NB, Hkv, BSZ, D = 16, 4, 16, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = jax.random.normal(ks[0], (NB, Hkv, BSZ, D), dtype)
    vp = jax.random.normal(ks[1], (NB, Hkv, BSZ, D), dtype)
    k_new = jax.random.normal(ks[2], (B, Hkv, D), dtype)
    v_new = jax.random.normal(ks[3], (B, Hkv, D), dtype)
    rng = np.random.default_rng(0)
    slots = rng.choice(NB * BSZ, size=B, replace=False).astype(np.int32)
    slots[-1] = PAD_SLOT  # padding row: must be skipped

    # Oracle: the XLA scatter path.
    blocks = slots // BSZ
    offs = slots % BSZ
    heads = np.arange(Hkv)
    idx = (jnp.asarray(blocks)[:, None], jnp.asarray(heads)[None, :], jnp.asarray(offs)[:, None])
    want_k = kp.at[idx].set(k_new, mode="drop")
    want_v = vp.at[idx].set(v_new, mode="drop")

    got_k, got_v = kv_append_pallas(
        kp, vp, k_new, v_new, jnp.asarray(slots), block_size=BSZ, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got_k, np.float32), np.asarray(want_k, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_v, np.float32), np.asarray(want_v, np.float32)
    )
