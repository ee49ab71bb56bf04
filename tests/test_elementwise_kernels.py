"""Standalone Pallas elementwise kernels vs jnp oracles (SURVEY.md §4
kernel-vs-reference pattern; mirrors the reference's test_gemm/test_softmax/
test_layernorm suite with the oracles from ops/norms.py, ops/activations.py
and jax.nn.softmax)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.activations import swiglu
from lightvllm_tpu.ops.norms import add_rms_norm, rms_norm
from lightvllm_tpu.ops.pallas.elementwise import (
    add_rms_norm_pallas,
    online_softmax_pallas,
    rms_norm_pallas,
    softmax_pallas,
    swiglu_pallas,
)

# CPU backend runs Pallas in forced interpret mode.
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("shape", [(32, 128), (100, 384), (7, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_swiglu(shape, dtype):
    kg, ku = jax.random.split(jax.random.PRNGKey(0))
    g = jax.random.normal(kg, shape, dtype)
    u = jax.random.normal(ku, shape, dtype)
    want = swiglu(g, u)
    got = swiglu_pallas(g, u)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-3
    )


@pytest.mark.parametrize("shape", [(32, 128), (250, 1024)])
def test_rms_norm(shape):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, shape[-1:], jnp.float32)
    want = rms_norm(x, w, 1e-6)
    got = rms_norm_pallas(x, w, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_add_rms_norm():
    kx, kr, kw = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(kx, (48, 256), jnp.float32)
    r = jax.random.normal(kr, (48, 256), jnp.float32)
    w = jax.random.normal(kw, (256,), jnp.float32)
    want_n, want_r = add_rms_norm(x, r, w, 1e-6)
    got_n, got_r = add_rms_norm_pallas(x, r, w, 1e-6)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape", [(64, 256), (33, 2048)])
def test_softmax(shape):
    x = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32) * 4
    want = jax.nn.softmax(x, axis=-1)
    got = softmax_pallas(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("d,chunk", [(512, 128), (2048, 512), (256, 256)])
def test_online_softmax(d, chunk):
    x = jax.random.normal(jax.random.PRNGKey(4), (40, d), jnp.float32) * 4
    want = jax.nn.softmax(x, axis=-1)
    got = online_softmax_pallas(x, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_kernel_backend_switch_end_to_end():
    """Config.kernel_backend='pallas' produces the same decode as native."""
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.ops import backend
    from lightvllm_tpu import SamplingParams

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    kw = dict(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=128, max_num_seqs=4, eos=127,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    try:
        native = LLMEngine(**kw).generate([[1, 2, 3]], sp, use_tqdm=False)
        # head_dim 16 is not lane-aligned for the pallas elementwise tiles?
        # rows/lanes here: last dims are hidden (64) / inter (128) — fine in
        # interpret mode on CPU.
        pallas = LLMEngine(kernel_backend="pallas", **kw).generate(
            [[1, 2, 3]], sp, use_tqdm=False
        )
    finally:
        backend.set_kernel_backend("native")
    assert native[0]["token_ids"] == pallas[0]["token_ids"]
