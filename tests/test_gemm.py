"""Standalone Pallas tiled GEMM vs the jnp oracle (SURVEY.md §2.2 parity
twin of the reference's sliced-K CUDA GEMM; shape/tolerance pattern from
`lightvllm/test/test_gemm.py:5-34,40-65`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lightvllm_tpu.ops.pallas.gemm import gemm_pallas


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


# The reference sweeps 64^3 .. 512x256x128 (test_gemm.py:5-34); same
# range here plus non-square and tile-boundary cases.
SHAPES = [
    (64, 64, 64),
    (128, 128, 128),
    (512, 128, 256),
    (512, 256, 128),
    (8, 384, 128),  # single-sublane-tile M
    (256, 1024, 512),  # multi-K-slice accumulation
]


@pytest.mark.parametrize("m,k,n", SHAPES)
def test_gemm_f32(m, k, n):
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(ka, (m, k), jnp.float32)
    b = jax.random.normal(kb, (k, n), jnp.float32)
    want = a @ b
    got = gemm_pallas(a, b)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4 * k**0.5
    )


@pytest.mark.parametrize("m,k,n", [(128, 256, 128), (64, 128, 384)])
def test_gemm_bf16(m, k, n):
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(ka, (m, k), jnp.bfloat16)
    b = jax.random.normal(kb, (k, n), jnp.bfloat16)
    # f32 accumulation: compare against the f32 product of the bf16 inputs.
    want = a.astype(jnp.float32) @ b.astype(jnp.float32)
    got = gemm_pallas(a, b)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-1
    )


def test_gemm_explicit_tiles():
    ka, kb = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.normal(ka, (256, 512), jnp.float32)
    b = jax.random.normal(kb, (512, 256), jnp.float32)
    want = a @ b
    got = gemm_pallas(a, b, tm=64, tn=128, tk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=3e-3)
