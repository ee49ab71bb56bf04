"""Paged flash-decode Pallas kernel vs the jnp oracle.

Pattern per reference test suite (kernel vs reference implementation on
random inputs, parametrized shapes, allclose) — SURVEY.md §4 — with the
oracle being ops/attention.py's gather-based paged attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.attention import paged_decode_attention
from lightvllm_tpu.ops.kv_cache import KVCache
from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode
from lightvllm_tpu.utils.metadata import DecodeMeta

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'


def make_case(key, B, Hq, Hkv, D, BSZ, NB_total, ctx_lens, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, Hq, D), dtype)
    k_pages = jax.random.normal(ks[1], (NB_total, Hkv, BSZ, D), dtype)
    v_pages = jax.random.normal(ks[2], (NB_total, Hkv, BSZ, D), dtype)
    NB = max((c + BSZ - 1) // BSZ for c in ctx_lens)
    # Random non-overlapping-ish block tables.
    rng = np.random.default_rng(0)
    bt = rng.permutation(NB_total)[: B * NB].reshape(B, NB).astype(np.int32)
    return q, k_pages, v_pages, jnp.asarray(bt), jnp.asarray(ctx_lens, jnp.int32)


def oracle(q, k_pages, v_pages, bt, ctx, BSZ, scale):
    cache = KVCache(k=(k_pages,), v=(v_pages,))
    meta = DecodeMeta(
        positions=ctx - 1,
        ctx_lens=ctx,
        block_tables=bt,
        temperatures=jnp.zeros(q.shape[0], jnp.float32),
        top_ks=jnp.zeros(q.shape[0], jnp.int32),
        top_ps=jnp.ones(q.shape[0], jnp.float32),
        seeds=jnp.full(q.shape[0], -1, jnp.int32),
    )
    return paged_decode_attention(q, cache, 0, meta, BSZ, scale)


@pytest.mark.parametrize(
    "B,Hq,Hkv,D,BSZ,ctx_lens",
    [
        (4, 8, 4, 128, 16, [5, 16, 33, 48]),
        (2, 16, 8, 128, 32, [64, 17]),
        (3, 4, 4, 128, 16, [1, 2, 31]),  # MHA, tiny contexts
        (1, 8, 1, 128, 16, [40]),  # MQA
    ],
)
def test_decode_kernel_matches_oracle(B, Hq, Hkv, D, BSZ, ctx_lens):
    scale = D**-0.5
    q, kp, vp, bt, ctx = make_case(
        jax.random.PRNGKey(1), B, Hq, Hkv, D, BSZ, 64, ctx_lens
    )
    want = oracle(q, kp, vp, bt, ctx, BSZ, scale)
    got = paged_flash_decode(
        q, kp, vp, bt, ctx, block_size=BSZ, scale=scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_decode_kernel_padding_rows_are_finite():
    # ctx 0 rows (batch padding) are treated as 1-token rows: finite output
    # (discarded by the engine), never NaN, and real rows unaffected.
    scale = 128**-0.5
    q, kp, vp, bt, ctx = make_case(
        jax.random.PRNGKey(2), 2, 8, 4, 128, 16, 32, [20, 0]
    )
    got = paged_flash_decode(
        q, kp, vp, bt, ctx, block_size=16, scale=scale, interpret=True
    )
    assert np.isfinite(np.asarray(got, np.float32)).all()
    want_row0 = oracle(q, kp, vp, bt, jnp.array([20, 1], jnp.int32), 16, scale)[0]
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want_row0), rtol=2e-5, atol=2e-5
    )


def _cast_pages_fp8(pages):
    """Scale-free e4m3 cast matching ops/kv_cache.to_kv_dtype."""
    from lightvllm_tpu.ops.kv_cache import to_kv_dtype
    from lightvllm_tpu.ops.quantization import FP8_DTYPE

    return to_kv_dtype(pages, FP8_DTYPE)


def test_decode_kernel_fp8_kv():
    scale = 128**-0.5
    q, kp, vp, bt, ctx = make_case(
        jax.random.PRNGKey(4), 3, 8, 4, 128, 16, 64, [5, 33, 48]
    )
    kq, vq = _cast_pages_fp8(kp), _cast_pages_fp8(vp)
    want = oracle(q, kq, vq, bt, ctx, 16, scale)  # same fp8 data, f32 math
    got = paged_flash_decode(
        q, kq, vq, bt, ctx, block_size=16, scale=scale, interpret=True,
    )
    # fp8 kernel computes in bf16 vs the oracle's f32 upcast: tolerance
    # reflects bf16 matmul rounding, not the e4m3 storage error.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_decode_kernel_bf16_io():
    scale = 128**-0.5
    q, kp, vp, bt, ctx = make_case(
        jax.random.PRNGKey(3), 2, 8, 4, 128, 16, 32, [30, 47], dtype=jnp.bfloat16
    )
    want = oracle(q, kp, vp, bt, ctx, 16, scale)
    got = paged_flash_decode(
        q, kp, vp, bt, ctx, block_size=16, scale=scale, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("dequant_mode", ["fold", "s8"])
def test_decode_kernel_int8_inpage_scales(dequant_mode):
    """int8 pages with in-page scale heads vs the oracle on DEQUANTIZED
    pages: covers the dequant-fold paths (per-page K scale folded into q,
    per-page V scale folded into the output partial) and the s8 variant
    (int8-MXU dots with quantized folded-q and p) that only run on the
    has_scale kernel branch."""
    from lightvllm_tpu.ops.kv_cache import encode_page_scales, truncate_scale

    scale = 128**-0.5
    B, Hq, Hkv, D, BSZ = 3, 8, 4, 128, 16
    ctx_lens = [5, 33, 48]
    q, kp, vp, bt, ctx = make_case(
        jax.random.PRNGKey(5), B, Hq, Hkv, D, BSZ, 64, ctx_lens
    )
    # Per-(page, head, channel) symmetric int8 quantization, bf16 scales
    # (the engine stores truncate_scale'd values so in-page bytes
    # dequantize exactly).
    amax = jnp.max(jnp.abs(kp), axis=2) + 1e-6  # (NB, Hkv, D)
    sck = truncate_scale(amax / 127.0)
    amax_v = jnp.max(jnp.abs(vp), axis=2) + 1e-6
    scv = truncate_scale(amax_v / 127.0)
    kq = jnp.clip(jnp.round(kp / sck[:, :, None, :]), -127, 127).astype(jnp.int8)
    vq = jnp.clip(jnp.round(vp / scv[:, :, None, :]), -127, 127).astype(jnp.int8)
    # Oracle runs on the exactly-dequantized f32 pages.
    k_deq = kq.astype(jnp.float32) * sck[:, :, None, :]
    v_deq = vq.astype(jnp.float32) * scv[:, :, None, :]
    want = oracle(q, k_deq, v_deq, bt, ctx, BSZ, scale)
    kq_paged = jnp.concatenate(
        [kq, encode_page_scales(sck, scv, BSZ)], axis=1
    )  # (NB, Hkv + Sh, BSZ, D)
    got = paged_flash_decode(
        q, kq_paged, vq, bt, ctx, sc_shards=1, block_size=BSZ, scale=scale,
        dequant_mode=dequant_mode, interpret=True,
    )
    # Kernel matmuls run in bf16 (int8 payload exact; q*sc_k rounded to
    # bf16; V rescale in f32): tolerance reflects bf16 rounding only.
    # "s8" additionally quantizes the folded q per row and p to 1/127
    # granularity (int8-MXU dots) — ~1% relative, still inside 3e-2.
    tol = 3e-2 if dequant_mode == "s8" else 2e-2
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=tol, atol=tol
    )
