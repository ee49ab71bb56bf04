"""Paged varlen flash-prefill Pallas kernel vs the jnp oracle.

Pattern per reference test suite (kernel vs reference implementation on
random inputs, parametrized shapes, allclose) — SURVEY.md §4 — with the
oracle being ops/attention.py's gather-based paged prefill attention.
Exercised through the paged_prefill_attention_pallas wrapper so the
rectangularize/flatten plumbing is covered too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.attention import (
    paged_prefill_attention,
    paged_prefill_attention_pallas,
)
from lightvllm_tpu.ops.kv_cache import KVCache, write_kv_layer
from lightvllm_tpu.utils.metadata import PrefillMeta

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'


def build_case(key, Hq, Hkv, D, BSZ, NB_total, ctx_lens, cached_lens, dtype):
    """Random paged cache + flat queries for a batch of part-cached seqs."""
    B = len(ctx_lens)
    new_lens = [c - p for c, p in zip(ctx_lens, cached_lens)]
    T = sum(new_lens)
    Sq = max(new_lens)
    NB = max((c + BSZ - 1) // BSZ for c in ctx_lens)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (T, Hq, D), dtype)
    shape = (NB_total, Hkv, BSZ, D)
    cache = KVCache(
        k=(jax.random.normal(ks[1], shape, dtype),),
        v=(jax.random.normal(ks[2], shape, dtype),),
    )
    rng = np.random.default_rng(0)
    bt = rng.permutation(NB_total)[: B * NB].reshape(B, NB).astype(np.int32)

    token_seq = np.zeros(T, np.int32)
    token_rect_pos = np.zeros(T, np.int32)
    rect_index = np.full((B, Sq), T, np.int32)
    last_flat_idx = np.zeros(B, np.int32)
    t = 0
    for b, n in enumerate(new_lens):
        token_seq[t : t + n] = b
        token_rect_pos[t : t + n] = np.arange(n)
        rect_index[b, :n] = np.arange(t, t + n)
        last_flat_idx[b] = t + n - 1
        t += n
    meta = PrefillMeta(
        slot_mapping=jnp.zeros(T, jnp.int32),
        token_seq=jnp.asarray(token_seq),
        token_rect_pos=jnp.asarray(token_rect_pos),
        rect_index=jnp.asarray(rect_index),
        cached_lens=jnp.asarray(cached_lens, jnp.int32),
        ctx_lens=jnp.asarray(ctx_lens, jnp.int32),
        block_tables=jnp.asarray(bt),
        last_flat_idx=jnp.asarray(last_flat_idx),
        temperatures=jnp.zeros(B, jnp.float32),
        top_ks=jnp.zeros(B, jnp.int32),
        top_ps=jnp.ones(B, jnp.float32),
        seeds=jnp.full(B, -1, jnp.int32),
    )
    return q, cache, meta


@pytest.mark.parametrize(
    "Hq,Hkv,D,BSZ,ctx_lens,cached_lens",
    [
        (8, 4, 128, 16, [5, 16, 33, 48], [0, 0, 0, 0]),  # fresh prompts
        (8, 4, 128, 16, [40, 33], [32, 16]),  # prefix-cache hits
        (4, 4, 128, 32, [1, 70, 31], [0, 64, 0]),  # MHA, mixed
        (8, 1, 128, 16, [65], [0]),  # MQA, crosses q-tile... single seq
        (16, 8, 128, 16, [130, 7], [0, 0]),  # > one chunk of kv
    ],
)
def test_prefill_kernel_matches_oracle(Hq, Hkv, D, BSZ, ctx_lens, cached_lens):
    scale = D**-0.5
    q, cache, meta = build_case(
        jax.random.PRNGKey(1), Hq, Hkv, D, BSZ, 64, ctx_lens, cached_lens, jnp.float32
    )
    want = paged_prefill_attention(q, cache, 0, meta, BSZ, scale)
    got = paged_prefill_attention_pallas(
        q, cache, 0, meta, BSZ, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_prefill_kernel_small_q_tile():
    # Sq smaller than the default 128 tile: tq clamps to Sq (padded to 8).
    scale = 128**-0.5
    q, cache, meta = build_case(
        jax.random.PRNGKey(2), 8, 4, 128, 16, 32, [3, 4], [0, 0], jnp.float32
    )
    want = paged_prefill_attention(q, cache, 0, meta, 16, scale)
    got = paged_prefill_attention_pallas(
        q, cache, 0, meta, 16, scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_prefill_kernel_fp8_kv():
    from tests.test_pallas_decode import _cast_pages_fp8

    scale = 128**-0.5
    q, cache, meta = build_case(
        jax.random.PRNGKey(5), 8, 4, 128, 16, 64, [40, 33], [32, 16], jnp.float32
    )
    qcache = KVCache(
        k=(_cast_pages_fp8(cache.k[0]),), v=(_cast_pages_fp8(cache.v[0]),)
    )
    want = paged_prefill_attention(q, qcache, 0, meta, 16, scale)
    got = paged_prefill_attention_pallas(
        q, qcache, 0, meta, 16, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_prefill_kernel_bf16_io():
    scale = 128**-0.5
    q, cache, meta = build_case(
        jax.random.PRNGKey(3), 8, 4, 128, 16, 32, [30, 47], [0, 16], jnp.bfloat16
    )
    want = paged_prefill_attention(q, cache, 0, meta, 16, scale)
    got = paged_prefill_attention_pallas(
        q, cache, 0, meta, 16, scale, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=3e-2, atol=3e-2
    )
