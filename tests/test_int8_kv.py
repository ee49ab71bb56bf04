"""INT8 KV cache: quantized write/read round-trip, flush-kernel parity,
engine equivalence, and the perplexity impact (kernel-vs-oracle pattern,
SURVEY.md §4). No reference counterpart (the reference has no KV
quantization, SURVEY.md §2.10); this is the BASELINE bandwidth lever for
decode on v5e (attention page reads dominate the step; int8<->bf16
converts are hardware-fast where e4m3 is VPU-emulated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.kv_cache import (
    KV_INT8_MARGIN,
    PAD_SLOT,
    _layer_scales,
    alloc_kv_cache,
    gather_kv_for_seqs,
    write_kv_layer,
)

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'


def page_scales(cache, layer=0):
    """Decoded in-page scales as one (NB, 2, Hkv, D) array (K then V)."""
    ks, vs = _layer_scales(cache, layer)
    return np.stack([np.asarray(ks), np.asarray(vs)], axis=1)


def test_write_gather_roundtrip():
    """Quantize-on-write + dequant-on-gather reconstructs rows within the
    per-channel int8 step (margin x absmax / 127)."""
    NB, Hkv, BSZ, D = 8, 2, 16, 32
    cache = alloc_kv_cache(1, Hkv, NB, BSZ, D, jnp.float32, fp8=False, int8=True)
    rng = np.random.default_rng(0)
    T = 40  # 2.5 pages
    k_new = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((T, Hkv, D)) * 3, jnp.float32)
    slots = jnp.asarray(
        [3 * BSZ + i for i in range(16)]
        + [5 * BSZ + i for i in range(16)]
        + [1 * BSZ + i for i in range(8)],
        jnp.int32,
    )
    cache = write_kv_layer(cache, 0, k_new, v_new, slots)
    tables = jnp.asarray([[3, 5, 1]], jnp.int32)
    k_got, v_got = gather_kv_for_seqs(cache, 0, tables, BSZ, jnp.float32)
    k_want = np.asarray(k_new)
    v_want = np.asarray(v_new)
    # Channel-wise quantization step bound: margin * absmax / 127 per page.
    for page in range(3):
        rows = slice(page * 16, page * 16 + (16 if page < 2 else 8))
        for arr_got, arr_want in ((k_got, k_want), (v_got, v_want)):
            got = np.asarray(arr_got)[0, page * BSZ:][: 16 if page < 2 else 8]
            want = arr_want[rows]
            step = (
                KV_INT8_MARGIN * np.abs(want).max(axis=0, keepdims=True) / 127
            )
            assert np.all(np.abs(got - want) <= step + 1e-6)


def test_append_reuses_page_scale():
    """A second write appending to a page must reuse the page's scale (set
    with margin headroom at first write), not rescale existing rows."""
    NB, Hkv, BSZ, D = 4, 1, 8, 16
    cache = alloc_kv_cache(1, Hkv, NB, BSZ, D, jnp.float32, fp8=False, int8=True)
    rng = np.random.default_rng(1)
    first = jnp.asarray(rng.standard_normal((4, Hkv, D)), jnp.float32)
    cache = write_kv_layer(
        cache, 0, first, first, jnp.arange(4, dtype=jnp.int32)
    )
    sc_before = page_scales(cache)[0]
    second = jnp.asarray(rng.standard_normal((2, Hkv, D)) * 1.5, jnp.float32)
    cache = write_kv_layer(
        cache, 0, second, second, jnp.asarray([4, 5], jnp.int32)
    )
    np.testing.assert_array_equal(page_scales(cache)[0], sc_before)
    # A write that RESTARTS the page (row 0) refreshes the scale.
    cache = write_kv_layer(
        cache, 0, second, second, jnp.asarray([0, 1], jnp.int32)
    )
    assert not np.array_equal(page_scales(cache)[0], sc_before)


@pytest.mark.parametrize("window", [4, 8])
def test_flush_kernel_matches_scatter_oracle_int8(window):
    """kv_flush_pallas int8 (interpret) == one window-granular
    write_kv_layer scatter (same scale semantics: fresh pages scaled from
    the window's rows, appended pages reuse)."""
    from lightvllm_tpu.ops.pallas.kv_append import kv_flush_pallas

    NB, Hkv, BSZ, D = 8, 2, 16, 32
    B = 3
    rng = np.random.default_rng(2)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    pre_k, pre_v = mk(12, Hkv, D), mk(12, Hkv, D)

    def fresh_cache():
        c = alloc_kv_cache(1, Hkv, NB, BSZ, D, jnp.float32, fp8=False, int8=True)
        # Pre-populate page 0 of seq 0 so its append reuses an existing scale.
        return write_kv_layer(
            c, 0, pre_k, pre_v, jnp.arange(12, dtype=jnp.int32)
        )

    k_stage = mk(B, Hkv, window, D).astype(jnp.bfloat16)
    v_stage = mk(B, Hkv, window, D).astype(jnp.bfloat16)
    tables = jnp.asarray([[0, 1], [2, 3], [4, 5]], jnp.int32)
    start = np.asarray([12, 0, -(1 << 30)], np.int32)  # append/fresh/skip

    # Oracle: single scatter write of all staged rows (window granularity).
    oracle = fresh_cache()
    pos = start[:, None] + np.arange(window)
    blk = np.take_along_axis(
        np.asarray(tables), np.clip(pos // BSZ, 0, 1), axis=1
    )
    slots = np.where(pos >= 0, blk * BSZ + pos % BSZ, PAD_SLOT)
    kw = k_stage.transpose(0, 2, 1, 3).reshape(B * window, Hkv, D)
    vw = v_stage.transpose(0, 2, 1, 3).reshape(B * window, Hkv, D)
    oracle = write_kv_layer(
        oracle, 0, kw, vw, jnp.asarray(slots.reshape(-1), jnp.int32)
    )

    got = fresh_cache()
    gk, gv = kv_flush_pallas(
        got.k[0], got.v[0], k_stage, v_stage, jnp.asarray(start), tables,
        sc_shards=1, block_size=BSZ, window=window, interpret=True,
    )
    got = type(got)(k=(gk,), v=(gv,), sc_shards=1)
    np.testing.assert_allclose(
        page_scales(got), page_scales(oracle), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(oracle.k[0]))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(oracle.v[0]))


def test_engine_int8_kv_close_to_bf16():
    """End-to-end: int8 KV generates the same greedy tokens as the exact
    cache on a tiny model for a short horizon (quantization noise must not
    derail argmax within a few steps)."""
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    kw = dict(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=128, max_num_seqs=4, eos=127,
        decode_window=4,
    )
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11] * 20]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = LLMEngine(**kw).generate(prompts, sp, use_tqdm=False)
    got = LLMEngine(kv_cache_dtype="int8", **kw).generate(
        prompts, sp, use_tqdm=False
    )
    match = sum(a["token_ids"] == b["token_ids"] for a, b in zip(ref, got))
    assert match >= 2, [(a["token_ids"], b["token_ids"]) for a, b in zip(ref, got)]


def test_ppl_delta_int8_kv_small():
    """evals harness: int8 KV perplexity stays within a few percent of the
    exact cache on a tiny random model."""
    from lightvllm_tpu.evals import evaluate_ppl
    from lightvllm_tpu.models import qwen3

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    toks = np.random.default_rng(3).integers(0, 128, 512)
    base = evaluate_ppl(params, spec, toks, window=128, block_size=16)
    q = evaluate_ppl(
        params, spec, toks, window=128, block_size=16, kv_cache_dtype="int8"
    )
    assert abs(q["ppl"] - base["ppl"]) / base["ppl"] < 0.03, (base, q)
