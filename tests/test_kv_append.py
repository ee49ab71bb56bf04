"""Window-staging KV flush kernel vs the XLA scatter oracle, plus
staged-vs-scatter engine equivalence (kernel-vs-oracle, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.pallas.kv_append import kv_flush_pallas

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("window", [1, 4, 16])
def test_flush_matches_scatter(dtype, window):
    """Staged rows land at positions [p0, p0+W) of each sequence's block
    table, crossing page boundaries; padding rows (p0 < 0) are skipped;
    neighboring rows inside the aligned RMW window are preserved."""
    NB, Hkv, BSZ, D = 16, 4, 16, 128
    B = 5
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = jax.random.normal(ks[0], (NB, Hkv, BSZ, D), dtype)
    vp = jax.random.normal(ks[1], (NB, Hkv, BSZ, D), dtype)
    k_stage = jax.random.normal(ks[2], (B, Hkv, window, D), dtype)
    v_stage = jax.random.normal(ks[3], (B, Hkv, window, D), dtype)

    # Distinct pages per sequence; starts chosen to hit page boundaries,
    # odd offsets, and the very end of a page.
    tables = np.arange(B * 3, dtype=np.int32).reshape(B, 3)
    start = np.asarray([0, 7, BSZ - 1, BSZ, -(1 << 30)], np.int32)[:B]
    # start is the FIRST staged position: positions [start, start+W).

    # Oracle: scatter every staged row.
    want_k, want_v = kp, vp
    for b in range(B):
        if start[b] < 0:
            continue
        for j in range(window):
            pos = int(start[b]) + j
            page = tables[b, pos // BSZ]
            row = pos % BSZ
            want_k = want_k.at[page, :, row].set(k_stage[b, :, j])
            want_v = want_v.at[page, :, row].set(v_stage[b, :, j])

    got_k, got_v = kv_flush_pallas(
        kp, vp, k_stage, v_stage, jnp.asarray(start), jnp.asarray(tables),
        block_size=BSZ, window=window, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got_k, np.float32), np.asarray(want_k, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(got_v, np.float32), np.asarray(want_v, np.float32)
    )


def test_staged_engine_matches_scatter_engine():
    """End-to-end: decode_kv_mode='staged' must reproduce the scatter
    engine's greedy tokens exactly (f32, HIGHEST-precision dots)."""
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
        decode_window=8,
    )
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11] * 15, [3]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    out_scatter = LLMEngine(decode_kv_mode="scatter", **kw).generate(
        prompts, sp, use_tqdm=False
    )
    out_staged = LLMEngine(decode_kv_mode="staged", **kw).generate(
        prompts, sp, use_tqdm=False
    )
    for a, b in zip(out_scatter, out_staged):
        assert a["token_ids"] == b["token_ids"]
