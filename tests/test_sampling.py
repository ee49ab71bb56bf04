"""On-device sampling: top-k / top-p filtering and per-request seeds
(extensions over the reference's temperature-only sampler,
SURVEY.md §2.10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.sampling import sample


def _logits(B=4, V=64, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, V), jnp.float32) * 3


def test_top_k_1_equals_greedy():
    lg = _logits()
    B = lg.shape[0]
    got = sample(
        lg,
        jnp.ones(B),
        jax.random.PRNGKey(1),
        top_ks=jnp.ones(B, jnp.int32),
        top_ps=jnp.ones(B, jnp.float32),
        seeds=jnp.full(B, -1, jnp.int32),
        positions=jnp.zeros(B, jnp.int32),
    )
    want = jnp.argmax(lg, -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_top_k_fast_path_matches_argsort_path():
    """top_ps=None routes the lax.top_k threshold fast path (no (B, V)
    argsort); with tie-free random logits it must pick the same tokens as
    the full path for every k, including disabled rows (k=0)."""
    lg = _logits(B=6, V=256, seed=7)
    B = lg.shape[0]
    ks = jnp.asarray([0, 1, 2, 8, 50, 64], jnp.int32)
    common = dict(
        seeds=jnp.full(B, -1, jnp.int32), positions=jnp.zeros(B, jnp.int32)
    )
    key = jax.random.PRNGKey(5)
    fast = sample(lg, jnp.ones(B), key, top_ks=ks, top_ps=None, **common)
    full = sample(
        lg, jnp.ones(B), key, top_ks=ks, top_ps=jnp.ones(B, jnp.float32),
        **common,
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))


def test_top_k_fast_path_k1_equals_greedy():
    lg = _logits(seed=11)
    B = lg.shape[0]
    got = sample(
        lg,
        jnp.ones(B),
        jax.random.PRNGKey(1),
        top_ks=jnp.ones(B, jnp.int32),
        top_ps=None,
        seeds=jnp.full(B, -1, jnp.int32),
        positions=jnp.zeros(B, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(lg, -1)))


def test_engine_top_k_only_uses_fast_mode():
    """A top-k-only workload must route the "topk" trace-time mode and
    still produce max_tokens tokens end to end."""
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.engine.runner import _sample_mode
    from lightvllm_tpu.models import qwen3

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    engine = LLMEngine(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=128, max_num_seqs=4, eos=127,
    )
    sp = SamplingParams(
        temperature=0.8, top_k=5, max_tokens=5, ignore_eos=True, seed=3
    )
    outs = engine.generate([[1, 2, 3], [4, 5]], [sp, sp], use_tqdm=False)
    assert all(len(o["token_ids"]) == 5 for o in outs)
    # Mode detection: top-k only -> "topk"; add top_p -> "full".
    from lightvllm_tpu.engine.sequence import Sequence

    s1 = Sequence([1], sp, block_size=16)
    assert _sample_mode([s1]) == "topk"
    s2 = Sequence(
        [1],
        SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5),
        block_size=16,
    )
    assert _sample_mode([s1, s2]) == "full"
    s3 = Sequence([1], SamplingParams(temperature=0.0), block_size=16)
    assert _sample_mode([s3]) == "none"


def test_tiny_top_p_equals_greedy():
    lg = _logits(seed=3)
    B = lg.shape[0]
    got = sample(
        lg,
        jnp.ones(B),
        jax.random.PRNGKey(2),
        top_ks=jnp.zeros(B, jnp.int32),
        top_ps=jnp.full(B, 1e-6, jnp.float32),
        seeds=jnp.full(B, -1, jnp.int32),
        positions=jnp.zeros(B, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(lg, -1)))


def test_top_k_restricts_support():
    lg = _logits(B=2, V=32, seed=5)
    B, k = 2, 4
    topk_sets = [
        set(np.argsort(-np.asarray(lg[b]))[:k].tolist()) for b in range(B)
    ]
    for trial in range(20):
        got = sample(
            lg,
            jnp.full(B, 2.0),  # hot temperature: would leave top-4 if unfiltered
            jax.random.PRNGKey(100 + trial),
            top_ks=jnp.full(B, k, jnp.int32),
            top_ps=jnp.ones(B, jnp.float32),
            seeds=jnp.full(B, -1, jnp.int32),
            positions=jnp.zeros(B, jnp.int32),
        )
        for b in range(B):
            assert int(got[b]) in topk_sets[b]


def test_per_row_mixed_settings():
    lg = _logits(B=3, V=32, seed=7)
    got = sample(
        lg,
        jnp.asarray([0.0, 1.0, 1.0]),  # row 0 greedy regardless
        jax.random.PRNGKey(0),
        top_ks=jnp.asarray([0, 1, 0], jnp.int32),  # row 1 = argmax via top-1
        top_ps=jnp.asarray([1.0, 1.0, 1e-6], jnp.float32),  # row 2 via top-p
        seeds=jnp.full(3, -1, jnp.int32),
        positions=jnp.zeros(3, jnp.int32),
    )
    want = jnp.argmax(lg, -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_seeded_rows_independent_of_step_key_and_batch_position():
    V = 64
    row = jax.random.normal(jax.random.PRNGKey(9), (V,), jnp.float32)
    base = dict(
        top_ks=None, top_ps=None
    )
    # Same (seed, position) must sample the same token under different step
    # keys and different batch placements.
    def run(key, batch_rows, row_idx):
        lg = jnp.stack(batch_rows)
        B = lg.shape[0]
        out = sample(
            lg,
            jnp.ones(B),
            key,
            top_ks=jnp.zeros(B, jnp.int32),
            top_ps=jnp.ones(B, jnp.float32),
            seeds=jnp.asarray([42] * B, jnp.int32),
            positions=jnp.full(B, 7, jnp.int32),
        )
        return int(out[row_idx])

    other = jax.random.normal(jax.random.PRNGKey(11), (V,), jnp.float32)
    a = run(jax.random.PRNGKey(1), [row, other], 0)
    b = run(jax.random.PRNGKey(999), [other, row], 1)
    assert a == b


def test_engine_end_to_end_top_p(tmp_path):
    # The extended-sampling jit variant compiles and produces tokens.
    import lightvllm_tpu
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.models import qwen3

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    from lightvllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=128, max_num_seqs=4, eos=127,
    )
    outs = engine.generate(
        [[1, 2, 3], [4, 5, 6]],
        [
            SamplingParams(temperature=0.8, top_p=0.9, top_k=20, max_tokens=5,
                           ignore_eos=True, seed=7),
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        ],
        use_tqdm=False,
    )
    assert all(len(o["token_ids"]) == 5 for o in outs)
    # Seeded request reproduces exactly on a fresh engine.
    engine2 = LLMEngine(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=128, max_num_seqs=4, eos=127,
        rng_seed=123,  # different engine RNG; seeded row must not care
    )
    outs2 = engine2.generate(
        [[1, 2, 3]],
        [SamplingParams(temperature=0.8, top_p=0.9, top_k=20, max_tokens=5,
                        ignore_eos=True, seed=7)],
        use_tqdm=False,
    )
    assert outs2[0]["token_ids"] == outs[0]["token_ids"]


def test_sample_sharded_matches_argmax_and_samples_validly():
    """Distributed sampler (shard_map, vocab-sharded logits): greedy rows
    must EXACTLY reproduce single-device argmax (incl. first-index
    tie-breaking across shard boundaries); temperature rows must return
    valid in-vocab ids, never the padded tail, and be deterministic."""
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from lightvllm_tpu.ops.sampling import sample_sharded

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 (virtual) devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    B, V, Vpad = 16, 100, 128  # padded tail spans the last shard
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (B, Vpad), jnp.float32)
    # Plant exact ties straddling a shard boundary (cols 31/32): argmax
    # must pick the first (col 31), and so must the cross-rank merge.
    logits = logits.at[:4, 31].set(50.0).at[:4, 32].set(50.0)
    temps_greedy = jnp.zeros(B, jnp.float32)
    temps_hot = jnp.full(B, 0.9, jnp.float32)

    def run(temps):
        return shard_map(
            lambda lg: sample_sharded(lg, temps, jax.random.PRNGKey(7),
                                      "model", V),
            mesh=mesh, in_specs=P(None, "model"), out_specs=P(),
            check_vma=False,
        )(logits)

    ref = jnp.argmax(logits[:, :V], axis=-1).astype(jnp.int32)
    got = run(temps_greedy)
    assert (got == ref).all(), (got, ref)
    assert int(got[0]) == 31  # tie broke to the first index

    hot = np.asarray(run(temps_hot))
    assert ((hot >= 0) & (hot < V)).all(), hot  # never padding
    hot2 = np.asarray(run(temps_hot))
    assert (hot == hot2).all()  # deterministic for a fixed key
