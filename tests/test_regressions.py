"""Regression tests for round-2 fixes (VERDICT.md / ADVICE.md round 1)."""

import numpy as np
import pytest

import lightvllm_tpu  # noqa: F401  (conftest pins the cpu backend)
import jax
import jax.numpy as jnp

from lightvllm_tpu.models import qwen3


def tiny_spec(dtype="float32"):
    return qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype=dtype,
    )


def test_max_tokens_clamped_to_max_model_len():
    """VERDICT weak#4: a near-max prompt with default max_tokens=128 used to
    outgrow max_blocks_per_seq and crash mid-serving with a numpy broadcast
    error; now max_tokens clamps at admission and the sequence finishes at
    the cap."""
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine

    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    engine = LLMEngine(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=64, max_num_seqs=4, eos=127,
        decode_window=8,
    )
    prompt = list(range(1, 61))  # 60 tokens, 4 of headroom
    outs = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=128, ignore_eos=True),
        use_tqdm=False,
    )
    assert len(outs[0]["token_ids"]) == 4  # clamped to max_model_len - 60


def test_prompt_with_no_decode_room_rejected():
    from lightvllm_tpu.engine.llm_engine import LLMEngine

    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    engine = LLMEngine(
        spec=spec, params=params, kvcache_block_size=16,
        num_kvcache_blocks=64, max_model_len=32, max_num_seqs=4, eos=127,
    )
    with pytest.raises(ValueError, match="no room"):
        engine.add_request(list(range(1, 33)))


def test_save_load_roundtrip_bf16(tmp_path):
    """ADVICE high: np.savez turned ml_dtypes bf16 into opaque '|V2' voids;
    load then crashed. bf16 leaves must survive a save/load cycle bitwise."""
    from lightvllm_tpu.utils.loader import load_saved_params, save_params

    spec = tiny_spec(dtype="bfloat16")
    params = qwen3.init_params(spec, jax.random.PRNGKey(0), quantization="int8",
                               group_size=16)
    path = str(tmp_path / "ckpt.npz")
    save_params(params, path)
    loaded = load_saved_params(path, spec)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(x.dtype == jnp.bfloat16 for x in flat_a)  # the regression


def test_fill_slots_ends_on_block_boundary():
    """ADVICE medium: lv_fill_slots read block_table[blk+1] out of bounds
    when the write ends exactly on the table's final block boundary."""
    from lightvllm_tpu import native

    if not native.available():
        pytest.skip("native helper not built")
    bs = 16
    bt = np.asarray([7, 3], np.int32)  # exactly 2 blocks
    # Fill the full 32 tokens: last slot is the final slot of the last block.
    got = native.fill_slots(bt, bs, 0, 32)
    pos = np.arange(32)
    np.testing.assert_array_equal(got, bt[pos // bs] * bs + pos % bs)
    # And a start mid-block that still ends flush on the boundary.
    got = native.fill_slots(bt, bs, 20, 12)
    pos = np.arange(20, 32)
    np.testing.assert_array_equal(got, bt[pos // bs] * bs + pos % bs)


def test_scheduler_unadmittable_prompt_raises_config_error():
    """ADVICE low: waiting-but-never-admittable used to trip a misleading
    AssertionError; it must surface as the KV-cache-too-small config error."""
    from lightvllm_tpu.config import Config
    from lightvllm_tpu.engine.scheduler import Scheduler
    from lightvllm_tpu.engine.sequence import Sequence

    cfg = Config(
        num_kvcache_blocks=2, kvcache_block_size=16, max_model_len=256,
        max_num_seqs=4, max_num_batched_tokens=4096, eos=-1,
    )
    sched = Scheduler(cfg)
    sched.add(Sequence(list(range(100)), block_size=16))  # needs 7 blocks > 2
    with pytest.raises(RuntimeError, match="KV cache too small"):
        sched.schedule()


def test_rope_scaling_rejects_unknown_scheme():
    from lightvllm_tpu.ops.rope import normalize_rope_scaling

    with pytest.raises(ValueError, match="unsupported rope_scaling"):
        normalize_rope_scaling({"rope_type": "longrope", "factor": 4.0})
    assert normalize_rope_scaling(None) is None
    assert normalize_rope_scaling({"rope_type": "default"}) is None


@pytest.mark.parametrize(
    "scaling",
    [
        {"rope_type": "linear", "factor": 4.0},
        {
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 64,
        },
        {
            "rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        {
            "rope_type": "yarn", "factor": 4.0, "beta_fast": 16.0,
            "beta_slow": 2.0, "mscale": 0.707, "mscale_all_dim": 0.5,
            "original_max_position_embeddings": 128,
        },
    ],
)
def test_scaled_inv_freq_matches_hf(scaling):
    """inv_freq and attention factor must match HF transformers'
    ROPE_INIT_FUNCTIONS bit-for-bit (same checkpoints -> same numerics)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from lightvllm_tpu.ops.rope import normalize_rope_scaling, scaled_inv_freq

    head_dim, theta = 64, 500000.0
    cfg = LlamaConfig(
        hidden_size=256, num_attention_heads=4, head_dim=head_dim,
        rope_theta=theta, max_position_embeddings=4096,
        rope_scaling=dict(scaling),
    )
    hf_fn = ROPE_INIT_FUNCTIONS[scaling["rope_type"]]
    hf_inv, hf_att = hf_fn(cfg, device="cpu")
    ours, att = scaled_inv_freq(head_dim, theta, normalize_rope_scaling(scaling))
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)
    assert att == pytest.approx(float(hf_att), rel=1e-6)
