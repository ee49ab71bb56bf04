"""Fused qkv / gate_up projections (reference QKVParallelLinear /
MergedColumnParallelLinear, lightvllm/layers/linear.py:240,193).

fuse_projection_params is a pure layout transform: the fused model must
reproduce the unfused model bit-exactly (f32) for every interleave factor,
including quantized weights (per-out-channel scales move with columns).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.models import qwen3
from lightvllm_tpu.ops.kv_cache import alloc_kv_cache
from lightvllm_tpu.utils.metadata import DecodeMeta


def tiny_spec(**kw):
    base = dict(
        num_layers=2,
        hidden_size=64,
        num_q_heads=8,
        num_kv_heads=4,
        head_dim=16,
        intermediate_size=128,
        vocab_size=128,
        rope_theta=10000.0,
        rms_eps=1e-6,
        tie_word_embeddings=True,
        dtype="float32",
    )
    base.update(kw)
    return qwen3.ModelSpec(**base)


def decode_logits(spec, params):
    B, BS, NB = 4, 16, 4
    cache = alloc_kv_cache(
        spec.num_layers, spec.num_kv_heads, 32, BS, spec.head_dim,
        spec.jnp_dtype, fp8=False,
    )
    meta = DecodeMeta(
        positions=jnp.full((B,), 5, jnp.int32),
        ctx_lens=jnp.full((B,), 6, jnp.int32),
        block_tables=(
            jnp.arange(B, dtype=jnp.int32)[:, None] * NB
            + jnp.arange(NB, dtype=jnp.int32)[None, :]
        ),
        temperatures=jnp.zeros((B,), jnp.float32),
        top_ks=jnp.zeros((B,), jnp.int32),
        top_ps=jnp.ones((B,), jnp.float32),
        seeds=jnp.full((B,), -1, jnp.int32),
    )
    tokens = jnp.asarray([3, 17, 42, 99], jnp.int32)
    logits, _ = qwen3.forward_decode(params, spec, tokens, meta, cache, BS)
    return np.asarray(logits)


@pytest.mark.parametrize("quant", [None, "int8", "int4"])
@pytest.mark.parametrize("shards", [1, 2, 4])
def test_fused_matches_unfused(quant, shards):
    spec = tiny_spec(qkv_bias=True, qk_norm=False)
    params = qwen3.init_params(
        spec, jax.random.PRNGKey(0), quantization=quant, group_size=32
    )
    ref = decode_logits(spec, params)
    assert qwen3.can_fuse_projections(spec, shards)
    fused = qwen3.fuse_projection_params(params, shards)
    assert fused["layers"].get("wq") is None
    out = decode_logits(dataclasses.replace(spec, tp_shards=shards), fused)
    np.testing.assert_array_equal(out, ref)


def test_engine_fused_matches_unfused():
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine

    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(1))
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5]]

    def run(fuse):
        eng = LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=16,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            fuse_projections=fuse,
        )
        res = eng.generate(
            prompts,
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
            use_tqdm=False,
        )
        return [r["token_ids"] for r in res]

    assert run(True) == run(False)


def test_quantized_lm_head_is_close():
    """quantize_lm_head swaps the (E, V) contraction to int8: tokens under
    greedy decode must match the bf16-head engine on a well-separated
    random model, and the engine must hold a QuantizedTensor head."""
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.ops.quantization import QuantizedTensor

    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(2), quantization="int8")
    prompts = [[1, 5, 9, 2, 7]]

    def run(qh):
        eng = LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=16,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            quantize_lm_head=qh,
        )
        head = eng.model_runner.params.get("lm_head")
        assert isinstance(head, QuantizedTensor) == qh
        res = eng.generate(
            prompts,
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
            use_tqdm=False,
        )
        return [r["token_ids"] for r in res]

    assert run(True) == run(False)
