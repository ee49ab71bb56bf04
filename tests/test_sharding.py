"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh.

The reference has zero distributed tests (SURVEY.md §4); here TP correctness
is asserted by comparing sharded vs single-device engine outputs.
"""

import numpy as np
import pytest

import jax

from lightvllm_tpu import SamplingParams
from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.llm_engine import LLMEngine
from lightvllm_tpu.models import qwen3

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
]

BS = 16


def tiny_spec():
    return qwen3.ModelSpec(
        num_layers=2,
        hidden_size=64,
        num_q_heads=8,
        num_kv_heads=8,
        head_dim=16,
        intermediate_size=128,
        vocab_size=128,
        rope_theta=10000.0,
        rms_eps=1e-6,
        tie_word_embeddings=True,
        dtype="float32",
    )


def make_engine(spec, params, tp=1):
    return LLMEngine(
        spec=spec,
        params=params,
        kvcache_block_size=BS,
        num_kvcache_blocks=64,
        max_model_len=128,
        max_num_seqs=4,
        eos=127,
        tensor_parallel_size=tp,
    )


@pytest.fixture(scope="module")
def spec_and_params():
    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    return spec, params


def run_greedy(engine, prompts, n=6):
    res = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True),
        use_tqdm=False,
    )
    return [r["token_ids"] for r in res]


def test_tp8_matches_single_device(spec_and_params):
    spec, params = spec_and_params
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5, 9, 2, 6], [11, 12]]
    ref = run_greedy(make_engine(spec, params), prompts)
    tp = run_greedy(make_engine(spec, params, tp=8), prompts)
    assert tp == ref


def test_tp8_weights_are_sharded(spec_and_params):
    spec, params = spec_and_params
    engine = make_engine(spec, params, tp=8)
    wqkv = engine.model_runner.params["layers"]["wqkv"]
    assert isinstance(wqkv, tuple)  # per-layer leaves
    shard_shapes = {s.data.shape for s in wqkv[0].addressable_shards}
    # Fused per-layer (E, (Hq+2Hkv)*D) = (64, 384) split 8-way on out.
    assert shard_shapes == {(64, 384 // 8)}
    k0 = engine.model_runner.cache.k[0]  # per-layer page arrays
    kshapes = {s.data.shape for s in k0.addressable_shards}
    # (NB, Hkv, BSZ, D) with Hkv=8 split 8-way.
    assert kshapes == {(64, 1, BS, 16)}


def test_tp2_quantized_int8(spec_and_params):
    spec, _ = spec_and_params
    params_q = qwen3.init_params(
        spec, jax.random.PRNGKey(0), quantization="int8"
    )
    ref = run_greedy(make_engine(spec, params_q), [[1, 5, 9, 2, 7]])
    tp = run_greedy(make_engine(spec, params_q, tp=2), [[1, 5, 9, 2, 7]])
    assert tp == ref


def test_tp8_shard_map_decode_matches_single_device(spec_and_params):
    """tp_mode="shard_map": the manual-collective decode window (explicit
    psum / vocab-parallel embed / logits all_gather inside shard_map) must
    reproduce single-device greedy tokens exactly."""
    spec, params = spec_and_params
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5, 9, 2, 6], [11, 12]]
    ref = run_greedy(make_engine(spec, params), prompts)
    sm = run_greedy(
        LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=BS,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            tensor_parallel_size=8,
            tp_mode="shard_map",
        ),
        prompts,
    )
    assert sm == ref


@pytest.mark.parametrize(
    "kv_dtype,quant,tp_mode",
    [
        ("int8", None, "gspmd"),  # VERDICT r2 reproducer: int8 KV x mesh
        ("int8", "int8", "gspmd"),
        ("int8", "int4", "gspmd"),
        ("fp8", "int4", "gspmd"),
        ("int8", "int8", "shard_map"),
        ("fp8", "int4", "shard_map"),
    ],
)
def test_tp2_kv_quant_matrix(spec_and_params, kv_dtype, quant, tp_mode):
    """kv-dtype x weight-quant x tp-mode matrix (VERDICT r2 weak#1: int8 KV
    under any mesh silently dropped the per-page scale arrays and crashed at
    the first attention read). Sharded engines must reproduce the tokens of
    a single-device engine with the same kv/weight dtypes exactly."""
    spec, params = spec_and_params
    if quant is not None:
        # group_size=32 keeps the tiny row-parallel weights' quant-group
        # axis divisible by the mesh, matching real checkpoints (which have
        # >= 32 groups). Single-group packed int4 cannot row-split under
        # shard_map at all (see test_int4_single_group_auto_falls_back).
        params = qwen3.init_params(
            spec, jax.random.PRNGKey(0), quantization=quant, group_size=32
        )
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5]]

    def build(tp, mode):
        return LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=BS,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            tensor_parallel_size=tp,
            kv_cache_dtype=kv_dtype,
            tp_mode=mode,
        )

    ref = run_greedy(build(1, "gspmd"), prompts)
    out = run_greedy(build(2, tp_mode), prompts)
    assert out == ref


def test_tp2_dp2_int8_kv_int4_weights(spec_and_params):
    """Quantized KV and weights under a 2x2 (data, model) mesh: the KV scale
    arrays gain both the leading DP axis and the "data" spec dimension."""
    spec, _ = spec_and_params
    params = qwen3.init_params(spec, jax.random.PRNGKey(0), quantization="int4")
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5], [11, 12, 13], [9, 8]]

    def build(tp, dp):
        return LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=BS,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            tensor_parallel_size=tp,
            data_parallel_size=dp,
            kv_cache_dtype="int8",
        )

    ref = run_greedy(build(1, 1), prompts)
    out = run_greedy(build(2, 2), prompts)
    assert out == ref


def test_int4_single_group_auto_falls_back(spec_and_params):
    """Packed int4 with a single quant group cannot row-split under
    shard_map (split-half nibble packing pairs element j with j + gs//2, so
    a contiguous packed-row split scrambles the pairing — silently wrong
    math, found in r4). tp_mode="auto" must fall back to GSPMD and still
    match single-device tokens; explicit "shard_map" must refuse."""
    spec, _ = spec_and_params
    # Default group_size covers the whole (tiny) in_features: groups == 1.
    params = qwen3.init_params(spec, jax.random.PRNGKey(0), quantization="int4")
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4, 1, 5]]

    def build(tp, mode):
        return LLMEngine(
            spec=spec,
            params=params,
            kvcache_block_size=BS,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            tensor_parallel_size=tp,
            tp_mode=mode,
        )

    ref = run_greedy(build(1, "gspmd"), prompts)
    auto_eng = build(2, "auto")
    assert auto_eng.model_runner.tp_mode == "gspmd"
    assert run_greedy(auto_eng, prompts) == ref
    with pytest.raises(AssertionError, match="shard_map"):
        build(2, "shard_map")


def test_tp2_shard_map_quantized_int8(spec_and_params):
    spec, _ = spec_and_params
    params_q = qwen3.init_params(
        spec, jax.random.PRNGKey(0), quantization="int8"
    )
    ref = run_greedy(make_engine(spec, params_q), [[1, 5, 9, 2, 7]])
    sm = run_greedy(
        LLMEngine(
            spec=spec,
            params=params_q,
            kvcache_block_size=BS,
            num_kvcache_blocks=64,
            max_model_len=128,
            max_num_seqs=4,
            eos=127,
            tensor_parallel_size=2,
            tp_mode="shard_map",
        ),
        [[1, 5, 9, 2, 7]],
    )
    assert sm == ref
