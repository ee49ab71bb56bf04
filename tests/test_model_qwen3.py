"""Qwen3 numerics parity vs HF transformers (torch CPU) on a tiny random
model, and end-to-end greedy decode equivalence through the full engine.

This is the golden-output test the reference lacks (SURVEY.md §4: its only
integration artifact is a manual example script).
"""

import numpy as np
import pytest

import lightvllm_tpu  # noqa: F401  (conftest sets the cpu backend first)
from lightvllm_tpu import SamplingParams
from lightvllm_tpu.llm import LLM

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 128
BS = 16  # kv block size


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def make_engine(model_dir, **kw):
    defaults = dict(
        dtype="float32",
        kvcache_block_size=BS,
        num_kvcache_blocks=64,
        max_model_len=256,
        max_num_seqs=8,
        eos=VOCAB - 1,  # never emitted by the random model in practice
    )
    defaults.update(kw)
    return LLM(model_dir, **defaults)


def hf_greedy(model, prompt, n):
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=n, do_sample=False, eos_token_id=None
        )
    return out[0, len(prompt) :].tolist()


def test_prefill_logits_match_hf(tiny_model_dir):
    model_dir, hf_model = tiny_model_dir
    engine = make_engine(model_dir)
    prompt = [1, 5, 9, 2, 7, 3, 11, 4, 8, 6, 10, 12]
    engine.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=1))
    seqs, is_prefill, _ = engine.scheduler.schedule()
    assert is_prefill
    token_ids, meta = engine.model_runner.prepare_prefill(seqs)
    from lightvllm_tpu.models import qwen3

    logits, _ = qwen3.forward_prefill(
        engine.model_runner.params,
        engine.model_runner.spec,
        token_ids,
        meta,
        engine.model_runner.cache,
        BS,
    )
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0, -1].numpy()
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, hf_logits, rtol=2e-4, atol=2e-4)


def test_greedy_decode_matches_hf_generate(tiny_model_dir):
    model_dir, hf_model = tiny_model_dir
    engine = make_engine(model_dir)
    prompts = [
        [1, 5, 9, 2, 7, 3],
        [4, 8, 6, 10, 12, 11, 2, 2, 1],
        [3, 3, 3],
    ]
    n = 8
    results = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True),
        use_tqdm=False,
    )
    for prompt, res in zip(prompts, results):
        expect = hf_greedy(hf_model, prompt, n)
        assert res["token_ids"] == expect, (
            f"prompt {prompt}: got {res['token_ids']}, want {expect}"
        )


def test_prefix_cache_reuse_preserves_outputs(tiny_model_dir):
    model_dir, hf_model = tiny_model_dir
    engine = make_engine(model_dir)
    base = list(range(1, 1 + 2 * BS))  # two full blocks
    p1 = base + [7, 8]
    p2 = base + [9, 10, 11]
    r1 = engine.generate(
        [p1], SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        use_tqdm=False,
    )
    # Second prompt shares the 2-block prefix -> allocate() must prefix-hit
    # and still produce HF-identical continuations.
    r2 = engine.generate(
        [p2], SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        use_tqdm=False,
    )
    assert engine.scheduler.block_manager.prefix_cache_hits > 0
    assert r1[0]["token_ids"] == hf_greedy(hf_model, p1, 4)
    assert r2[0]["token_ids"] == hf_greedy(hf_model, p2, 4)


def test_continuous_batching_mixed_lengths(tiny_model_dir):
    model_dir, hf_model = tiny_model_dir
    engine = make_engine(model_dir, max_num_seqs=4)
    prompts = [[i + 1, (2 * i) % VOCAB, 5, i % 7 + 1][: 2 + i % 3] for i in range(6)]
    n = 5
    results = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True),
        use_tqdm=False,
    )
    for prompt, res in zip(prompts, results):
        assert res["token_ids"] == hf_greedy(hf_model, prompt, n)


def test_engine_stats_surface(tiny_model_dir):
    model_dir, _ = tiny_model_dir
    engine = make_engine(model_dir)
    engine.generate(
        [[1, 2, 3]],
        SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True),
        use_tqdm=False,
    )
    s = engine.stats
    assert s["decode_tokens"] >= 2 and s["prefill_tokens"] == 3
    assert s["blocks_free"] == s["blocks_total"]  # all freed after finish
    assert s["running"] == 0 and s["waiting"] == 0
    assert 0.0 <= s["prefix_cache_hit_rate"] <= 1.0
    assert s["last_step"]["num_seqs"] == 1


def test_sampled_decode_is_reproducible(tiny_model_dir):
    model_dir, _ = tiny_model_dir
    outs = []
    for _ in range(2):
        engine = make_engine(model_dir)
        res = engine.generate(
            [[1, 2, 3, 4]],
            SamplingParams(temperature=0.8, max_tokens=6, ignore_eos=True),
            use_tqdm=False,
        )
        outs.append(res[0]["token_ids"])
    assert outs[0] == outs[1]  # seeded PRNG -> deterministic across runs
