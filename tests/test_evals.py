"""Perplexity harness: teacher-forced NLL must match HF transformers' loss
on the same tiny model, and the quantized paths must evaluate with bounded
drift (the mechanics of the BASELINE.md ppl gate)."""

import math

import numpy as np
import pytest

import jax

from lightvllm_tpu.evals import evaluate_ppl
from lightvllm_tpu.models import qwen3

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_qwen3_ppl")
    model.save_pretrained(d, safe_serialization=True)
    from lightvllm_tpu.utils.loader import load_qwen3_params

    spec = qwen3.ModelSpec.from_hf_config(cfg, dtype="float32")
    params = load_qwen3_params(str(d), spec)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 127, size=200).astype(np.int32)
    return model, spec, params, str(d), tokens


def hf_nll(model, tokens, window):
    total, cnt = 0.0, 0
    for s in range(0, len(tokens), window):
        w = tokens[s : s + window]
        if len(w) < 2:
            break
        ids = torch.tensor([w.tolist()])
        with torch.no_grad():
            out = model(ids, labels=ids)
        total += float(out.loss) * (len(w) - 1)
        cnt += len(w) - 1
    return total / cnt


def test_ppl_matches_hf(tiny):
    model, spec, params, _, tokens = tiny
    got = evaluate_ppl(params, spec, tokens, window=64, block_size=16)
    want_nll = hf_nll(model, tokens, 64)
    assert abs(got["nll_per_token"] - want_nll) < 2e-3, (
        got["nll_per_token"],
        want_nll,
    )
    assert math.isfinite(got["ppl"]) and got["tokens"] == 196  # 3*63 + 7


def test_ppl_quantized_paths_run(tiny):
    _, spec, params, d, tokens = tiny
    from lightvllm_tpu.utils.loader import load_qwen3_params

    base = evaluate_ppl(params, spec, tokens, window=64, block_size=16)
    for quant, budget in [("int8", 0.5), ("int4", 3.0)]:
        qp = load_qwen3_params(d, spec, quant, 32)
        r = evaluate_ppl(qp, spec, tokens, window=64, block_size=16)
        # Tiny random model => loose budgets; this asserts mechanics, the
        # real gate runs on a real checkpoint via tools/eval_ppl.py.
        assert abs(r["ppl"] - base["ppl"]) < budget, (quant, r["ppl"], base["ppl"])
