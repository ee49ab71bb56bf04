"""Llama / Qwen2 family support (beyond the reference's single Qwen3): the
generalized decoder (qk_norm / qkv_bias switches) must match HF transformers
greedy decode token-for-token on tiny random checkpoints."""

import pytest

import lightvllm_tpu  # noqa: F401  (conftest pins the cpu backend)
from lightvllm_tpu import LLM, SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 128
BS = 16


def make_hf(tmp_path_factory, kind):
    torch.manual_seed(0)
    common = dict(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    if kind in ("llama", "llama3_scaled", "yarn_scaled"):
        from transformers import LlamaConfig, LlamaForCausalLM

        rope_scaling = None
        if kind == "llama3_scaled":
            rope_scaling = {
                "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 32,
            }
        elif kind == "yarn_scaled":
            rope_scaling = {
                "rope_type": "yarn", "factor": 4.0,
                "original_max_position_embeddings": 64,
            }
        cfg = LlamaConfig(
            attention_bias=False, rope_scaling=rope_scaling, **common
        )
        model = LlamaForCausalLM(cfg).eval()
    else:
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(**common)
        model = Qwen2ForCausalLM(cfg).eval()
        # Qwen2 uses qkv biases; randomize them so the test exercises them.
        with torch.no_grad():
            for layer in model.model.layers:
                for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                             layer.self_attn.v_proj):
                    if proj.bias is not None:
                        proj.bias.uniform_(-0.05, 0.05)
    d = tmp_path_factory.mktemp(f"tiny_{kind}")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def hf_greedy(model, prompt, n):
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n, do_sample=False, eos_token_id=None)
    return out[0, len(prompt):].tolist()


@pytest.mark.parametrize(
    "kind", ["llama", "qwen2", "llama3_scaled", "yarn_scaled"]
)
def test_family_greedy_matches_hf(tmp_path_factory, kind):
    model_dir, hf_model = make_hf(tmp_path_factory, kind)
    llm = LLM(
        model_dir, dtype="float32", kvcache_block_size=BS,
        num_kvcache_blocks=64, max_model_len=256, max_num_seqs=4,
        eos=VOCAB - 1,
    )
    spec = llm.model_runner.spec
    assert spec.qk_norm is False  # no qwen3 in this matrix
    assert spec.qkv_bias == (kind == "qwen2")
    if kind.endswith("_scaled"):
        assert spec.rope_scaling is not None  # silently ignoring = wrong math
    prompts = [[1, 5, 9, 2, 7, 3], [4, 8, 6, 10]]
    res = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
        use_tqdm=False,
    )
    for prompt, r in zip(prompts, res):
        assert r["token_ids"] == hf_greedy(hf_model, prompt, 6), kind
