"""Offline-quantized checkpoint roundtrip: save_params/load_saved_params
preserve the pytree (incl. QuantizedTensor nodes) and the engine serves
identically from the .npz (SURVEY.md §7 step 4 offline quantizer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightvllm_tpu.models import qwen3
from lightvllm_tpu.ops.quantization import QuantizedTensor
from lightvllm_tpu.utils.loader import load_saved_params, save_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False, torch_dtype="float32",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_ckpt")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), cfg


def test_roundtrip_quantized(tiny_dir, tmp_path):
    from lightvllm_tpu.utils.loader import load_qwen3_params

    d, cfg = tiny_dir
    spec = qwen3.ModelSpec.from_hf_config(cfg, dtype="float32")
    params = load_qwen3_params(d, spec, "int4", 32)
    path = str(tmp_path / "q.npz")
    save_params(params, path)
    loaded = load_saved_params(path, spec)

    def check(a, b, where):
        if a is None:
            assert b is None, where
            return
        if isinstance(a, tuple):  # per-layer leaves
            assert isinstance(b, tuple) and len(a) == len(b), where
            for i, (ai, bi) in enumerate(zip(a, b)):
                check(ai, bi, f"{where}[{i}]")
            return
        if isinstance(a, QuantizedTensor):
            assert isinstance(b, QuantizedTensor) and a.bits == b.bits, where
            np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
            np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
            return
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32), err_msg=where
        )

    # None leaves (family switches) are dropped at save: absent == None.
    for k in params:
        if k == "layers":
            for lk in params["layers"]:
                check(params["layers"][lk], loaded["layers"].get(lk), lk)
        else:
            check(params[k], loaded.get(k), k)


def test_engine_serves_from_quantized_checkpoint(tiny_dir, tmp_path):
    from lightvllm_tpu import LLM, SamplingParams
    from lightvllm_tpu.utils.loader import load_qwen3_params

    d, cfg = tiny_dir
    spec = qwen3.ModelSpec.from_hf_config(cfg, dtype="float32")
    path = str(tmp_path / "q8.npz")
    save_params(load_qwen3_params(d, spec, "int8", 32), path)

    kw = dict(dtype="float32", kvcache_block_size=16, num_kvcache_blocks=64,
              max_model_len=128, max_num_seqs=4, eos=127)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    live = LLM(d, quantization="int8", quant_group_size=32, **kw).generate(
        [[1, 2, 3, 4]], sp, use_tqdm=False
    )
    saved = LLM(d, quantized_checkpoint=path, **kw).generate(
        [[1, 2, 3, 4]], sp, use_tqdm=False
    )
    assert live[0]["token_ids"] == saved[0]["token_ids"]
