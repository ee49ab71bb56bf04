"""Model registry.

Parity: the reference hardcodes Qwen3ForCausalLM (`model_runner.py:63`); we
dispatch on hf_config.architectures so new families plug in as modules
exposing ModelSpec / load_params / forward_prefill / forward_decode.
"""

from __future__ import annotations

from types import SimpleNamespace


def _qwen3_module():
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.utils.loader import load_qwen3_params

    return SimpleNamespace(
        ModelSpec=qwen3.ModelSpec,
        load_params=load_qwen3_params,
        forward_prefill=qwen3.forward_prefill,
        forward_decode=qwen3.forward_decode,
        init_params=qwen3.init_params,
    )


# Qwen2 and Llama reuse the generalized Qwen3 module: identical HF tensor
# names; ModelSpec.from_hf_config flips qk_norm/qkv_bias per model_type.
_REGISTRY = {
    "Qwen3ForCausalLM": _qwen3_module,
    "qwen3": _qwen3_module,
    "Qwen2ForCausalLM": _qwen3_module,
    "qwen2": _qwen3_module,
    "LlamaForCausalLM": _qwen3_module,
    "llama": _qwen3_module,
}


def get_model_module(hf_config):
    archs = getattr(hf_config, "architectures", None) or []
    keys = list(archs) + [getattr(hf_config, "model_type", "")]
    for key in keys:
        if key in _REGISTRY:
            return _REGISTRY[key]()
    raise ValueError(f"unsupported model: {keys}; supported: {sorted(_REGISTRY)}")
