"""Checkpoint loading: HF safetensors -> layer-stacked JAX pytree.

Parity: reference `lightvllm/utils/loader.py:23-91` (streams *.safetensors,
routes packed q/k/v and gate/up weights through per-param shard loaders via
packed_modules_mapping). Here q/k/v and gate/up stay separate tensors —
packed layouts misalign with contiguous GSPMD shards on the "model" axis —
HF (out, in) layouts transpose to (in, out), and per-layer tensors stack
along a leading L axis for the scan-based decoder. Optional weight-only
quantization is applied per layer at load.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from lightvllm_tpu.models.qwen3 import ModelSpec
from lightvllm_tpu.ops.quantization import quantize_weight

try:  # bf16-capable numpy view
    import ml_dtypes  # noqa: F401

    _HAVE_ML_DTYPES = True
except ImportError:  # pragma: no cover
    _HAVE_ML_DTYPES = False


def _load_all_tensors(model_path: str) -> dict[str, np.ndarray]:
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    assert files, f"no *.safetensors under {model_path}"
    tensors: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for name in sf.keys():
                tensors[name] = sf.get_tensor(name)
    return tensors


def load_qwen3_params(
    model_path: str,
    spec: ModelSpec,
    quantization: str | None = None,
    group_size: int = 128,
) -> dict:
    t = _load_all_tensors(model_path)
    dt = spec.jnp_dtype
    L = spec.num_layers

    def get(name: str) -> jnp.ndarray:
        arr = t[name]
        if arr.dtype == np.uint16 or arr.dtype.name == "bfloat16":
            # safetensors numpy returns bf16 as bfloat16 (ml_dtypes) or u16.
            arr = arr.view("bfloat16") if arr.dtype == np.uint16 else arr
        return jnp.asarray(arr).astype(dt)

    def linear(name: str) -> jnp.ndarray:
        return get(name).T  # HF (out, in) -> (in, out)

    def stack(fn):
        return jnp.stack([fn(i) for i in range(L)])

    def maybe_quant(stacked: jnp.ndarray):
        if quantization is None:
            return stacked
        bits = 8 if quantization == "int8" else 4
        return jax.vmap(lambda m: quantize_weight(m, bits, group_size))(stacked)

    p = "model.layers.{}.{}"
    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": {
            "input_ln": stack(lambda i: get(p.format(i, "input_layernorm.weight"))),
            "wq": maybe_quant(
                stack(lambda i: linear(p.format(i, "self_attn.q_proj.weight")))
            ),
            "wk": maybe_quant(
                stack(lambda i: linear(p.format(i, "self_attn.k_proj.weight")))
            ),
            "wv": maybe_quant(
                stack(lambda i: linear(p.format(i, "self_attn.v_proj.weight")))
            ),
            "q_norm": stack(lambda i: get(p.format(i, "self_attn.q_norm.weight"))),
            "k_norm": stack(lambda i: get(p.format(i, "self_attn.k_norm.weight"))),
            "wo": maybe_quant(
                stack(lambda i: linear(p.format(i, "self_attn.o_proj.weight")))
            ),
            "post_ln": stack(
                lambda i: get(p.format(i, "post_attention_layernorm.weight"))
            ),
            "w_gate": maybe_quant(
                stack(lambda i: linear(p.format(i, "mlp.gate_proj.weight")))
            ),
            "w_up": maybe_quant(
                stack(lambda i: linear(p.format(i, "mlp.up_proj.weight")))
            ),
            "w_down": maybe_quant(
                stack(lambda i: linear(p.format(i, "mlp.down_proj.weight")))
            ),
        },
        "final_ln": get("model.norm.weight"),
        "lm_head": (
            None
            if spec.tie_word_embeddings or "lm_head.weight" not in t
            else linear("lm_head.weight")
        ),
    }
    return params
