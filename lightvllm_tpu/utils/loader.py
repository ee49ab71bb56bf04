"""Checkpoint loading: HF safetensors -> layer-stacked JAX pytree.

Handles the Qwen3/Qwen2/Llama family (same HF tensor names; Qwen3 adds
q/k norms, Qwen2 adds qkv biases — selected by ModelSpec switches).

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
        # Per-layer tuple leaves, NOT a stacked (L, ...) array: static
        # slices of stacked leaves are materialized as temps before every
        # Pallas custom call, copying the whole weight tree per decode step
        # (measured 168 vs 379 GiB/s at 8B int4 — see models/qwen3.py).
        return tuple(fn(i) for i in range(L))

    def stack_quant(fn):
        """Per-layer linears, quantized ONE LAYER AT A TIME so the
        transients stay ~1 layer (an 8B model's full bf16 tree would not
        fit HBM before quantization)."""
        if quantization is None:
            return stack(fn)
        bits = 8 if quantization == "int8" else 4
        return tuple(quantize_weight(fn(i), bits, group_size) for i in range(L))

    p = "model.layers.{}.{}"
    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": {
            "input_ln": stack(lambda i: get(p.format(i, "input_layernorm.weight"))),
            "wq": stack_quant(
                lambda i: linear(p.format(i, "self_attn.q_proj.weight"))
            ),
            "wk": stack_quant(
                lambda i: linear(p.format(i, "self_attn.k_proj.weight"))
            ),
            "wv": stack_quant(
                lambda i: linear(p.format(i, "self_attn.v_proj.weight"))
            ),
            "q_norm": (
                stack(lambda i: get(p.format(i, "self_attn.q_norm.weight")))
                if spec.qk_norm
                else None
            ),
            "k_norm": (
                stack(lambda i: get(p.format(i, "self_attn.k_norm.weight")))
                if spec.qk_norm
                else None
            ),
            "bq": (
                stack(lambda i: get(p.format(i, "self_attn.q_proj.bias")))
                if spec.qkv_bias
                else None
            ),
            "bk": (
                stack(lambda i: get(p.format(i, "self_attn.k_proj.bias")))
                if spec.qkv_bias
                else None
            ),
            "bv": (
                stack(lambda i: get(p.format(i, "self_attn.v_proj.bias")))
                if spec.qkv_bias
                else None
            ),
            "wo": stack_quant(
                lambda i: linear(p.format(i, "self_attn.o_proj.weight"))
            ),
            "post_ln": stack(
                lambda i: get(p.format(i, "post_attention_layernorm.weight"))
            ),
            "w_gate": stack_quant(
                lambda i: linear(p.format(i, "mlp.gate_proj.weight"))
            ),
            "w_up": stack_quant(
                lambda i: linear(p.format(i, "mlp.up_proj.weight"))
            ),
            "w_down": stack_quant(
                lambda i: linear(p.format(i, "mlp.down_proj.weight"))
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


# --- offline-quantized checkpoints (SURVEY.md §7 step 4) -------------------
#
# Format: one .npz holding every array leaf keyed by its pytree path, plus a
# manifest of QuantizedTensor nodes {path: bits}. Quantize once offline with
# tools/quantize_checkpoint.py, then serve without paying load-time
# quantization (and without needing the bf16 checkpoint to fit in HBM).

_QT_FIELDS = ("data", "scale")


def _to_portable(a: np.ndarray) -> tuple[np.ndarray, str | None]:
    """np.savez serializes ml_dtypes bfloat16 as opaque void ('|V2'), which
    np.load returns unusable. Store bf16 as a uint16 bit-view and record the
    original dtype so load can restore it."""
    if a.dtype.name == "bfloat16":
        return a.view(np.uint16), "bfloat16"
    return a, None


def save_params(params: dict, path: str) -> None:
    """Serialize a (possibly quantized) param pytree to <path> (.npz)."""
    from lightvllm_tpu.ops.quantization import QuantizedTensor

    arrays: dict[str, np.ndarray] = {}
    qt_bits: dict[str, int] = {}
    dtypes: dict[str, str] = {}

    def put(key: str, a: np.ndarray) -> None:
        a, orig = _to_portable(a)
        if orig is not None:
            dtypes[key] = orig
        arrays[key] = a

    def walk(node, prefix):
        if node is None:
            return
        if isinstance(node, (tuple, list)):
            # Per-layer tuple leaves serialize STACKED (one array per key):
            # the on-disk format is unchanged from stacked-layout
            # checkpoints, and load_saved_params re-splits per layer.
            first = node[0]
            if isinstance(first, QuantizedTensor):
                qt_bits[prefix] = first.bits
                for f in _QT_FIELDS:
                    put(
                        f"{prefix}.{f}",
                        np.stack([np.asarray(getattr(el, f)) for el in node]),
                    )
            else:
                put(prefix, np.stack([np.asarray(el) for el in node]))
            return
        if isinstance(node, QuantizedTensor):
            qt_bits[prefix] = node.bits
            for f in _QT_FIELDS:
                put(f"{prefix}.{f}", np.asarray(getattr(node, f)))
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
            return
        put(prefix, np.asarray(node))

    walk(params, "")
    import json

    arrays["__quantized__"] = np.frombuffer(
        json.dumps(qt_bits).encode(), dtype=np.uint8
    )
    arrays["__dtypes__"] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_saved_params(path: str, spec: ModelSpec) -> dict:
    """Load a param pytree saved by save_params."""
    import json

    from lightvllm_tpu.ops.quantization import QuantizedTensor

    z = np.load(path)
    qt_bits = json.loads(bytes(z["__quantized__"]).decode())
    dtypes = (
        json.loads(bytes(z["__dtypes__"]).decode()) if "__dtypes__" in z else {}
    )
    dt = spec.jnp_dtype

    def raw(key):
        a = z[key]
        if dtypes.get(key) == "bfloat16":
            import ml_dtypes

            a = a.view(ml_dtypes.bfloat16)
        return a

    L = spec.num_layers

    def to_dev(a: np.ndarray):
        x = jnp.asarray(a)
        return x.astype(dt) if x.dtype in (jnp.float32, jnp.bfloat16) else x

    def arr(key, layered: bool):
        a = raw(key)
        if layered:
            # On-disk format is layer-stacked; the in-memory layout is
            # per-layer tuple leaves (sliced in numpy so device transfers
            # happen one layer at a time).
            assert a.shape[0] == L, f"{key}: {a.shape} vs {L} layers"
            return tuple(to_dev(a[i]) for i in range(L))
        return to_dev(a)

    params: dict = {"layers": {}}
    for key in z.files:
        if key in ("__quantized__", "__dtypes__") or "." in key:
            continue
        parts = key.split("/")
        node = params
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        node[parts[-1]] = arr(key, layered=parts[0] == "layers")
    for qpath, bits in qt_bits.items():
        parts = qpath.split("/")
        node = params
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        if parts[0] == "layers":
            d = raw(f"{qpath}.data")
            s = raw(f"{qpath}.scale")
            assert d.shape[0] == L
            node[parts[-1]] = tuple(
                QuantizedTensor(
                    data=jnp.asarray(d[i]), scale=jnp.asarray(s[i]), bits=bits
                )
                for i in range(L)
            )
        else:
            node[parts[-1]] = QuantizedTensor(
                data=jnp.asarray(raw(f"{qpath}.data")),
                scale=jnp.asarray(raw(f"{qpath}.scale")),
                bits=bits,
            )
    params.setdefault("lm_head", None)
    return params
