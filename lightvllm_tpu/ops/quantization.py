"""Weight-only quantization (INT8 per-channel, INT4 grouped) and FP8 KV helpers.

The reference has no quantization (SURVEY.md §2.10); this implements the
BASELINE.json north-star additions. Weights are quantized offline at load
time into `QuantizedTensor` pytree nodes; `quantized_matmul` is the jnp
reference path (grouped batched matmul on the MXU with per-group rescale —
numerically exact w.r.t. dequant-then-matmul). The fused Pallas
dequant+matmul kernel in ops/pallas/quant_matmul.py is swapped in on the hot
path behind the same `matmul()` entry point.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scale"],
    meta_fields=["bits"],
)
@dataclass(frozen=True)
class QuantizedTensor:
    """Weight-only quantized 2D weight.

    data:  (groups, group_size, out) int8 or int4; in = groups * group_size.
    scale: (groups, 1, out) float32 symmetric scale.
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    bits: int

    @property
    def shape(self):
        g, gs, out = self.data.shape
        return (g * gs, out)

    @property
    def in_features(self):
        return self.data.shape[0] * self.data.shape[1]

    @property
    def out_features(self):
        return self.data.shape[2]


def quantize_weight(
    w: jnp.ndarray, bits: int, group_size: int | None = None
) -> QuantizedTensor:
    """Symmetric weight-only quantization of w (in, out).

    int8: per-output-channel scale (one group spanning all of in).
    int4: per-(group, out) scale with groups of `group_size` along in.
    """
    assert bits in (8, 4)
    in_f, out_f = w.shape
    wf = w.astype(jnp.float32)
    if bits == 8:
        groups, gs = 1, in_f
        qmax = 127.0
        qdtype = jnp.int8
    else:
        gs = group_size or 128
        assert in_f % gs == 0, f"in_features {in_f} not divisible by group {gs}"
        groups = in_f // gs
        qmax = 7.0
        qdtype = jnp.int4
    wg = wf.reshape(groups, gs, out_f)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # (groups, 1, out)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wg / scale), -qmax - 1, qmax).astype(qdtype)
    return QuantizedTensor(data=q, scale=scale, bits=bits)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    wg = qt.data.astype(jnp.float32) * qt.scale
    return wg.reshape(qt.in_features, qt.out_features).astype(dtype)


def _precision(x: jnp.ndarray):
    """Full-precision dots for f32 inputs (parity/tests); default (fast MXU
    bf16 path) otherwise. XLA's DEFAULT downcasts f32 matmul inputs on some
    backends, which breaks checkpoint-parity guarantees."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def quantized_matmul(x: jnp.ndarray, qt: QuantizedTensor) -> jnp.ndarray:
    """x (..., in) @ qt -> (..., out); jnp reference path.

    Grouped as a batched matmul over quant groups with a per-group rescale,
    so the MXU sees dense int->bf16 matmuls and the result is exactly
    dequant(qt) @ x in fp32 accumulation.
    """
    groups, gs, out_f = qt.data.shape
    lead = x.shape[:-1]
    xg = x.reshape(-1, groups, gs).swapaxes(0, 1)  # (groups, T, gs)
    wg = qt.data.astype(x.dtype)  # (groups, gs, out)
    partial_out = jax.lax.dot_general(
        xg,
        wg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_precision(x),
    )  # (groups, T, out)
    out = jnp.sum(partial_out * qt.scale, axis=0)  # scale (groups,1,out) bcast
    return out.astype(x.dtype).reshape(*lead, out_f)


def matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """Unified projection: w is a plain array (in, out) or QuantizedTensor."""
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w)
    return jnp.dot(
        x, w, preferred_element_type=jnp.float32, precision=_precision(x)
    ).astype(x.dtype)


# --- FP8 KV-cache quantization -------------------------------------------

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0


def quantize_kv_fp8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) scaled FP8 quantization of (T, H, D) K or V."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (T, H)
    scale = jnp.maximum(amax / FP8_MAX, 1e-8)
    q = (x.astype(jnp.float32) / scale[..., None]).astype(FP8_DTYPE)
    return q, scale.astype(jnp.float32)
