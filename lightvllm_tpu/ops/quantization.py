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
    meta_fields=["bits", "packing"],
)
@dataclass(frozen=True)
class QuantizedTensor:
    """Weight-only quantized 2D weight.

    data:  int8, (groups, group_size, out) for int8 quantization, or
           (groups, group_size // 2, out) nibble-packed for int4 (native
           jnp.int4 arrays break device transfer on some TPU runtimes).
           Packing is split-half along the group axis: row j holds group
           element j in the low nibble and element j + gs//2 in the high
           nibble, so unpacking is two shifts + a concat (no interleave).
    scale: (groups, 1, out) float32 symmetric per-(group, out) scale.
    packing (int4 only): "split" = signed two's-complement nibbles (the
           canonical/checkpoint format); "offs" = the low nibble stored
           offset-binary (l + 8, high nibble unchanged) — the serving
           format the runner repacks to at init, which the fused kernel
           unpacks with one AND + two int8->bf16 converts (no shifts, no
           int32 widen; tools/profile_unpack.py vfold2, +11% at decode T).
    """

    data: jnp.ndarray
    scale: jnp.ndarray
    bits: int
    packing: str = "split"

    @property
    def group_size(self):
        return self.data.shape[1] * (2 if self.bits == 4 else 1)

    @property
    def shape(self):
        return (self.in_features, self.out_features)

    @property
    def in_features(self):
        return self.data.shape[0] * self.group_size

    @property
    def out_features(self):
        return self.data.shape[2]


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(groups, gs, out) int8 in [-8, 7] -> (groups, gs//2, out) packed."""
    g, gs, out = q.shape
    assert gs % 2 == 0
    low = q[:, : gs // 2]
    high = q[:, gs // 2 :]
    return ((low & 0x0F) | (high << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray, packing: str = "split") -> jnp.ndarray:
    """(groups, gs//2, out) packed int8 -> (groups, gs, out) int8 [-8, 7]."""
    high = packed >> 4  # arithmetic shift sign-extends the high nibble
    if packing == "offs":
        low = (packed & 0x0F).astype(jnp.int8) - 8  # offset-binary low
    else:
        low = ((packed << 4).astype(jnp.int8)) >> 4  # sign-extended low
    return jnp.concatenate([low, high], axis=1)


def repack_offs(qt: QuantizedTensor) -> QuantizedTensor:
    """split-half signed int4 -> offset-binary-low serving format (value-
    preserving byte transform: b' = ((l + 8) & 0xF) | ((h & 0xF) << 4))."""
    if qt.bits != 4 or qt.packing == "offs":
        return qt
    w32 = qt.data.astype(jnp.int32)
    low = (w32 << 28) >> 28
    high = w32 >> 4
    data = (((low + 8) & 0x0F) | ((high & 0x0F) << 4)).astype(jnp.int8)
    return QuantizedTensor(
        data=data, scale=qt.scale, bits=4, packing="offs"
    )


def quantize_weight(
    w: jnp.ndarray,
    bits: int,
    group_size: int | None = None,
    clip_search: bool = False,
) -> QuantizedTensor:
    """Symmetric weight-only quantization of w (in, out) with per-(group,
    out-channel) scales along the contraction axis.

    int8 defaults to groups of 512 (finer than the classic per-out-channel
    scale, so strictly more accurate); int4 to groups of 128. Grouping also
    bounds the VMEM block the fused Pallas kernel dequantizes per grid step.

    clip_search (AWQ-style): instead of the plain absmax scale, search a
    per-(group, out-channel) clip factor c in [0.5, 1.0] minimizing the
    group's squared reconstruction error. With an in-row outlier sharing a
    group (a 10-100x row crushes the other rows' precision under absmax),
    clipping the outlier trades its own error for everyone else's — the
    measured fallback for outlier-heavy checkpoints (QUALITY.md).
    """
    assert bits in (8, 4)
    in_f, out_f = w.shape
    wf = w.astype(jnp.float32)
    if bits == 8:
        gs = group_size or min(512, in_f)
        qmax = 127.0
    else:
        gs = group_size or 128
        qmax = 7.0
    gs = min(gs, in_f)
    assert in_f % gs == 0, f"in_features {in_f} not divisible by group {gs}"
    groups = in_f // gs
    wg = wf.reshape(groups, gs, out_f)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # (groups, 1, out)

    def quantize_at(scale):
        scale = jnp.maximum(scale, 1e-8)
        q = jnp.clip(jnp.round(wg / scale), -qmax - 1, qmax)
        return q, scale

    if clip_search:
        best_err = None
        best = None
        for c in (1.0, 0.9, 0.8, 0.7, 0.6, 0.5):
            q, scale = quantize_at(amax * c / qmax)
            err = jnp.sum((q * scale - wg) ** 2, axis=1, keepdims=True)
            if best_err is None:
                best_err, best = err, (q, scale)
            else:
                pick = err < best_err
                best_err = jnp.where(pick, err, best_err)
                best = (
                    jnp.where(pick, q, best[0]),
                    jnp.where(pick, scale, best[1]),
                )
        q, scale = best
    else:
        q, scale = quantize_at(amax / qmax)
    q = q.astype(jnp.int8)
    if bits == 4:
        q = pack_int4(q)
    return QuantizedTensor(data=q, scale=scale, bits=bits)


def unpacked_data(qt: QuantizedTensor) -> jnp.ndarray:
    """(groups, gs, out) int8 view of the (possibly packed) payload."""
    return unpack_int4(qt.data, qt.packing) if qt.bits == 4 else qt.data


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    wg = unpacked_data(qt).astype(jnp.float32) * qt.scale
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
    data = unpacked_data(qt)
    groups, gs, out_f = data.shape
    lead = x.shape[:-1]
    xg = x.reshape(-1, groups, gs).swapaxes(0, 1)  # (groups, T, gs)
    wg = data.astype(x.dtype)  # (groups, gs, out)
    partial_out = jax.lax.dot_general(
        xg,
        wg,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_precision(x),
    )  # (groups, T, out)
    out = jnp.sum(partial_out * qt.scale, axis=0)  # scale (groups,1,out) bcast
    return out.astype(x.dtype).reshape(*lead, out_f)


# Quantized-matmul implementation switch, resolved at trace time:
#   "auto"   -> fused Pallas kernel on TPU, jnp reference path on CPU
#   "pallas" / "jnp" -> forced (tests/benchmarks)
QUANT_MATMUL_IMPL = "auto"


def _use_pallas_quant(out_features: int) -> bool:
    if QUANT_MATMUL_IMPL == "jnp":
        return False
    if QUANT_MATMUL_IMPL == "pallas":
        return True
    return jax.default_backend() != "cpu" and out_features % 128 == 0


def matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """Unified projection: w is a plain array (in, out) or QuantizedTensor."""
    if isinstance(w, QuantizedTensor):
        if _use_pallas_quant(w.out_features):
            from lightvllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas

            return quant_matmul_pallas(
                x, w.data, w.scale, bits=w.bits, packing=w.packing
            )
        return quantized_matmul(x, w)
    return jnp.dot(
        x, w, preferred_element_type=jnp.float32, precision=_precision(x)
    ).astype(x.dtype)


# --- FP8 KV-cache quantization -------------------------------------------

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0


# KV-cache FP8 is scale-free e4m3 (see ops/kv_cache.py for the rationale):
# the cast helper lives in kv_cache.to_kv_dtype; only the dtype constants
# are shared from here.
