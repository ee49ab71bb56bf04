"""Pallas fused dequant+matmul for weight-only INT8/INT4 projections.

The reference has no quantization (SURVEY.md §2.10); this is the
BASELINE.json north-star hot path. The win over the jnp reference path
(ops/quantization.py quantized_matmul) is HBM traffic: weights travel
HBM -> VMEM at 1 or 0.5 bytes/element and are dequantized on the VPU right
before the MXU consumes them, so decode — which is weight-bandwidth-bound —
moves 2-4x less data per step. Dequant VPU work is O(KC*Out_tile) per grid
cell vs the MXU's O(T_tile*KC*Out_tile): negligible for T_tile >= 64 and
hidden behind the matmul pipeline.

Layout matches QuantizedTensor: data (groups, gs, out), scale
(groups, 1, out) f32. The contraction axis runs as the innermost grid
dimension in chunks of whole quant groups, accumulating into an f32 VMEM
scratch tile, so arbitrarily large In never exceeds the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_matmul_kernel(
    x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk, bits
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_i8 = w_ref[...]  # (KG, gs, TO) int8, nibble-packed when bits == 4
    if bits == 4:
        # Mosaic doesn't legalize shifts on int8 vectors; widen to int32.
        w32 = w_i8.astype(jnp.int32)
        low = (w32 << 28) >> 28  # sign-extended low nibble
        high = w32 >> 4  # arithmetic shift sign-extends the high nibble
        w_i8 = jnp.concatenate([low, high], axis=1)
    # dequant: (KG, gs, TO) * (KG, 1, TO) f32 -> (KG*gs, TO) in x dtype.
    w = (w_i8.astype(jnp.float32) * s_ref[...]).astype(x_ref.dtype)
    kg, gs, to = w.shape
    acc_ref[...] += jnp.dot(
        x_ref[...], w.reshape(kg * gs, to), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _pick_tile(total: int, target: int) -> int:
    """Largest divisor of `total` that is <= target."""
    t = min(target, total)
    while total % t:
        t -= 1
    return t


@functools.partial(
    jax.jit, static_argnames=("bits", "tile_t", "tile_o", "tile_k", "interpret")
)
def quant_matmul_pallas(
    x: jnp.ndarray,  # (..., In) bf16/f32
    data: jnp.ndarray,  # (groups, gs, Out) int8; nibble-packed gs//2 if int4
    scale: jnp.ndarray,  # (groups, 1, Out) f32
    bits: int = 8,
    tile_t: int = 256,
    tile_o: int = 0,  # 0 = auto
    tile_k: int = 2048,  # contraction elements per grid step (rounded to groups)
    interpret: bool = False,
) -> jnp.ndarray:  # (..., Out) in x.dtype
    lead = x.shape[:-1]
    groups, gsp, out = data.shape
    gs = gsp * 2 if bits == 4 else gsp  # real (unpacked) group size
    in_f = groups * gs
    xf = x.reshape(-1, in_f)
    T = xf.shape[0]

    TT = _pick_tile(-(-T // 8) * 8, tile_t)
    # Re-pad T so TT divides it (TT picked against the 8-padded T).
    Tp = -(-T // TT) * TT
    if Tp != T:
        xf = jnp.pad(xf, ((0, Tp - T), (0, 0)))
    TO = tile_o or (256 if out % 256 == 0 else 128)
    assert out % TO == 0 and TO % 128 == 0, f"out {out} tile {TO}"
    KG = _pick_tile(groups, max(1, tile_k // gs))
    nk = groups // KG

    grid = (Tp // TT, out // TO, nk)
    res = pl.pallas_call(
        functools.partial(
            _quant_matmul_kernel, out_dtype=x.dtype, nk=nk, bits=bits
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TT, KG * gs), lambda t, o, k: (t, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (KG, gsp, TO), lambda t, o, k: (k, 0, o), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (KG, 1, TO), lambda t, o, k: (k, 0, o), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TT, TO), lambda t, o, k: (t, o), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, out), x.dtype),
        scratch_shapes=[pltpu.VMEM((TT, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * in_f * out,
            bytes_accessed=(
                Tp * in_f * x.dtype.itemsize
                + groups * gsp * out  # int8 payload (already halved for int4)
                + Tp * out * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, data, scale)
    return res[:T].reshape(*lead, out)
