"""Pallas fused dequant+matmul for weight-only INT8/INT4 projections.

The reference has no quantization (SURVEY.md §2.10); this is the
BASELINE.json north-star hot path. The win over the jnp reference path
(ops/quantization.py quantized_matmul) is HBM traffic: weights travel
HBM -> VMEM at 1 or 0.5 bytes/element, so decode — weight-bandwidth-bound —
moves 2-4x less data per step.

Design (r2, from measured evidence — tools/profile_quant.py on v5e):
  - POST-MATMUL group rescale: the MXU consumes int8->bf16 converted
    weights (a hardware-fast convert), each quant group's partial product
    is rescaled AFTER the matmul. The per-element f32 dequant chain of the
    r1 kernel (int8->f32, mul, ->bf16) was VPU-bound at decode shapes:
    524 GB/s vs 744 roofline at 4096x12288; post-matmul rescale moves the
    multiply from O(In*Out) elements to O(KG*T*Out) — gs x less VPU work.
  - WIDE-TO decode mode: at decode T the r1 kernel re-read the x tile once
    per 256-wide output tile (+24% traffic at 4096x12288). For small T the
    f32 accumulator for the ENTIRE output row block fits VMEM, so TO=Out
    and x is read exactly once. Measured: int8 638 GB/s (1.73x bf16 wall
    clock), vs 527 for the r1 kernel.
  - INT4 unpacks via int32 widening + shifts (Mosaic legalizes neither
    shifts nor add/sub on int8 vectors; a bitwise-ops+bf16-sub variant
    measured SLOWER — the 4-per-lane int8 vector format pays a shuffle on
    every convert regardless).

Layout matches QuantizedTensor: data (groups, gs, out) int8 (nibble-packed
gs//2 rows for int4), scale (groups, 1, out) f32. The contraction axis runs
as the innermost grid dimension in whole quant groups, accumulating into an
f32 VMEM scratch tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype,
                         nk, bits, unpack="split"):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_i8 = w_ref[...]  # (KG, gsp, TO) int8, nibble-packed when bits == 4
    mm_dt = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16
    if bits == 4 and unpack == "fold2":
        # Offset-binary-low packing + x-side fold (tools/profile_unpack.py
        # vfold2, +11% at decode T=64): W2 = [conv(b & 0xF); conv(b)]
        # = [l + 8; 16h + l + 8] needs ONE int8 AND + two int8->float
        # converts — no shifts, no int32 widen. The host passes
        # x2 = [x_l - x_h/16; x_h/16] so the K=gs dot directly yields
        # dot(x_l, l+8) + dot(x_h, h); the -8*sum(x_l) bias is a host-side
        # rank-groups correction (see quant_matmul_pallas).
        u = (w_i8 & 0x0F).astype(mm_dt)
        wb = jnp.concatenate([u, w_i8.astype(mm_dt)], axis=1)
    else:
        if bits == 4:
            # Mosaic doesn't legalize shifts (or add/sub) on int8 vectors;
            # widen to int32. Split-half packing: row j holds group
            # elements j (low nibble) and j + gs//2 (high nibble); "offs"
            # packing stores the low nibble offset-binary (l + 8).
            w32 = w_i8.astype(jnp.int32)
            if unpack == "offs":
                low = (w32 & 0x0F) - 8
            else:
                low = (w32 << 28) >> 28  # sign-extended low nibble
            high = w32 >> 4  # arithmetic shift sign-extends the high nibble
            w_i8 = jnp.concatenate([low, high], axis=1)
        wb = w_i8.astype(mm_dt)  # hardware-fast int->float convert
    xg = x_ref[...]  # (KG, TT, gs)
    precision = jax.lax.Precision.HIGHEST if mm_dt == jnp.float32 else None
    partial = jax.lax.dot_general(
        xg.astype(mm_dt),
        wb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )  # (KG, TT, TO)
    # Post-matmul per-group rescale (exact: matches the jnp oracle's
    # partial-sum scaling in quantized_matmul).
    acc_ref[...] += jnp.sum(partial * s_ref[...], axis=0)

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _pick_tile(total: int, target: int) -> int:
    """Largest divisor of `total` that is <= target."""
    t = min(target, total)
    while total % t:
        t -= 1
    return t


def _plan_tiles(Tp, TT, groups, gsp, out, tile_o, tile_k, gs):
    """Pick the output tile TO and contraction tile KG (in groups).

    Every choice keeps the double-buffered weight window + f32 accumulator
    inside VMEM: the decode fast path (TO = out, x tile read exactly once)
    additionally requires ONE group's full-width weight slice to fit —
    without that guard the 8B int8 LM head (gsp=512, out=153600) compiled
    a 75 MB window that blew the 128 MB VMEM budget at T <= 13 (prefill
    last-token logits / tiny decode batches)."""
    if tile_o:
        TO = tile_o
    elif (
        Tp <= 128
        and Tp * out * 4 <= 8 * 2**20
        and gsp * out <= 24 * 2**20
    ):
        # Decode mode: the whole output row block's accumulator fits VMEM,
        # so x re-reads are cheap — but cap TO at 2048: measured on v5e r4
        # (tools/profile_unpack.py), TO=2048 beats TO=out by 5-17% at every
        # 8B projection shape (4096x6144: 30.8 vs 37.2 us; 4096x24576:
        # 113.4 vs 119.3) — more grid steps pipeline the weight DMAs
        # against the int4 unpack, which is the bottleneck at decode T.
        TO = out
        if out > 2048:
            for d in range(128, 2049, 128):
                if out % d == 0:
                    TO = d
    else:
        # Largest divisor of `out` (multiple of the 128 lane tile) whose
        # f32 accumulator and 1-group weight tile both fit comfortably in
        # VMEM: bigger TO = out/TO fewer x re-reads and fewer grid steps.
        # (The old fixed TO=128/256/512 made the 151936-vocab LM head run
        # 1187 output tiles — measured 4x its bandwidth floor.) Capped at
        # 2048: wider tiles save <4% more grid steps while ballooning the
        # Mosaic unroll (compile blowup risk over the remote-AOT tunnel).
        acc_cap = (8 * 2**20) // (4 * TT)
        w_cap = max(128, (4 * 2**20) // max(1, gsp))
        lim = max(128, min(acc_cap, w_cap, out, 2048))
        TO = 128
        for d in range(128, lim + 1, 128):
            if out % d == 0:
                TO = d
    assert out % TO == 0 and TO % 128 == 0, f"out {out} tile {TO}"
    # Bound the weight tile to ~6 MB so double buffering fits VMEM.
    kg_cap = max(1, (6 * 2**20) // max(1, gsp * TO))
    KG = _pick_tile(groups, min(max(1, tile_k // gs), kg_cap))
    return TO, KG


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "tile_t", "tile_o", "tile_k", "interpret", "packing"
    ),
)
def quant_matmul_pallas(
    x: jnp.ndarray,  # (..., In) bf16/f32
    data: jnp.ndarray,  # (groups, gs, Out) int8; nibble-packed gs//2 if int4
    scale: jnp.ndarray,  # (groups, 1, Out) f32
    bits: int = 8,
    tile_t: int = 256,
    tile_o: int = 0,  # 0 = auto
    tile_k: int = 2048,  # contraction elements per grid step (whole groups)
    packing: str = "split",  # int4 payload: "split" | "offs"
    interpret: bool = False,
) -> jnp.ndarray:  # (..., Out) in x.dtype
    lead = x.shape[:-1]
    groups, gsp, out = data.shape
    gs = gsp * 2 if bits == 4 else gsp  # real (unpacked) group size
    in_f = groups * gs
    xf = x.reshape(-1, in_f)
    T = xf.shape[0]

    TT = _pick_tile(-(-T // 8) * 8, tile_t)
    Tp = -(-T // TT) * TT
    # (G, T, gs): the kernel's batched-matmul layout (prepared once here —
    # O(T*In), negligible vs the weight stream).
    xg = xf.reshape(T, groups, gs).swapaxes(0, 1)
    if Tp != T:
        xg = jnp.pad(xg, ((0, 0), (0, Tp - T), (0, 0)))

    TO, KG = _plan_tiles(Tp, TT, groups, gsp, out, tile_o, tile_k, gs)
    nk = groups // KG

    # x-side fold (offs packing, decode-T only — measured +11% at T=64,
    # -3% at T=128, tools/profile_unpack.py): x2 = [x_l - x_h/16; x_h/16]
    # turns the kernel's unpack into one AND + two converts; the -8*sum(x_l)
    # bias is added back below as a rank-groups outer product vs the scales.
    unpack = packing
    corr = None
    if bits == 4 and packing == "offs" and Tp <= 64:
        unpack = "fold2"
        xl = xg[:, :, :gsp].astype(jnp.float32)
        xh = xg[:, :, gsp:].astype(jnp.float32)
        xg = jnp.concatenate(
            [xl - xh * (1.0 / 16.0), xh * (1.0 / 16.0)], axis=2
        ).astype(x.dtype)
        corr = -8.0 * jnp.sum(xl, axis=2)  # (groups, Tp)

    grid = (Tp // TT, out // TO, nk)
    res = pl.pallas_call(
        functools.partial(
            _quant_matmul_kernel, out_dtype=x.dtype, nk=nk, bits=bits,
            unpack=unpack,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (KG, TT, gs), lambda t, o, k: (k, t, 0), memory_space=pltpu.VMEM
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
            vmem_limit_bytes=100 * 1024 * 1024,
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
    )(xg, data, scale)
    if corr is not None:
        res = res + jnp.einsum(
            "gt,go->to", corr, scale[:, 0, :]
        ).astype(res.dtype)
    return res[:T].reshape(*lead, out)
