#!/usr/bin/env python
"""Isolated profiling of the fused dequant+matmul kernel at DECODE shapes.

VERDICT r1 weak#1: int8/int4 decode was SLOWER than bf16. This harness
times kernel variants at the actual hot sizes (T = decode batch, not the
tile_t=256 design point) and prints effective weight-streaming GB/s per
variant so the winner is chosen on evidence.

Variants:
  bf16     jnp.dot on bf16 weights (what quant must beat)
  v0       current quant_matmul_pallas (per-element dequant before MXU)
  v1       post-matmul per-group rescale: MXU consumes int8->bf16 converted
           weights (hw-fast convert), the f32 scale multiply moves from
           O(K*O) elements to O(KG*T*O) (gs x less VPU work at decode T)
  roof     pure weight-streaming Pallas kernel (DMA roofline)

Run on the chip: python tools/profile_quant.py [--model 0.6b|8b] [--t 32 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightvllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
from lightvllm_tpu.ops.quantization import quantize_weight

# Slope timing: the tunnel adds ~30 ms of constant dispatch+fetch latency
# per jit call (with ~ms noise), far above the ~10 us kernels measured.
# Loop the kernel inside ONE graph via fori_loop (serialized through a
# scalar dependence), time at two iteration counts, divide the difference.
N1, N2, TRIALS = 16, 2048, 4


# --------------------------- v1 kernel -------------------------------------

def _qmm_v1_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk, bits):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_i8 = w_ref[...]  # (KG, gsp, TO)
    if bits == 4:
        w32 = w_i8.astype(jnp.int32)
        low = (w32 << 28) >> 28
        high = w32 >> 4
        w_i8 = jnp.concatenate([low, high], axis=1)
    wb = w_i8.astype(jnp.bfloat16)  # hw-fast int->bf16 convert
    xg = x_ref[...]  # (KG, TT, gs)
    partial = jax.lax.dot_general(
        xg, wb,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (KG, TT, TO)
    acc_ref[...] += jnp.sum(partial * s_ref[...], axis=0)

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bits", "tile_o", "tile_k"))
def qmm_v1(x, data, scale, bits=8, tile_o=0, tile_k=2048):
    groups, gsp, out = data.shape
    gs = gsp * 2 if bits == 4 else gsp
    in_f = groups * gs
    T = x.shape[0]
    TT = max(8, T)
    xg = x.reshape(T, groups, gs).swapaxes(0, 1)  # (G, T, gs)
    if TT != T:
        xg = jnp.pad(xg, ((0, 0), (0, TT - T), (0, 0)))
    TO = tile_o or (256 if out % 256 == 0 else 128)
    KG = max(1, tile_k // gs)
    while groups % KG:
        KG -= 1
    nk = groups // KG
    grid = (1, out // TO, nk)
    res = pl.pallas_call(
        functools.partial(_qmm_v1_kernel, out_dtype=x.dtype, nk=nk, bits=bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((KG, TT, gs), lambda t, o, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KG, gsp, TO), lambda t, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KG, 1, TO), lambda t, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, TO), lambda t, o, k: (t, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TT, out), x.dtype),
        scratch_shapes=[pltpu.VMEM((TT, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xg, data, scale)
    return res[:T]


# --------------------------- v2: shift-free int4 ---------------------------
#
# Mosaic rejects shifts on int8 vectors and int32 widening costs 4x the
# registers. Shift-free nibble split in pure int8 ops:
#   low    = ((w & 15) ^ 8) - 8          (sign-extended low nibble)
#   high16 = w - (w & 15)                (= 16 * high nibble, sign-correct)
# and the /16 folds into the scale of the high half's partial sum.

def _qmm_v2i4_kernel(xl_ref, xh_ref, w_ref, s_ref, o_ref, acc_ref, *,
                     out_dtype, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic legalizes bitwise ops on int8 vectors but NOT add/sub/shift;
    # the subtractions run in bf16 (integers < 256 are exact in bf16).
    w = w_ref[...]  # (KG, gsp, TO) int8, nibble-packed
    low_u = w & jnp.int8(15)
    low = (low_u ^ jnp.int8(8)).astype(jnp.bfloat16) - jnp.bfloat16(8.0)
    high16 = w.astype(jnp.bfloat16) - low_u.astype(jnp.bfloat16)
    dn = (((2,), (1,)), ((0,), (0,)))
    p_lo = jax.lax.dot_general(xl_ref[...], low, dn,
                               preferred_element_type=jnp.float32)
    p_hi = jax.lax.dot_general(xh_ref[...], high16, dn,
                               preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.sum((p_lo + p_hi * (1.0 / 16.0)) * s_ref[...], axis=0)

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile_o", "tile_k"))
def qmm_v2i4(x, data, scale, tile_o=0, tile_k=2048):
    groups, gsp, out = data.shape  # packed: gsp = gs // 2
    gs = gsp * 2
    T = x.shape[0]
    TT = max(8, T)
    # Packing is split-half along the group axis: low nibbles multiply
    # x[g*gs : g*gs+gs/2], high nibbles x[g*gs+gs/2 : (g+1)*gs].
    xg = x.reshape(T, groups, 2, gsp)
    xl = xg[:, :, 0].swapaxes(0, 1)  # (G, T, gsp)
    xh = xg[:, :, 1].swapaxes(0, 1)
    if TT != T:
        xl = jnp.pad(xl, ((0, 0), (0, TT - T), (0, 0)))
        xh = jnp.pad(xh, ((0, 0), (0, TT - T), (0, 0)))
    TO = tile_o or (256 if out % 256 == 0 else 128)
    KG = max(1, tile_k // gs)
    while groups % KG:
        KG -= 1
    nk = groups // KG
    grid = (1, out // TO, nk)
    res = pl.pallas_call(
        functools.partial(_qmm_v2i4_kernel, out_dtype=x.dtype, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((KG, TT, gsp), lambda t, o, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KG, TT, gsp), lambda t, o, k: (k, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KG, gsp, TO), lambda t, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KG, 1, TO), lambda t, o, k: (k, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, TO), lambda t, o, k: (t, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TT, out), x.dtype),
        scratch_shapes=[pltpu.VMEM((TT, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xl, xh, data, scale)
    return res[:T]


# --------------------------- DMA roofline ----------------------------------

def _roof_kernel(w_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.sum(w_ref[...].astype(jnp.int32), axis=(0, 1))

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...]


@jax.jit
def roof_read(data):
    groups, gsp, out = data.shape
    KG = max(1, 16 // max(1, gsp // 128))
    while groups % KG:
        KG -= 1
    nk = groups // KG
    return pl.pallas_call(
        functools.partial(_roof_kernel, nk=nk),
        grid=(nk,),
        in_specs=[pl.BlockSpec((KG, gsp, out), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, out), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, out), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, out), jnp.int32)],
    )(data)


# --------------------------- timing ----------------------------------------

def timed(fn, *args, label="", weight_bytes=0.0):
    """fn(x, *rest) -> array. Serialized in-graph loop, slope timing."""
    x0, rest = args[0], args[1:]

    def make(n):
        @jax.jit
        def many(x, *a):
            def body(_, carry):
                x, acc = carry
                out = fn(x, *a)
                s = out[0, :8].astype(jnp.float32).sum()
                # Serialize: next x depends on this out (cheap scalar chain).
                return x + (s * 0).astype(x.dtype), acc + s

            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
            return acc

        return many

    many1, many2 = make(N1), make(N2)
    np.asarray(many1(x0, *rest))  # compile + drain
    np.asarray(many2(x0, *rest))

    def best(m):
        ts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            np.asarray(m(x0, *rest))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    dt = (best(many2) - best(many1)) / (N2 - N1)
    gbps = weight_bytes / dt / 1e9 if weight_bytes else 0.0
    print(f"{label:34s} {dt*1e6:9.1f} us  {gbps:7.1f} GB/s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--shapes", default="1024x3072,3072x1024,4096x12288")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")
    for shape_s in args.shapes.split(","):
        in_f, out_f = map(int, shape_s.split("x"))
        w = jax.random.normal(key, (in_f, out_f), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        q8 = quantize_weight(w, 8)
        q8_128 = quantize_weight(w, 8, 128)
        q4 = quantize_weight(w, 4, 128)
        print(f"\n=== {in_f} x {out_f} ===")
        print(f"  int8 bytes {q8.data.nbytes/1e6:.1f} MB  "
              f"scales {q8.scale.nbytes/1e6:.2f} MB (gs={q8.group_size}); "
              f"int4 {q4.data.nbytes/1e6:.1f} MB (gs=128)")
        timed(roof_read, q8.data,
              label="roof stream int8", weight_bytes=q8.data.nbytes)
        timed(roof_read, q4.data,
              label="roof stream int4(packed)", weight_bytes=q4.data.nbytes)
        for T in args.t:
            x = jax.random.normal(jax.random.fold_in(key, T), (T, in_f),
                                  jnp.bfloat16)
            print(f"-- T={T}")
            timed(lambda x_: jnp.dot(x_, wb,
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16),
                  x, label="bf16 jnp.dot", weight_bytes=wb.nbytes)
            timed(lambda x_: quant_matmul_pallas(x_, q8.data, q8.scale,
                                                 bits=8),
                  x, label="v0 int8 gs512", weight_bytes=q8.data.nbytes)
            timed(lambda x_: quant_matmul_pallas(x_, q4.data, q4.scale,
                                                 bits=4),
                  x, label="v0 int4 gs128", weight_bytes=q4.data.nbytes)
            timed(lambda x_: qmm_v1(x_, q8.data, q8.scale, bits=8),
                  x, label="v1 int8 gs512", weight_bytes=q8.data.nbytes)
            timed(lambda x_: qmm_v1(x_, q8_128.data, q8_128.scale, bits=8),
                  x, label="v1 int8 gs128", weight_bytes=q8_128.data.nbytes)
            timed(lambda x_: qmm_v1(x_, q4.data, q4.scale, bits=4),
                  x, label="v1 int4 gs128", weight_bytes=q4.data.nbytes)
            timed(lambda x_: qmm_v2i4(x_, q4.data, q4.scale),
                  x, label="v2 int4 noshift", weight_bytes=q4.data.nbytes)
            # Wide-TO "decode mode": one output tile -> x is read once.
            timed(lambda x_: qmm_v1(x_, q8.data, q8.scale, bits=8,
                                    tile_o=out_f, tile_k=1024),
                  x, label="v1w int8 TO=out", weight_bytes=q8.data.nbytes)
            timed(lambda x_: qmm_v2i4(x_, q4.data, q4.scale, tile_o=out_f,
                                      tile_k=1024),
                  x, label="v2w int4 TO=out", weight_bytes=q4.data.nbytes)
            c = qmm_v2i4(x, q4.data, q4.scale)
            d = quant_matmul_pallas(x, q4.data, q4.scale, bits=4)
            err4 = float(jnp.max(jnp.abs(c.astype(jnp.float32)
                                         - d.astype(jnp.float32))))
            print(f"   v2i4-vs-v0 max abs err {err4:.4g}")
            # numerics sanity: v1 must match v0 closely
            a = quant_matmul_pallas(x, q8.data, q8.scale, bits=8)
            b = qmm_v1(x, q8.data, q8.scale, bits=8)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
            scale_mag = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
            print(f"   v1-vs-v0 max abs err {err:.4g} (rel {err/scale_mag:.2e})")


if __name__ == "__main__":
    main()
