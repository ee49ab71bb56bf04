#!/usr/bin/env python
"""INT4 unpack-strategy shootout inside the fused dequant+matmul kernel.

r4 finding: at decode T=64 the production kernel is VPU-bound on the int4
unpack (int32 widen + two shifts + two converts per packed byte), running
the projections at ~360-450 GB/s vs the ~750 GB/s roofline — ~8.7 ms of
the 22.4 ms 8B step. Variants measured here:

  v0      production: int32 widen + shifts (ops/pallas/quant_matmul.py)
  vfloat  float-domain: f = conv(b) = 16h + u; h = floor(f/16);
          u = f - 16h; l = u - 16*(u >= 8). No int32 ops; one convert +
          ~6 f32 VPU ops per packed byte.
  vand    int8 bitwise AND mask + 2 converts + float reconstruct
          (needs Mosaic int8 `and` support; falls back loudly if not).
  vint8   int8 (gs=512) same shape — the no-unpack reference point.

Run: python tools/profile_unpack.py [--t 64]
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

from lightvllm_tpu.ops.pallas.quant_matmul import _plan_tiles, _pick_tile
from lightvllm_tpu.ops.quantization import quantize_weight, quantized_matmul

N1, N2, TRIALS = 8, 1024, 3


def make_kernel(unpack):
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        mm_dt = jnp.bfloat16
        wb = unpack(w_ref[...], mm_dt)
        xg = x_ref[...]
        partial = jax.lax.dot_general(
            xg.astype(mm_dt), wb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += jnp.sum(partial * s_ref[...], axis=0)

        @pl.when(k == nk - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def unpack_v0(w_i8, mm_dt):
    w32 = w_i8.astype(jnp.int32)
    low = (w32 << 28) >> 28
    high = w32 >> 4
    return jnp.concatenate([low, high], axis=1).astype(mm_dt)


def unpack_vfloat(w_i8, mm_dt):
    # b = 16h + u (u = low nibble unsigned [0,16)); all values are small
    # integers, exact in f32/bf16. floor/mod in float domain: no int32 ops.
    f = w_i8.astype(jnp.float32)
    h = jnp.floor(f * (1.0 / 16.0))
    u = f - 16.0 * h
    l = u - jnp.where(u >= 8.0, 16.0, 0.0)
    return jnp.concatenate([l, h], axis=1).astype(mm_dt)


def unpack_vand(w_i8, mm_dt):
    u = (w_i8 & 0x0F).astype(jnp.float32)  # low nibble unsigned [0,16)
    f = w_i8.astype(jnp.float32)  # 16h + u
    h = (f - u) * (1.0 / 16.0)
    l = u - jnp.where(u >= 8.0, 16.0, 0.0)
    return jnp.concatenate([l, h], axis=1).astype(mm_dt)


def unpack_voffs(w_i8, mm_dt):
    """Offset-binary low nibble (repacked data: (l+8) | (h<<4)): kills the
    sign-fixup compare/select — pure and/convert/sub/mul."""
    u = (w_i8 & 0x0F).astype(jnp.float32)  # l + 8
    f = w_i8.astype(jnp.float32)  # 16h + l + 8
    h = (f - u) * (1.0 / 16.0)
    l = u - 8.0
    return jnp.concatenate([l, h], axis=1).astype(mm_dt)


def unpack_vfold2(w_i8, mm_dt):
    """Concat-K fold (offset-low packing): W2 = [conv(b & 0xF); conv(b)]
    = [l + 8; 16h + l + 8]. With x transformed to [x_l - x_h/16; x_h/16]
    ONE K=gs dot yields dot(x_l, u) + dot(x_h, h); the -8*sum(x_l) bias is
    a rank-K_G outer-product correction applied OUTSIDE the kernel.
    Weight-side VPU: one AND + two int8->bf16 converts + concat — no
    shifts, no int32 widen, no sub/mul/select."""
    u = (w_i8 & 0x0F).astype(mm_dt)
    wf = w_i8.astype(mm_dt)
    return jnp.concatenate([u, wf], axis=1)


def xform_vfold2(xg):
    """(groups, Tp, gs) x -> ([x_l - x_h/16; x_h/16], corr=-8*sum(x_l))."""
    gsp = xg.shape[2] // 2
    xl = xg[:, :, :gsp].astype(jnp.float32)
    xh = xg[:, :, gsp:].astype(jnp.float32)
    x2 = jnp.concatenate([xl - xh * (1.0 / 16.0), xh * (1.0 / 16.0)],
                         axis=2).astype(xg.dtype)
    corr = -8.0 * jnp.sum(xl, axis=2)  # (groups, Tp)
    return x2, corr


def repack_offs(data):
    """split-half packed int8 -> offset-binary-low repack (for voffs)."""
    w32 = data.astype(jnp.int32)
    low = (w32 << 28) >> 28
    high = w32 >> 4
    return (((low + 8) & 0x0F) | ((high & 0x0F) << 4)).astype(jnp.int8)


def make_kernel_w8a8(unpack_to_i8):
    """W8A8-dynamic: per-(token, group) absmax int8 activation quant feeds
    the MXU s8 x s8 -> s32 (2x bf16 MXU throughput on v5e); the f32
    rescale folds the activation scale into the weight-group scale."""
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w8 = unpack_to_i8(w_ref[...])  # (KG, gs, TO) int8
        xg = x_ref[...].astype(jnp.float32)  # (KG, TT, gs)
        ax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
        sx = jnp.maximum(ax, 1e-30) / 127.0
        xq = jnp.round(xg / sx).astype(jnp.int8)
        partial = jax.lax.dot_general(
            xq, w8,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (KG, TT, TO) s32
        acc_ref[...] += jnp.sum(
            partial.astype(jnp.float32) * (sx * s_ref[...]), axis=0
        )

        @pl.when(k == nk - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def unpack_v0_i8(w_i8):
    w32 = w_i8.astype(jnp.int32)
    low = (w32 << 28) >> 28
    high = w32 >> 4
    return jnp.concatenate([low, high], axis=1).astype(jnp.int8)


def make_kernel_split(mode):
    """Split-dot variants on offset-binary packed data: never materialize
    the concatenated (gs, TO) tile — two K=gs/2 dots against the l and h
    planes instead (split-half packing pairs x[:gs/2] with low nibbles and
    x[gs/2:] with high nibbles).

    mode="vsplit": weight-side unpack = and + 2 converts + sub + sub/mul.
    mode="vfold":  weight-side unpack = and + 2 converts ONLY; the -8 bias
      and /16 scaling fold into the (tiny) x operand and a rank-1
      post-matmul correction:
        u  = conv(b & 0xF)            = l + 8
        wf = conv(b)                  = 16h + l + 8
        dot(x_l - x_h/16, u) + dot(x_h/16, wf) - 8*sum(x_l)
          = dot(x_l, l) + dot(x_h, h)
    """
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        mm_dt = jnp.bfloat16
        b = w_ref[...]  # (KG, gsp, TO) offset-binary packed
        gsp = b.shape[1]
        x = x_ref[...]  # (KG, TT, gs)
        x_l = x[:, :, :gsp].astype(jnp.float32)
        x_h = x[:, :, gsp:].astype(jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        if mode == "vsplit":
            u = (b & 0x0F).astype(mm_dt)
            wf = b.astype(jnp.float32)
            h = ((wf - u.astype(jnp.float32)) * (1.0 / 16.0)).astype(mm_dt)
            l = u - jnp.asarray(8.0, mm_dt)
            partial = jax.lax.dot_general(
                x_l.astype(mm_dt), l, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                x_h.astype(mm_dt), h, dn, preferred_element_type=jnp.float32
            )
        else:  # vfold
            u = (b & 0x0F).astype(mm_dt)
            wf = b.astype(mm_dt)
            xh16 = x_h * (1.0 / 16.0)
            xm = (x_l - xh16).astype(mm_dt)
            corr = 8.0 * jnp.sum(x_l, axis=2, keepdims=True)  # (KG, TT, 1)
            partial = (
                jax.lax.dot_general(
                    xm, u, dn, preferred_element_type=jnp.float32
                )
                + jax.lax.dot_general(
                    xh16.astype(mm_dt), wf, dn,
                    preferred_element_type=jnp.float32,
                )
                - corr
            )
        acc_ref[...] += jnp.sum(partial * s_ref[...], axis=0)

        @pl.when(k == nk - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def make_kernel_w4a8():
    """W4A8 with AND-only unpack on offset-low packing (b = (h<<4)|(l+8)):
      u8  = b & 0x0F  -> l + 8   (int8, [0,16))
      h16 = b & 0xF0  -> 16*h    (int8, exact two's complement)
    No shifts, no int8 add/sub, no concat. Two s8 x s8 -> s32 dots (K=gs/2
    each, batched over KG); the -8 bias and /16 fold into f32 post ops.
    """
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        b = w_ref[...]  # (KG, gsp, TO) offset-low packed
        gsp = b.shape[1]
        u8 = b & 0x0F
        h16 = b & jnp.asarray(0xF0 - 256, jnp.int8)  # 0xF0 as signed int8
        xg = x_ref[...].astype(jnp.float32)  # (KG, TT, gs)
        ax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
        sx = jnp.maximum(ax, 1e-30) / 127.0
        xq = jnp.round(xg / sx).astype(jnp.int8)
        dn = (((2,), (1,)), ((0,), (0,)))
        xq_l = xq[:, :, :gsp]
        p_l = jax.lax.dot_general(
            xq_l, u8, dn, preferred_element_type=jnp.int32
        )
        p_h = jax.lax.dot_general(
            xq[:, :, gsp:], h16, dn, preferred_element_type=jnp.int32
        )
        corr = 8.0 * jnp.sum(
            xq_l.astype(jnp.float32), axis=2, keepdims=True
        )  # exact: |sum| < 2^17
        partial = (
            p_l.astype(jnp.float32) - corr
            + p_h.astype(jnp.float32) * (1.0 / 16.0)
        )
        acc_ref[...] += jnp.sum(partial * (sx * s_ref[...]), axis=0)

        @pl.when(k == nk - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def make_kernel_w8a8_offs():
    """W8A8 on offset-binary data with int8-native unpack: and + int8 subs,
    no int32 widening, no concat; two s8 x s8 -> s32 dots (K=gs/2). The /16
    on the high plane (stored as 16h) folds into its rescale factor."""
    def kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, out_dtype, nk):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        b = w_ref[...]  # (KG, gsp, TO) offset packed
        gsp = b.shape[1]
        u8 = b & 0x0F  # l + 8, int8 in [0, 16)
        l8 = u8 - jnp.asarray(8, jnp.int8)  # int8 sub
        h16 = b - u8  # 16h, int8 (exact, in [-128, 112])
        xg = x_ref[...].astype(jnp.float32)  # (KG, TT, gs)
        ax = jnp.max(jnp.abs(xg), axis=2, keepdims=True)
        sx = jnp.maximum(ax, 1e-30) / 127.0
        xq = jnp.round(xg / sx).astype(jnp.int8)
        dn = (((2,), (1,)), ((0,), (0,)))
        p_l = jax.lax.dot_general(
            xq[:, :, :gsp], l8, dn, preferred_element_type=jnp.int32
        )
        p_h = jax.lax.dot_general(
            xq[:, :, gsp:], h16, dn, preferred_element_type=jnp.int32
        )
        partial = p_l.astype(jnp.float32) + p_h.astype(jnp.float32) * (
            1.0 / 16.0
        )
        acc_ref[...] += jnp.sum(partial * (sx * s_ref[...]), axis=0)

        @pl.when(k == nk - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def run_variant(name, unpack, x, data, scale, bits=4, tile_o=0, ref_data=None):
    groups, gsp, out = data.shape
    gs = gsp * 2 if bits == 4 else gsp
    in_f = groups * gs
    T = x.shape[0]
    TT = _pick_tile(-(-T // 8) * 8, 256)
    Tp = -(-T // TT) * TT
    xg = x.reshape(T, groups, gs).swapaxes(0, 1)
    TO, KG = _plan_tiles(Tp, TT, groups, gsp, out, tile_o, 2048, gs)
    nk = groups // KG

    if name == "w4a8":
        kernel_fn = make_kernel_w4a8()
    elif name == "w8a8_offs":
        kernel_fn = make_kernel_w8a8_offs()
    elif name.startswith("w8a8"):
        kernel_fn = make_kernel_w8a8(unpack)
    elif name in ("vsplit", "vfold"):
        kernel_fn = make_kernel_split(name)
    else:
        kernel_fn = make_kernel(unpack)

    @jax.jit
    def f(xg, data, scale):
        corr = None
        if name == "vfold2":
            xg, corr = xform_vfold2(xg)
        out = _call(xg, data, scale)
        if corr is not None:
            # -8*sum(x_l) bias: rank-groups outer product vs the scales,
            # applied outside the kernel (an O(T*groups*Out) XLA dot —
            # negligible next to the weight stream).
            out = out + jnp.einsum(
                "gt,go->to", corr, scale[:, 0, :]
            ).astype(out.dtype)
        return out

    def _call(xg, data, scale):
        return pl.pallas_call(
            functools.partial(kernel_fn, out_dtype=jnp.bfloat16, nk=nk),
            grid=(Tp // TT, out // TO, nk),
            in_specs=[
                pl.BlockSpec((KG, TT, gs), lambda t, o, k: (k, t, 0)),
                pl.BlockSpec((KG, gsp, TO), lambda t, o, k: (k, 0, o)),
                pl.BlockSpec((KG, 1, TO), lambda t, o, k: (k, 0, o)),
            ],
            out_specs=pl.BlockSpec((TT, TO), lambda t, o, k: (t, o)),
            out_shape=jax.ShapeDtypeStruct((Tp, out), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((TT, TO), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xg, data, scale)

    def loop(n, xg, data, scale):
        def body(i, xg):
            o = f(xg + 0.0 * i, data, scale)
            return xg + 0.0 * o.astype(xg.dtype)[:1, :1].sum()
        return jax.lax.fori_loop(0, n, body, xg)

    l1 = jax.jit(functools.partial(loop, N1))
    l2 = jax.jit(functools.partial(loop, N2))
    try:
        np.asarray(l1(xg, data, scale).sum())
        np.asarray(l2(xg, data, scale).sum())
    except Exception as e:
        print(f"  {name:8s} FAILED: {str(e)[:140]}")
        return None
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter(); np.asarray(l1(xg, data, scale).sum())
        t1 = time.perf_counter(); np.asarray(l2(xg, data, scale).sum())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (N2 - N1))
    wbytes = data.nbytes + scale.nbytes
    print(f"  {name:14s} TO={TO:<6d} {best*1e6:7.1f} us  "
          f"({wbytes/best/1e9:6.1f} GB/s)")
    # numerics vs oracle (on the ORIGINAL packing for repacked variants the
    # caller passes a matching oracle x/data pair)
    from lightvllm_tpu.ops.quantization import QuantizedTensor
    rd = data if ref_data is None else ref_data
    if True:
        ref = quantized_matmul(x, QuantizedTensor(data=rd, scale=scale, bits=bits))
        got = f(xg, data, scale)[:T]
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        denom = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        # w8a8 quantizes activations too: report, don't flag, its rel err.
        if name.startswith("w8a8"):
            print(f"           w8a8 rel err vs w-only oracle {err/denom:.3g}")
        elif err / denom > 2e-2:
            print(f"           NUMERICS MISMATCH rel {err/denom:.3g}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--shapes", default="4096x24576,12288x4096")
    ap.add_argument("--variants", default="v0,vand,voffs")
    ap.add_argument("--tile-o", type=int, nargs="+", default=[0, 2048, 4096])
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    fns = {"v0": unpack_v0, "vfloat": unpack_vfloat, "vand": unpack_vand,
           "voffs": unpack_voffs, "w8a8": unpack_v0_i8,
           "vsplit": None, "vfold": None, "w8a8_offs": None, "w4a8": None,
           "vfold2": unpack_vfold2}
    for s in args.shapes.split(","):
        in_f, out_f = map(int, s.split("x"))
        w = jax.random.normal(key, (in_f, out_f), jnp.float32) * 0.02
        q4 = quantize_weight(w, 4, 128)
        d_offs = repack_offs(q4.data)
        x = jax.random.normal(key, (args.t, in_f), jnp.bfloat16)
        print(f"=== {in_f}x{out_f} T={args.t} int4 gs128 ===", flush=True)
        offs_variants = ("voffs", "vsplit", "vfold", "w8a8_offs", "w4a8",
                         "vfold2")
        for to in args.tile_o:
            for v in args.variants.split(","):
                data = d_offs if v in offs_variants else q4.data
                run_variant(v, fns[v], x, data, q4.scale, tile_o=to,
                            ref_data=q4.data if v in offs_variants else None)


if __name__ == "__main__":
    main()
