#!/usr/bin/env python
"""Isolated decode-attention kernel timing: bf16 vs int8 KV pages.

Slope method (see tools/profile_quant.py): run the kernel N1 and N2 times
inside one jitted fori_loop with a serializing dependence; the time
difference divided by (N2-N1) cancels tunnel dispatch latency.

  python tools/profile_attn.py [--batch 64] [--ctx 1100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N1, N2, TRIALS = 8, 72, 3


def timeit(fn, *args):
    import functools

    def loop(n_static, q, *rest):
        def body(i, carry):
            q = carry
            # Serialize via a REAL data dependence: adding o's first element
            # scaled by a tiny constant is not algebraically foldable (the
            # old `q + 0.0 * o.sum()` let XLA fold 0*x -> 0, hoist the
            # loop-invariant kernel out, and time an empty loop — measured
            # "bandwidths" above the HBM roofline).
            o = fn(q, *rest)
            eps = o.astype(jnp.float32)[:1, :1, :1] * 1e-30
            return q + eps.astype(q.dtype)

        return jax.lax.fori_loop(0, n_static, body, q)

    # All arrays travel as jit ARGUMENTS (closure constants would be baked
    # into the compile payload — 100+ MB of pages breaks the tunnel).
    l1 = jax.jit(functools.partial(loop, N1))
    l2 = jax.jit(functools.partial(loop, N2))
    np.asarray(l1(*args).sum())  # compile + warm
    np.asarray(l2(*args).sum())
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(l1(*args).sum())
        t1 = time.perf_counter()
        np.asarray(l2(*args).sum())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (N2 - N1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=1100)
    ap.add_argument("--hq", type=int, default=16)
    ap.add_argument("--dequant", default="fold",
                    choices=["fold", "s8"])
    ap.add_argument("--ppcb", type=int, default=8)
    ap.add_argument(
        "--cases", default="bf16,noscale,int8,stage",
        help="comma list: bf16,noscale,int8,stage",
    )
    args = ap.parse_args()
    cases = set(args.cases.split(","))

    from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode

    B, Hq, Hkv, D, BSZ = args.batch, args.hq, 8, 128, 64
    NB = -(-args.ctx // BSZ) + 1
    NBtot = B * NB
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    tables = jnp.asarray(np.arange(NBtot, dtype=np.int32).reshape(B, NB))
    ctx = jnp.full((B,), args.ctx, jnp.int32)
    scale = D**-0.5

    kp = jnp.asarray(rng.standard_normal((NBtot, Hkv, BSZ, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NBtot, Hkv, BSZ, D)), jnp.bfloat16)
    kv_bytes = 2 * B * args.ctx * Hkv * D * 2
    if "bf16" in cases:
        t_bf16 = timeit(
            lambda q_, kp_, vp_: paged_flash_decode(
                q_, kp_, vp_, tables, ctx, block_size=BSZ, scale=scale,
                ppcb=args.ppcb,
            ),
            q, kp, vp,
        )
        print(
            f"bf16:  {t_bf16*1e6:8.1f} us  ({kv_bytes/t_bf16/1e9:6.1f} GB/s eff)",
            flush=True,
        )

    kp8 = jnp.asarray(rng.integers(-127, 127, (NBtot, Hkv, BSZ, D)), jnp.int8)
    vp8 = jnp.asarray(rng.integers(-127, 127, (NBtot, Hkv, BSZ, D)), jnp.int8)
    # Ablation: int8 pages WITHOUT scales (cast-only) — isolates the cost of
    # the per-page scale DMA stream + the two dequant VPU passes.
    if "noscale" in cases:
        t_noscale = timeit(
            lambda q_, kp_, vp_: paged_flash_decode(
                q_, kp_, vp_, tables, ctx, block_size=BSZ, scale=scale,
                ppcb=args.ppcb,
            ),
            q, kp8, vp8,
        )
        print(
            f"int8-noscale: {t_noscale*1e6:8.1f} us "
            f"({(kv_bytes//2)/t_noscale/1e9:6.1f} GB/s eff)",
            flush=True,
        )
    # In-page scales (r3 layout): K pages carry trailing scale heads.
    from lightvllm_tpu.ops.kv_cache import (
        encode_page_scales,
        num_scale_heads,
        truncate_scale,
    )

    sck = truncate_scale(
        jnp.asarray(rng.standard_normal((NBtot, Hkv, D)) * 0.01 + 0.02,
                    jnp.float32)
    )
    scv = truncate_scale(
        jnp.asarray(rng.standard_normal((NBtot, Hkv, D)) * 0.01 + 0.02,
                    jnp.float32)
    )
    kp8s = jnp.concatenate(
        [kp8, encode_page_scales(sck, scv, BSZ)], axis=1
    )  # (NBtot, Hkv + Sh, BSZ, D)
    sh = num_scale_heads(Hkv, BSZ)
    kv_bytes8 = kv_bytes // 2 + B * NB * sh * BSZ * D
    if "int8" in cases:
        t_int8 = timeit(
            lambda q_, kp_, vp_: paged_flash_decode(
                q_, kp_, vp_, tables, ctx, sc_shards=1, block_size=BSZ,
                scale=scale, dequant_mode=args.dequant, ppcb=args.ppcb,
            ),
            q, kp8s, vp8,
        )
        print(
            f"int8:  {t_int8*1e6:8.1f} us  ({kv_bytes8/t_int8/1e9:6.1f} GB/s eff)",
            flush=True,
        )

    # Engine-path case: int8 + staged tail (the production decode step
    # inside the fused window always carries the W-row staging buffers) and
    # RANDOM page tables (the allocator interleaves pages across seqs).
    if "stage" not in cases:
        return
    W = int(os.environ.get("PROF_STAGE_W", 32))
    ks = jnp.asarray(rng.standard_normal((B, Hkv, W, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, Hkv, W, D)), jnp.bfloat16)
    stage_len = jnp.int32(W // 2)
    tables_rnd = jnp.asarray(
        rng.permutation(NBtot).reshape(B, NB).astype(np.int32)
    )
    t_stage = timeit(
        lambda q_, kp_, vp_, ks_, vs_: paged_flash_decode(
            q_, kp_, vp_, tables_rnd, ctx, ks_, vs_, stage_len,
            sc_shards=1, block_size=BSZ, scale=scale,
            dequant_mode=args.dequant, ppcb=args.ppcb,
        ),
        q, kp8s, vp8, ks, vs,
    )
    print(
        f"int8+stage(W={W},rnd tables): {t_stage*1e6:8.1f} us "
        f"({kv_bytes8/t_stage/1e9:6.1f} GB/s eff)",
        flush=True,
    )


if __name__ == "__main__":
    main()
