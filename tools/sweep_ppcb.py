#!/usr/bin/env python
"""Sweep pages-per-chunk (ppcb) for the decode-attention kernel, bf16 and
int8-inpage-scale KV, at the VERDICT comparison point (b64, ctx 1100).
Slope-timed like tools/profile_attn.py."""

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

N1, N2, TRIALS = 8, 72, 3


def timeit(fn, *args):
    def loop(n_static, q, *rest):
        def body(i, acc):
            out = fn(acc, *rest)
            return acc + 0 * out[:, :1, :1].astype(acc.dtype)

        return jax.lax.fori_loop(0, n_static, body, q)

    j1 = jax.jit(functools.partial(loop, N1))
    j2 = jax.jit(functools.partial(loop, N2))
    jax.block_until_ready(j1(*args))
    jax.block_until_ready(j2(*args))
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        jax.block_until_ready(j1(*args))
        t1 = time.perf_counter()
        jax.block_until_ready(j2(*args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (N2 - N1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=1100)
    ap.add_argument("--ppcbs", default="6,8,9,12,18")
    args = ap.parse_args()

    from lightvllm_tpu.ops.kv_cache import (
        encode_page_scales,
        truncate_scale,
    )
    from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode

    B, Hq, Hkv, D, BSZ = args.batch, 16, 8, 128, 64
    NB = -(-args.ctx // BSZ) + 1
    NBtot = B * NB
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    tables = jnp.asarray(np.arange(NBtot, dtype=np.int32).reshape(B, NB))
    ctx = jnp.full((B,), args.ctx, jnp.int32)
    scale = D**-0.5

    kp = jnp.asarray(rng.standard_normal((NBtot, Hkv, BSZ, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((NBtot, Hkv, BSZ, D)), jnp.bfloat16)
    kp8 = jnp.asarray(rng.integers(-127, 127, (NBtot, Hkv, BSZ, D)), jnp.int8)
    vp8 = jnp.asarray(rng.integers(-127, 127, (NBtot, Hkv, BSZ, D)), jnp.int8)
    sck = truncate_scale(
        jnp.asarray(rng.standard_normal((NBtot, Hkv, D)) * 0.01 + 0.02, jnp.float32)
    )
    scv = truncate_scale(
        jnp.asarray(rng.standard_normal((NBtot, Hkv, D)) * 0.01 + 0.02, jnp.float32)
    )
    kp8s = jnp.concatenate([kp8, encode_page_scales(sck, scv, BSZ)], axis=1)

    kv_bytes = 2 * B * args.ctx * Hkv * D * 2
    print(f"NB={NB} pages/seq", flush=True)
    for ppcb in [int(x) for x in args.ppcbs.split(",")]:
        t_bf = timeit(
            lambda q_, kp_, vp_: paged_flash_decode(
                q_, kp_, vp_, tables, ctx, block_size=BSZ, scale=scale,
                ppcb=ppcb,
            ),
            q, kp, vp,
        )
        t_i8 = timeit(
            lambda q_, kp_, vp_: paged_flash_decode(
                q_, kp_, vp_, tables, ctx, sc_shards=1, block_size=BSZ,
                scale=scale, ppcb=ppcb,
            ),
            q, kp8s, vp8,
        )
        print(
            f"ppcb={ppcb:3d}: bf16 {t_bf*1e6:7.1f} us ({kv_bytes/t_bf/1e9:5.1f} GB/s)"
            f"  int8 {t_i8*1e6:7.1f} us  int8/bf16 {t_bf/t_i8:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
