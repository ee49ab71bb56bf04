#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE: >=85% scaling 1 chip -> 2 hosts).

Only one real chip exists in this environment, so scaling is PROJECTED, not
measured: the tool lowers the real shard_map decode step over virtual tp
meshes (tp in {1,2,4,8,16}), censuses the per-step collectives exactly from
the lowered StableHLO (shard_map places every psum/all_gather manually, so
the lowering IS the collective schedule — nothing is inserted later by the
compiler), and combines that census with (a) the measured single-chip step
time and (b) an explicit ICI/DCN cost model into projected tok/s/chip and
scaling efficiency per tp.

Decode is bandwidth-bound, so per-chip compute time scales ~1/tp (weights,
KV pages, and the LM head all shard on "model"); the scaling loss is the
serial collective time. The projection assumes ZERO collective/compute
overlap — the r3 overlap study (artifacts/overlap_study_r3.md) measured
that XLA emits no async collective pairs on this path, so this is the
honest (pessimistic) model.

Cost model (documented so the artifact is re-derivable):
  - all_reduce (psum): ring, time = 2*S*(tp-1)/tp / ICI_BW + LAT per hop
  - all_gather:        ring, time =   S_out*(tp-1)/tp / ICI_BW + LAT
  - ICI_BW: v5e one-way per-link 45 GB/s x 2 links usable on a 2D torus
    ring = 90 GB/s per chip (jax-ml scaling-book v5e numbers).
  - 2-host v5e-16 deployment is tp=8 intra-host x dp=2 across DCN: decode
    has NO cross-host collectives (each host serves its own batch with a
    full weight replica sharded tp=8), so host-scaling efficiency is the
    dp imbalance only. tp=16 across DCN is also projected for contrast.

Usage (CPU, no TPU needed):
  python tools/scaling_study.py [--model 8b|32b] [--batch 64] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_TP = 16

if not os.environ.get("RUN_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={MAX_TP}"
        ).strip()

import dataclasses

import jax

if not os.environ.get("RUN_ON_TPU"):
    # The environment's sitecustomize force-sets jax_platforms to the axon
    # tunnel; override AFTER import like tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lightvllm_tpu.models import qwen3
from lightvllm_tpu.ops.kv_cache import KVCache, num_scale_heads
from lightvllm_tpu.ops.quantization import QuantizedTensor
from lightvllm_tpu.ops.sampling import sample, sample_sharded
from lightvllm_tpu.parallel.sharding import kv_cache_specs, param_specs
from lightvllm_tpu.utils.metadata import DecodeMeta

ARCHS = {
    # Qwen3 family (HF configs); 32b is BASELINE row 6.
    "8b": dict(num_layers=36, hidden_size=4096, num_q_heads=32,
               num_kv_heads=8, intermediate_size=12288, tie=False),
    "32b": dict(num_layers=64, hidden_size=5120, num_q_heads=64,
                num_kv_heads=8, intermediate_size=25600, tie=False),
}

# --- cost model constants (v5e) -------------------------------------------
ICI_BW = 90e9          # bytes/s per chip on a 2D-torus bidirectional ring
ICI_LAT = 1e-6         # per-collective launch/hop latency (s)
DCN_BW = 12.5e9        # ~100 Gbit/s per host
HBM_BW_EFF = 0.75e12   # measured repo roofline (~750 GB/s of 819 peak)


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def abstract_params(spec: qwen3.ModelSpec, group_size: int = 128) -> dict:
    """Abstract (ShapeDtypeStruct) int4 weight tree + int8 LM head, matching
    what ModelRunner serves at the north-star config (fused projections,
    vocab-padded quantized head)."""
    E, D, L = spec.hidden_size, spec.head_dim, spec.num_layers
    Hq, Hkv, I = spec.num_q_heads, spec.num_kv_heads, spec.intermediate_size
    dt = spec.jnp_dtype

    def qt4(in_f, out_f):
        g = in_f // group_size
        return QuantizedTensor(
            data=sds((g, group_size // 2, out_f), jnp.int8),
            scale=sds((g, 1, out_f), jnp.float32),
            bits=4,
        )

    def layered(make):
        return tuple(make() for _ in range(L))

    qkv_out = (Hq + 2 * Hkv) * D
    Vp = -(-spec.vocab_size // 2048) * 2048
    return {
        "embed": sds((spec.vocab_size, E), dt),
        "layers": {
            "input_ln": layered(lambda: sds((E,), dt)),
            "wqkv": layered(lambda: qt4(E, qkv_out)),
            "q_norm": layered(lambda: sds((D,), dt)),
            "k_norm": layered(lambda: sds((D,), dt)),
            "wo": layered(lambda: qt4(Hq * D, E)),
            "post_ln": layered(lambda: sds((E,), dt)),
            "w_gate_up": layered(lambda: qt4(E, 2 * I)),
            "w_down": layered(lambda: qt4(I, E)),
        },
        "final_ln": sds((E,), dt),
        # int8 per-channel head, vocab end-padded to a 2048 multiple.
        "lm_head": QuantizedTensor(
            data=sds((1, E, Vp), jnp.int8),
            scale=sds((1, 1, Vp), jnp.float32),
            bits=8,
        ),
    }


def abstract_cache(spec, tp, num_blocks, block_size=64):
    hl = spec.num_kv_heads // tp
    k_heads = tp * (hl + num_scale_heads(hl, block_size))
    k = tuple(
        sds((num_blocks, k_heads, block_size, spec.head_dim), jnp.int8)
        for _ in range(spec.num_layers)
    )
    v = tuple(
        sds((num_blocks, spec.num_kv_heads, block_size, spec.head_dim), jnp.int8)
        for _ in range(spec.num_layers)
    )
    return KVCache(k=k, v=v, sc_shards=tp)


TENSOR_RE = re.compile(r"tensor<([0-9x]*)x?(f32|f16|bf16|i32|i8|ui32|i64|f64)>")
OP_RE = re.compile(
    r"stablehlo\.(all_reduce|all_gather|reduce_scatter|collective_permute|"
    r"all_to_all)\b"
)

DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "i32": 4, "ui32": 4, "i8": 1,
               "i64": 8, "f64": 8}


def census_collectives(stablehlo_text: str) -> list[dict]:
    """Every collective op in the lowered module with its result bytes.

    all_reduce/reduce_scatter carry a multi-line reducer region, so the
    result type is NOT on the op's first line (the only tensor<> there is
    the replica_groups attribute). Scan forward from each op to the first
    `-> tensor<...>` and take that as the result."""
    lines = stablehlo_text.splitlines()
    out = []
    for i, line in enumerate(lines):
        m = OP_RE.search(line)
        if not m:
            continue
        kind = m.group(1)
        for j in range(i, min(i + 40, len(lines))):
            if "->" not in lines[j]:
                continue
            types = TENSOR_RE.findall(lines[j].split("->", 1)[1])
            if not types:
                continue
            dims, dt = types[0]
            shape = [int(d) for d in dims.split("x") if d] if dims else []
            nbytes = int(np.prod(shape or [1])) * DTYPE_BYTES[dt]
            out.append(
                {"kind": kind, "shape": shape, "dtype": dt, "bytes": nbytes}
            )
            break
    return out


def lower_decode(spec, tp, B, window, ctx_blocks=32, block_size=64,
                 sharded_sample=True):
    """Lower the shard_map fused-window decode step abstractly; returns the
    StableHLO text. Mirrors ModelRunner's shard_map decode body (staged KV
    would only change the flush, which has no collectives; the scatter path
    keeps the graph small for lowering). sharded_sample mirrors the
    production temperature/greedy path (ops.sampling.sample_sharded — no
    logits all_gather); False lowers the extended-mode gather path."""
    devices = np.array(jax.devices()[:tp])
    mesh = Mesh(devices.reshape(tp), ("model",))
    spec_local = dataclasses.replace(
        spec,
        num_q_heads=spec.num_q_heads // tp,
        num_kv_heads=spec.num_kv_heads // tp,
        intermediate_size=spec.intermediate_size // tp,
        tp_shards=1,
    )
    params = abstract_params(spec)
    cache = abstract_cache(spec, tp, ctx_blocks * B, block_size)
    pspecs = param_specs(params)
    _cs = kv_cache_specs()
    cspecs = KVCache(k=_cs["k"], v=_cs["v"], sc_shards=tp)

    def local_body(p, t, m, c, k):
        c = KVCache(k=c.k, v=c.v, sc_shards=1)

        def step(carry, s):
            tokens, cache_c = carry
            stepmeta = DecodeMeta(
                positions=m.positions + s, ctx_lens=m.ctx_lens + s,
                block_tables=m.block_tables, temperatures=m.temperatures,
                top_ks=m.top_ks, top_ps=m.top_ps, seeds=m.seeds,
            )
            logits, cache_c = qwen3.forward_decode(
                p, spec_local, tokens, stepmeta, cache_c, block_size,
                attn_impl="jnp", tp_axis="model",
                gather_logits=not sharded_sample,
            )
            if sharded_sample:
                nxt = sample_sharded(
                    logits, m.temperatures, jax.random.fold_in(k, s),
                    "model", spec.vocab_size,
                )
            else:
                nxt = sample(logits, m.temperatures, jax.random.fold_in(k, s))
            return (nxt, cache_c), nxt

        (last, c), toks = jax.lax.scan(
            step, (t, c), jnp.arange(window, dtype=jnp.int32)
        )
        return (toks, last), KVCache(k=c.k, v=c.v, sc_shards=tp)

    meta = DecodeMeta(
        positions=sds((B,), jnp.int32), ctx_lens=sds((B,), jnp.int32),
        block_tables=sds((B, ctx_blocks), jnp.int32),
        temperatures=sds((B,), jnp.float32), top_ks=sds((B,), jnp.int32),
        top_ps=sds((B,), jnp.float32), seeds=sds((B,), jnp.int32),
    )
    body = shard_map(
        local_body, mesh=mesh,
        in_specs=(pspecs, P(), P(), cspecs, P()),
        out_specs=((P(), P()), cspecs),
        check_vma=False,
    )
    lowered = jax.jit(body, donate_argnums=(3,)).lower(
        params, sds((B,), jnp.int32), meta, cache, sds((2,), jnp.uint32)
    )
    return lowered.as_text()


def traffic_bytes(spec, B, avg_ctx, group_size=128, block_size=64):
    """Per-chip-equivalent HBM bytes per decode step at tp=1 (weights +
    scales + int8 head + int8 KV pages actually read)."""
    E, D, L = spec.hidden_size, spec.head_dim, spec.num_layers
    Hq, Hkv, I = spec.num_q_heads, spec.num_kv_heads, spec.intermediate_size
    qkv_out = (Hq + 2 * Hkv) * D

    def qt4_bytes(in_f, out_f):
        g = in_f // group_size
        return g * (group_size // 2) * out_f + g * out_f * 4

    w = L * (qt4_bytes(E, qkv_out) + qt4_bytes(Hq * D, E)
             + qt4_bytes(E, 2 * I) + qt4_bytes(I, E))
    Vp = -(-spec.vocab_size // 2048) * 2048
    head = E * Vp + Vp * 4
    # int8 KV: whole pages are read (page-granular DMAs).
    pages = -(-avg_ctx // block_size)
    hl = Hkv
    k_heads = hl + num_scale_heads(hl, block_size)
    kv = B * pages * L * block_size * D * (k_heads + Hkv)
    return {"weights": w, "head": head, "kv": kv, "total": w + head + kv}


def project(census, t1_step_s, tp, ici_bw=ICI_BW):
    """Projected per-step time and efficiency at tp from the tp=1 measured
    step time, assuming bandwidth-bound compute (time/tp) + serial
    collectives (zero overlap)."""
    coll = 0.0
    for c in census:
        if c["kind"] == "all_reduce":
            coll += 2 * c["bytes"] * (tp - 1) / tp / ici_bw + ICI_LAT
        elif c["kind"] in ("all_gather",):
            coll += c["bytes"] * (tp - 1) / tp / ici_bw + ICI_LAT
        elif c["kind"] == "reduce_scatter":
            coll += c["bytes"] * (tp - 1) / tp / ici_bw + ICI_LAT
        elif c["kind"] == "collective_permute":
            coll += c["bytes"] / ici_bw + ICI_LAT
    t_tp = t1_step_s / tp + coll
    eff = t1_step_s / (tp * t_tp)
    return t_tp, coll, eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=list(ARCHS))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--t1-step-ms", type=float, default=None,
                    help="measured single-chip per-step ms (bench); default "
                    "derives from the traffic model at the HBM roofline")
    ap.add_argument("--avg-ctx", type=int, default=800)
    ap.add_argument("--layers", type=int, default=None,
                    help="override layer count for lowering speed; the "
                    "census is scaled back to the full depth")
    ap.add_argument("--sampler", default="sharded",
                    choices=("sharded", "gather"),
                    help="'sharded' is the production temperature/greedy "
                    "path; 'gather' is the extended-mode (top-k/p/seeded) "
                    "logits all_gather path")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    a = ARCHS[args.model]
    spec_full = qwen3.ModelSpec(
        num_layers=a["num_layers"], hidden_size=a["hidden_size"],
        num_q_heads=a["num_q_heads"], num_kv_heads=a["num_kv_heads"],
        head_dim=128, intermediate_size=a["intermediate_size"],
        vocab_size=151936, rope_theta=1e6, rms_eps=1e-6,
        tie_word_embeddings=a["tie"], dtype="bfloat16",
    )
    L_lower = args.layers or min(4, a["num_layers"])
    spec_lower = dataclasses.replace(spec_full, num_layers=L_lower)

    traffic = traffic_bytes(spec_full, args.batch, args.avg_ctx)
    t1 = (args.t1_step_ms or traffic["total"] / HBM_BW_EFF * 1e3) / 1e3

    results = {
        "model": args.model, "sampler": args.sampler, "batch": args.batch,
        "window_lowered": args.window, "layers_lowered": L_lower,
        "avg_ctx": args.avg_ctx,
        "t1_step_ms": round(t1 * 1e3, 3),
        "t1_source": "measured" if args.t1_step_ms else "roofline-model",
        "per_step_hbm_bytes": traffic,
        "cost_model": {
            "ici_bw_Bps": ICI_BW, "ici_lat_s": ICI_LAT,
            "dcn_bw_Bps": DCN_BW, "hbm_bw_eff_Bps": HBM_BW_EFF,
            "overlap": "none (r3 overlap study: XLA emits sync collectives)",
        },
        "tp": {},
    }
    for tp in (1, 2, 4, 8, 16):
        if spec_full.num_kv_heads % tp or len(jax.devices()) < tp:
            continue
        # The scan body is traced once, so collective COUNTS in the lowered
        # text are already per-step. Lower at two depths and classify by the
        # exact delta: per-layer count = (count_L2 - count_L1) / (L2 - L1);
        # fixed = count_L1 - L1 * per_layer. No shape heuristics.
        depths = (max(1, L_lower // 2), L_lower)
        counts = []
        for Ld in depths:
            text = lower_decode(
                dataclasses.replace(spec_full, num_layers=Ld),
                tp, args.batch, args.window,
                sharded_sample=args.sampler == "sharded",
            )
            by_key: dict = {}
            for c in census_collectives(text):
                key = (c["kind"], tuple(c["shape"]), c["dtype"])
                by_key[key] = by_key.get(key, 0) + 1
            counts.append(by_key)
        dL = depths[1] - depths[0]
        scaled = []
        for key in sorted(set(counts[0]) | set(counts[1]), key=str):
            kind, shape, dt = key
            n1, n2 = counts[0].get(key, 0), counts[1].get(key, 0)
            per_layer = (n2 - n1) / dL
            fixed = n1 - depths[0] * per_layer
            full = fixed + spec_full.num_layers * per_layer
            nbytes = int(np.prod(shape or [1])) * DTYPE_BYTES[dt]
            scaled.append({
                "kind": kind, "shape": list(shape), "dtype": dt,
                "bytes": nbytes, "count_per_step": round(full, 2),
            })
        flat = []
        for c in scaled:
            flat.extend([c] * int(round(c["count_per_step"])))
        t_tp, coll, eff = project(flat, t1, tp)
        # 2D-torus scenario: an 8-chip v5e slice is a 2x4 torus, so large
        # all-reduces can ride both torus dimensions (~2x ring bandwidth).
        t2, coll2, eff2 = project(flat, t1, tp, ici_bw=2 * ICI_BW)
        results["tp"][tp] = {
            "collectives_per_step": scaled,
            "collective_bytes_per_step": int(sum(
                c["bytes"] * c["count_per_step"] for c in scaled
            )),
            "collective_time_ms": round(coll * 1e3, 3),
            "projected_step_ms": round(t_tp * 1e3, 3),
            "projected_tok_s_per_chip": round(args.batch / t_tp / tp, 1),
            "scaling_efficiency_vs_tp1": round(eff, 4),
            "scaling_efficiency_2d_torus": round(eff2, 4),
        }
    # 2-host deployment: tp=8 intra-host x dp=2 over DCN — decode crosses
    # DCN only for request distribution (no collectives), so the projected
    # host-scaling efficiency equals the dp load balance (1.0 for the
    # symmetric bench batch).
    if 8 in results["tp"]:
        results["two_host_v5e16"] = {
            "layout": "tp=8 (ICI, intra-host) x dp=2 (DCN, across hosts)",
            "decode_cross_host_collectives": 0,
            "projected_scaling_efficiency_1chip_to_2hosts":
                results["tp"][8]["scaling_efficiency_vs_tp1"],
            "projected_scaling_efficiency_2d_torus":
                results["tp"][8]["scaling_efficiency_2d_torus"],
            "note": "dp adds no collective cost; efficiency is the tp=8 "
                    "intra-host number (symmetric batch => perfect dp "
                    "balance). BASELINE target >= 0.85.",
        }
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
