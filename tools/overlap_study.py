#!/usr/bin/env python
"""Collective/compute overlap study for tensor-parallel decode (VERDICT r2
next#4): does XLA overlap the per-layer all-reduces with independent
compute, and does manual collective placement (tp_mode="shard_map") change
anything?

Method: AOT-compile ONE decode step (8B layer dims, 2 layers, bf16, tp=8)
against a v5e-8 TPU topology description — no real 8-chip slice needed —
under (a) GSPMD sharding annotations and (b) shard_map manual collectives.
The optimized TPU HLO is then scanned for async collective start/done
pairs and the quantity of compute scheduled between them (the overlap the
scheduler actually achieved).

  python tools/overlap_study.py [--layers 2] [--out artifacts/...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--lhs", action="store_true",
        help="compile with the latency-hiding scheduler (async collectives)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.ops.kv_cache import KVCache
    from lightvllm_tpu.ops.sampling import sample
    from lightvllm_tpu.parallel.sharding import kv_cache_specs, param_specs
    from lightvllm_tpu.utils.metadata import DecodeMeta

    topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    tp = len(topo.devices)
    mesh = Mesh(np.array(topo.devices).reshape(1, tp), ("data", "model"))

    L = args.layers
    spec = qwen3.ModelSpec(
        num_layers=L, hidden_size=4096, num_q_heads=32, num_kv_heads=8,
        head_dim=128, intermediate_size=12288, vocab_size=151936,
        rope_theta=1e6, rms_eps=1e-6, tie_word_embeddings=False,
        dtype="bfloat16", tp_shards=tp,
    )
    E, D = spec.hidden_size, spec.head_dim
    Hq, Hkv, I = spec.num_q_heads, spec.num_kv_heads, spec.intermediate_size
    dt = jnp.bfloat16
    B, BS, NB = 32, 64, 18

    def lay(shape):
        return tuple(jax.ShapeDtypeStruct(shape, dt) for _ in range(L))

    params = {
        "embed": jax.ShapeDtypeStruct((spec.vocab_size, E), dt),
        "layers": {
            "input_ln": lay((E,)),
            "wqkv": lay((E, (Hq + 2 * Hkv) * D)),
            "q_norm": lay((D,)),
            "k_norm": lay((D,)),
            "wo": lay((Hq * D, E)),
            "post_ln": lay((E,)),
            "w_gate_up": lay((E, 2 * I)),
            "w_down": lay((I, E)),
        },
        "final_ln": jax.ShapeDtypeStruct((E,), dt),
        "lm_head": jax.ShapeDtypeStruct((E, spec.vocab_size), dt),
    }
    pspecs = param_specs(params)
    cs = kv_cache_specs()

    def shard(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(mesh, s)
            ),
            tree,
            specs,
            is_leaf=lambda x: x is None or isinstance(x, jax.ShapeDtypeStruct),
        )

    params_sh = shard(params, pspecs)
    cache = KVCache(
        k=tuple(jax.ShapeDtypeStruct((128, Hkv, BS, D), dt) for _ in range(L)),
        v=tuple(jax.ShapeDtypeStruct((128, Hkv, BS, D), dt) for _ in range(L)),
    )
    cache_sh = KVCache(
        k=tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=NamedSharding(mesh, cs["k"]))
            for x in cache.k
        ),
        v=tuple(
            jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=NamedSharding(mesh, cs["v"]))
            for x in cache.v
        ),
    )

    def repl(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=NamedSharding(mesh, P()))

    meta = DecodeMeta(
        positions=repl(jax.ShapeDtypeStruct((B,), jnp.int32)),
        ctx_lens=repl(jax.ShapeDtypeStruct((B,), jnp.int32)),
        block_tables=repl(jax.ShapeDtypeStruct((B, NB), jnp.int32)),
        temperatures=repl(jax.ShapeDtypeStruct((B,), jnp.float32)),
        top_ks=repl(jax.ShapeDtypeStruct((B,), jnp.int32)),
        top_ps=repl(jax.ShapeDtypeStruct((B,), jnp.float32)),
        seeds=repl(jax.ShapeDtypeStruct((B,), jnp.int32)),
    )
    tokens = repl(jax.ShapeDtypeStruct((B,), jnp.int32))
    key = repl(jax.ShapeDtypeStruct((2,), jnp.uint32))

    def step_gspmd(params, tokens, meta, cache, key):
        logits, cache = qwen3.forward_decode(
            params, spec, tokens, meta, cache, BS, attn_impl="jnp"
        )
        return sample(logits, meta.temperatures, key), cache

    spec_local = dataclasses.replace(
        spec, num_q_heads=Hq // tp, num_kv_heads=Hkv // tp,
        intermediate_size=I // tp, tp_shards=1,
    )

    def step_local(params, tokens, meta, cache, key):
        logits, cache = qwen3.forward_decode(
            params, spec_local, tokens, meta, cache, BS,
            attn_impl="jnp", tp_axis="model",
        )
        return sample(logits, meta.temperatures, key), cache

    cspecs = KVCache(k=cs["k"], v=cs["v"], sc_shards=0)
    step_sm = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(pspecs, P(), P(), cspecs, P()),
        out_specs=(P(), cspecs),
        check_vma=False,
    )

    def analyze(name, txt):
        out = [f"== {name}"]
        n_sync = {}
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute"):
            n_start = len(re.findall(rf"{op}-start", txt))
            n_plain = len(re.findall(rf"{op}\(", txt))
            if n_start or n_plain:
                out.append(f"   {op}: {n_plain} sync, {n_start} async-start")
            n_sync[op] = n_plain
        lines = txt.splitlines()
        starts = {}
        seps = []
        for idx, ln in enumerate(lines):
            m = re.search(r"%(\S+) = .*?(all-reduce|all-gather)-start", ln)
            if m:
                starts[m.group(1).rstrip(")")] = idx
            m2 = re.search(r"(all-reduce|all-gather)-done\(%?(\S+?)[),]", ln)
            if m2:
                sname = m2.group(2).lstrip("%")
                if sname in starts:
                    seps.append(idx - starts[sname])
        if seps:
            out.append(
                f"   async start->done separations (HLO instrs between): {seps}"
            )
        else:
            out.append("   no async start/done pairs")
        return "\n".join(out)

    report = [
        f"topology {args.topology} ({tp} devices), {L} layers of Qwen3-8B "
        f"dims, B={B} decode step, bf16",
    ]
    copts = None
    if args.lhs:
        copts = {"xla_tpu_enable_latency_hiding_scheduler": "true"}
        report[0] += " [latency-hiding scheduler ON]"
    for name, fn in (("gspmd", step_gspmd), ("shard_map", step_sm)):
        try:
            txt = (
                jax.jit(fn)
                .lower(params_sh, tokens, meta, cache_sh, key)
                .compile(compiler_options=copts)
                .as_text()
            )
            open(f"/tmp/hlo_tpu_{name}.txt", "w").write(txt)
            report.append(analyze(name, txt))
        except Exception as e:  # pragma: no cover
            report.append(f"== {name} FAILED: {type(e).__name__}: {str(e)[:400]}")
    text = "\n".join(report)
    print(text)
    if args.out:
        open(args.out, "w").write(text + "\n")


if __name__ == "__main__":
    main()
