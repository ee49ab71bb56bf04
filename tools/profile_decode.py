#!/usr/bin/env python
"""Decode-step phase breakdown by ablation (VERDICT r1 weak#2: ~7 ms of a
16 ms b64 step was unaccounted).

Runs the REAL engine decode path (bench.py config) with one component
ablated per invocation and prints the per-step time; the driver script
subtracts to attribute time per phase. One variant per process because jit
caches executables by function identity (memory: monkeypatch A/B tests must
not share function objects).

  python tools/profile_decode.py --ablate none|kvwrite|attention|logits|sample
      [--batch 64] [--window 16] [--quant int8|int4] [--steps 48]

Ablations keep data dependencies alive (no DCE): e.g. `logits` replaces the
lm_head contraction with a broadcast of a cheap reduction, so everything
upstream still runs.
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


def apply_ablation(name: str):
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.ops import kv_cache, sampling

    if name == "none":
        return
    if name == "kvwrite":
        # Scatter mode: skip the per-step scatter. Staged mode: runner's
        # flush imports these by name per call, so patching the module
        # attributes disables the per-window page writes.
        def no_write(cache, layer, k_new, v_new, slot_mapping):
            return cache

        qwen3.write_kv_layer = no_write
        kv_cache.write_kv_layer = no_write
        from lightvllm_tpu.ops.pallas import kv_append

        def no_flush(kp, vp, sk, sv, start, tables, sc=None, **kw):
            return (kp, vp) if sc is None else (kp, vp, sc)

        kv_append.kv_flush_pallas = no_flush
    elif name == "attention":
        def no_attn(q, cache, layer, meta, block_size, scale, **kw):
            return q  # (B, Hq, D) passthrough keeps shape + deps

        qwen3.paged_decode_attention_pallas = no_attn
        qwen3.paged_decode_attention = no_attn
    elif name == "logits":
        real = qwen3.compute_logits

        def cheap_logits(params, spec, h, tp_axis=None, gather=True):
            s = jnp.sum(h.astype(jnp.float32), axis=-1, keepdims=True)
            return jnp.broadcast_to(s, (h.shape[0], spec.vocab_size))

        qwen3.compute_logits = cheap_logits
        cheap_logits.__wrapped_real = real
    elif name == "sample":
        def cheap_sample(logits, temperatures, key, top_ks=None, top_ps=None,
                         seeds=None, positions=None):
            return (jnp.sum(logits, axis=-1) * 0).astype(jnp.int32) + 1

        # runner imports `sample` by name at module import time
        import lightvllm_tpu.engine.runner as runner_mod

        runner_mod.sample = cheap_sample
    else:
        raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", default="none")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--quant", default=None)
    ap.add_argument("--kv", default="auto")
    ap.add_argument("--model", default="0.6b")
    args = ap.parse_args()

    if args.model == "8b" and "LV_HBM_BYTES" not in os.environ:
        # Same budget as bench.py: the tunnel transport reports no memory
        # stats and the 16 GiB reconstruction default over-commits the KV
        # pool at 8B (measured compile-time OOM on the v5e).
        os.environ["LV_HBM_BYTES"] = str(12 * 2**30)

    apply_ablation(args.ablate)

    from lightvllm_tpu.config import Config
    from lightvllm_tpu.engine.runner import ModelRunner
    from lightvllm_tpu.engine.scheduler import Scheduler
    from lightvllm_tpu.engine.sequence import Sequence
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    archs = {
        "0.6b": dict(num_layers=28, hidden_size=1024, num_q_heads=16,
                     num_kv_heads=8, intermediate_size=3072, tie=True),
        "8b": dict(num_layers=36, hidden_size=4096, num_q_heads=32,
                   num_kv_heads=8, intermediate_size=12288, tie=False),
    }[args.model]
    spec = qwen3.ModelSpec(
        num_layers=archs["num_layers"], hidden_size=archs["hidden_size"],
        num_q_heads=archs["num_q_heads"], num_kv_heads=archs["num_kv_heads"],
        head_dim=128, intermediate_size=archs["intermediate_size"],
        vocab_size=151936, rope_theta=1e6, rms_eps=1e-6,
        tie_word_embeddings=archs["tie"], dtype="bfloat16",
    )
    params_box = [qwen3.init_params(spec, jax.random.PRNGKey(0),
                                    quantization=args.quant)]
    config = Config(
        decode_window=args.window, max_num_seqs=max(args.batch, 8),
        max_model_len=2048,
        max_num_batched_tokens=max(4096, args.batch * args.prompt),
        kvcache_block_size=64, num_kvcache_blocks=-1, quantization=args.quant,
        kv_cache_dtype=args.kv, eos=-1, warmup_shapes=False,
        kv_size_probe=False,
    )
    runner = ModelRunner(config, spec, params_box.pop())
    sched = Scheduler(config)
    rng = np.random.default_rng(0)
    for _ in range(args.batch):
        toks = rng.integers(1, spec.vocab_size, size=args.prompt).tolist()
        sched.add(Sequence(toks, SamplingParams(
            temperature=0.0, max_tokens=(args.steps + 4) * args.window,
            ignore_eos=True), block_size=config.kvcache_block_size))

    while True:
        seqs, is_prefill, window = sched.schedule()
        tokens = runner.run(seqs, is_prefill, window)
        jax.block_until_ready(runner.cache.k)
        np.asarray(jnp.sum(runner.cache.k[0][0, 0, 0, :8]))  # tunnel drain
        sched.postprocess(seqs, tokens)
        if not is_prefill:
            break

    t0 = time.perf_counter()
    done = 0
    nwin = 0
    for _ in range(args.steps):
        if sched.is_finished():
            break
        seqs, is_prefill, window = sched.schedule()
        assert not is_prefill
        tokens = runner.run(seqs, is_prefill, window)
        done += sched.postprocess(seqs, tokens)
        nwin += 1
    np.asarray(jnp.sum(runner.cache.k[0][0, 0, 0, :8]))  # drain queue
    dt = time.perf_counter() - t0
    per_step_ms = dt / (nwin * args.window) * 1e3
    import json

    print(json.dumps({
        "ablate": args.ablate, "quant": args.quant or "bf16",
        "batch": args.batch, "window": args.window,
        "per_step_ms": round(per_step_ms, 3),
        "tok_per_s": round(done / dt, 1),
    }))


if __name__ == "__main__":
    main()
