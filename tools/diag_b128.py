#!/usr/bin/env python
"""Per-window decode timing diagnosis (b128 staged regression hunt).

Prints one line per decode window: wall time, prep share, window, batch.
A spiky series = mid-serving recompiles; flat-slow = runtime cost.
Env: BENCH_BATCH, BENCH_WINDOW, BENCH_STEPS, BENCH_KV_MODE, BENCH_HBM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    from lightvllm_tpu.config import Config
    from lightvllm_tpu.engine.runner import ModelRunner
    from lightvllm_tpu.engine.scheduler import Scheduler
    from lightvllm_tpu.engine.sequence import Sequence
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    batch = int(os.environ.get("BENCH_BATCH", 128))
    window = int(os.environ.get("BENCH_WINDOW", 32))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    kv_mode = os.environ.get("BENCH_KV_MODE", "staged")
    hbm = float(os.environ.get("BENCH_HBM", 0.9))
    prompt = int(os.environ.get("BENCH_PROMPT", 128))
    kv = os.environ.get("BENCH_KV", "auto")

    spec = qwen3.ModelSpec(
        num_layers=28, hidden_size=1024, num_q_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=3072, vocab_size=151936,
        rope_theta=1e6, rms_eps=1e-6, tie_word_embeddings=True,
        dtype="bfloat16",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    config = Config(
        decode_window=window, max_num_seqs=batch, max_model_len=2048,
        max_num_batched_tokens=max(4096, batch * 128), kvcache_block_size=64,
        num_kvcache_blocks=-1, decode_kv_mode=kv_mode, kv_cache_dtype=kv,
        hbm_memory_utilization=hbm, eos=-1, warmup_shapes=False,
        kv_size_probe=False,
    )
    runner = ModelRunner(config, spec, params)
    print(f"pool: {runner.num_blocks} blocks, mode={kv_mode} kv={kv} "
          f"prompt={prompt}", flush=True)
    dev = jax.devices()[0]
    st = (dev.memory_stats() if hasattr(dev, "memory_stats") else None) or {}
    print(f"hbm: limit={st.get('bytes_limit', 0)/2**30:.2f} GiB "
          f"in_use={st.get('bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
    sched = Scheduler(config)
    rng = np.random.default_rng(0)
    for _ in range(batch):
        toks = rng.integers(1, spec.vocab_size, size=prompt).tolist()
        sched.add(Sequence(toks, SamplingParams(
            temperature=0.0, max_tokens=(steps + 6) * window,
            ignore_eos=True), block_size=64))

    i = 0
    t_all = time.perf_counter()
    while not sched.is_finished() and i < steps + 2:
        seqs, is_prefill, w = sched.schedule()
        t0 = time.perf_counter()
        tokens = runner.run(seqs, is_prefill, w)
        dt = time.perf_counter() - t0
        sched.postprocess(seqs, tokens)
        st = runner.last_step_stats
        kind = "prefill" if is_prefill else f"decode w={w}"
        print(f"[{i:3d}] {kind:12s} B={len(seqs):4d} wall={dt*1e3:8.1f} ms "
              f"prep={st['prep_time_s']*1e3:6.1f} ms "
              f"per_step={dt/ (1 if is_prefill else w) * 1e3:7.2f} ms "
              f"free={sched.block_manager.num_free_blocks} "
              f"preempt={sched.num_preemptions}",
              flush=True)
        i += 1
    print(f"total {time.perf_counter()-t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
