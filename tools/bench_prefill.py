#!/usr/bin/env python
"""Prefill throughput / time-to-first-token benchmark (BASELINE.md names
p50 TTFT as a north-star metric; the decode headline lives in bench.py).

Prints one JSON line per measured batch config. Env knobs mirror bench.py:
BENCH_MODEL, BENCH_QUANT, BENCH_KV, BENCH_PROMPT, BENCH_BATCH.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import time


def main() -> None:
    import jax
    import numpy as np

    from lightvllm_tpu.config import Config
    from lightvllm_tpu.engine.runner import ModelRunner
    from lightvllm_tpu.engine.scheduler import Scheduler
    from lightvllm_tpu.engine.sequence import Sequence
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    model = os.environ.get("BENCH_MODEL", "0.6b")
    quant = os.environ.get("BENCH_QUANT") or None
    kv = os.environ.get("BENCH_KV", "auto")
    prompt_len = int(os.environ.get("BENCH_PROMPT", 1024))
    batch = int(os.environ.get("BENCH_BATCH", 8))
    reps = int(os.environ.get("BENCH_REPS", 5))

    archs = {
        "0.6b": dict(num_layers=28, hidden_size=1024, num_q_heads=16,
                     num_kv_heads=8, intermediate_size=3072, tie=True),
        "1.7b": dict(num_layers=28, hidden_size=2048, num_q_heads=16,
                     num_kv_heads=8, intermediate_size=6144, tie=True),
        "4b": dict(num_layers=36, hidden_size=2560, num_q_heads=32,
                   num_kv_heads=8, intermediate_size=9728, tie=True),
        "8b": dict(num_layers=36, hidden_size=4096, num_q_heads=32,
                   num_kv_heads=8, intermediate_size=12288, tie=False),
    }[model]
    spec = qwen3.ModelSpec(
        num_layers=archs["num_layers"], hidden_size=archs["hidden_size"],
        num_q_heads=archs["num_q_heads"], num_kv_heads=archs["num_kv_heads"],
        head_dim=128, intermediate_size=archs["intermediate_size"],
        vocab_size=151936, rope_theta=1e6, rms_eps=1e-6,
        tie_word_embeddings=archs["tie"], dtype="bfloat16",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0), quantization=quant)
    config = Config(
        max_num_seqs=max(batch, 8),
        max_model_len=max(2048, prompt_len + 64),
        max_num_batched_tokens=max(8192, batch * prompt_len),
        kvcache_block_size=64,
        quantization=quant,
        kv_cache_dtype=kv,
        eos=-1,
        warmup_shapes=False,  # prefill-only: skip the decode shape grid
    )
    runner = ModelRunner(config, spec, params)
    rng = np.random.default_rng(0)

    ttfts = []
    for rep in range(reps + 1):  # first rep = compile warmup
        sched = Scheduler(config)
        for _ in range(batch):
            toks = rng.integers(1, spec.vocab_size, size=prompt_len).tolist()
            sched.add(Sequence(toks, SamplingParams(max_tokens=2, ignore_eos=True),
                               block_size=config.kvcache_block_size))
        t0 = time.perf_counter()
        tokens_done = 0
        while True:
            seqs, is_prefill, window = sched.schedule()
            toks = runner.run(seqs, is_prefill, window)
            sched.postprocess(seqs, toks)
            if is_prefill:
                tokens_done += sum(len(s) - s.num_cached_tokens + 0 for s in seqs)
            else:
                break
        dt = time.perf_counter() - t0
        if rep > 0:
            ttfts.append(dt)
        # Drain and free blocks for the next rep.
        while not sched.is_finished():
            seqs, is_prefill, window = sched.schedule()
            sched.postprocess(seqs, runner.run(seqs, is_prefill, window))

    ttfts.sort()
    p50 = ttfts[len(ttfts) // 2]
    total_tokens = batch * prompt_len
    print(json.dumps({
        "metric": f"prefill Qwen3-{model} {quant or 'bf16'} kv={kv} "
                  f"b{batch}x{prompt_len} (1 chip)",
        "p50_ttft_s": round(p50, 4),
        "prefill_tok_per_s": round(total_tokens / p50, 1),
    }))


if __name__ == "__main__":
    main()
