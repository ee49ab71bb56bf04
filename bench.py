"""Benchmark: decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star serving target of 2,000 tok/s/chip
decode. Config here: Qwen3-0.6B architecture, random bf16 weights,
continuous-batching decode at batch 32 (bench-time knobs via env:
BENCH_BATCH, BENCH_PROMPT, BENCH_STEPS, BENCH_QUANT, BENCH_KV).
"""

from __future__ import annotations

import json
import os
import time

import jax

NORTH_STAR_TOK_S = 2000.0


def main():
    from lightvllm_tpu.config import Config
    from lightvllm_tpu.engine.runner import ModelRunner
    from lightvllm_tpu.engine.scheduler import Scheduler
    from lightvllm_tpu.engine.sequence import Sequence
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    batch = int(os.environ.get("BENCH_BATCH", 128))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 128))
    decode_steps = int(os.environ.get("BENCH_STEPS", 24))
    quant = os.environ.get("BENCH_QUANT") or None  # int8 | int4
    kv = os.environ.get("BENCH_KV", "auto")  # auto | fp8 | int8
    window = cfg_window = int(os.environ.get("BENCH_WINDOW", 32))
    model = os.environ.get("BENCH_MODEL", "0.6b")  # 0.6b | 1.7b | 4b | 8b
    kv_mode = os.environ.get("BENCH_KV_MODE", "staged")  # staged | scatter
    hbm_util = float(os.environ.get("BENCH_HBM", 0.9))
    if model == "8b" and "LV_HBM_BYTES" not in os.environ:
        # The tunnel transport reports no memory stats, and with the AOT
        # sizing probe disabled (below) the 16 GiB reconstruction default
        # over-commits the KV pool at 8B (measured OOM on the v5e). 12 GiB
        # is the measured-safe budget for this bench's shapes.
        os.environ["LV_HBM_BYTES"] = str(12 * 2**30)

    # Qwen3 family architectures (HF configs).
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
        num_layers=archs["num_layers"],
        hidden_size=archs["hidden_size"],
        num_q_heads=archs["num_q_heads"],
        num_kv_heads=archs["num_kv_heads"],
        head_dim=128,
        intermediate_size=archs["intermediate_size"],
        vocab_size=151936,
        rope_theta=1e6,
        rms_eps=1e-6,
        tie_word_embeddings=archs["tie"],
        dtype="bfloat16",
    )
    # Single-element box: ModelRunner rebinds params during lm-head
    # quantization / projection fusion, and a lingering caller reference
    # would keep the pre-transform weight tree alive (double HBM at 8B).
    params_box = [
        qwen3.init_params(spec, jax.random.PRNGKey(0), quantization=quant)
    ]
    config = Config(
        decode_window=window,
        max_num_seqs=max(batch, 8),
        max_model_len=2048,
        max_num_batched_tokens=max(4096, batch * prompt_len),
        kvcache_block_size=64,
        num_kvcache_blocks=-1,
        quantization=quant,
        kv_cache_dtype=kv,
        decode_kv_mode=kv_mode,
        hbm_memory_utilization=hbm_util,
        eos=-1,
        # Steady-state throughput bench: compile only the shapes actually
        # timed (the first prefill + decode window below). The full warmup
        # grid + AOT sizing probe are production-init features measured by
        # tests, and cost ~20 tunnel compiles (many minutes) here.
        warmup_shapes=False,
        kv_size_probe=False,
    )
    runner = ModelRunner(config, spec, params_box.pop())
    sched = Scheduler(config)
    rng = __import__("numpy").random.default_rng(0)
    for _ in range(batch):
        toks = rng.integers(1, spec.vocab_size, size=prompt_len).tolist()
        sched.add(
            Sequence(
                toks,
                SamplingParams(
                    temperature=0.0, max_tokens=(decode_steps + 4) * window, ignore_eos=True
                ),
                block_size=config.kvcache_block_size,
            )
        )

    # Prefill (may take several scheduler steps) + warmup decode window.
    prefill_s = 0.0
    prefill_tokens = 0
    while True:
        seqs, is_prefill, window = sched.schedule()
        t0 = time.perf_counter()
        tokens = runner.run(seqs, is_prefill, window)
        jax.block_until_ready(runner.cache.k)
        dt = time.perf_counter() - t0
        sched.postprocess(seqs, tokens)
        if is_prefill:
            prefill_s += dt
            prefill_tokens += sum(len(s) for s in seqs)
        else:
            break  # first decode window done (compiled)

    # Timed decode — pipelined like LLMEngine.step: up to BENCH_DEPTH
    # further windows are dispatched (each fed by the previous window's
    # device-resident last token row) before the oldest is fetched, so the
    # device never idles on host postprocess + input prep and (depth >= 2)
    # the sampled-token D2H transfer overlaps the next window's compute.
    # BENCH_ASYNC=0 reverts to the fetch-then-dispatch loop for A/B.
    async_on = os.environ.get("BENCH_ASYNC", "1") != "0"
    depth = int(os.environ.get("BENCH_DEPTH", 2))
    from collections import deque

    t0 = time.perf_counter()
    done = 0
    steps = 0
    q: deque = deque()
    dispatched = 0
    while steps < decode_steps and not sched.is_finished():
        if q and all(s.is_finished for s in q[0].seqs):
            q.clear()
        if not q:
            seqs, is_prefill, window = sched.schedule()
            assert not is_prefill
            q.append(runner.dispatch_decode(seqs, window))
            dispatched += 1
        while (
            async_on
            and len(q) <= depth
            and dispatched < decode_steps
            and sched.speculate_next_window(
                q[-1].seqs, q[-1].window, inflight=len(q)
            )
        ):
            last = q[-1]
            q.append(
                runner.dispatch_decode(
                    last.seqs,
                    last.window,
                    advance=len(q) * last.window,
                    chained_tokens=last.last_tokens,
                )
            )
            dispatched += 1
        pending = q.popleft()
        tokens = runner.fetch_decode(pending)
        done += sched.postprocess(pending.seqs, tokens)
        steps += 1
    while q:
        pending = q.popleft()
        done += sched.postprocess(pending.seqs, runner.fetch_decode(pending))
    jax.block_until_ready(runner.cache.k)
    decode_s = time.perf_counter() - t0

    tok_per_s = done / decode_s
    result = {
        "metric": f"decode throughput Qwen3-{model} {quant or 'bf16'} kv={kv} m={kv_mode} b{batch} w{cfg_window} (1 chip)",
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_per_s / NORTH_STAR_TOK_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
