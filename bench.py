"""Benchmark: decode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star serving target of 2,000 tok/s/chip
decode. Default config IS the north-star metric: Qwen3-8B architecture,
INT4 weights + INT8 KV, continuous-batching decode at batch 64, window 32
(the measured sweet spot, artifacts/perf_r3.json). Random weights — decode
is bandwidth-bound, so the numbers match real checkpoints (stated per the
r2 verdict bench-hygiene item). Knobs via env: BENCH_MODEL, BENCH_BATCH,
BENCH_PROMPT, BENCH_STEPS, BENCH_QUANT, BENCH_KV, BENCH_WINDOW.
"""

from __future__ import annotations

import json
import os
import time

import jax

NORTH_STAR_TOK_S = 2000.0


def main():
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    batch = int(os.environ.get("BENCH_BATCH", 64))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 128))
    decode_steps = int(os.environ.get("BENCH_STEPS", 24))
    quant = os.environ.get("BENCH_QUANT", "int4") or None  # int8 | int4 | ""
    kv = os.environ.get("BENCH_KV", "int8")  # auto | fp8 | int8
    window = cfg_window = int(os.environ.get("BENCH_WINDOW", 32))
    model = os.environ.get("BENCH_MODEL", "8b")  # 0.6b | 1.7b | 4b | 8b
    kv_mode = os.environ.get("BENCH_KV_MODE", "staged")  # staged | scatter
    hbm_util = float(os.environ.get("BENCH_HBM", 0.9))
    # Chunked prefill budget (tokens per prefill step, multiple of the
    # block size; 0 disables). "default" keeps the Config default.
    chunk_env = os.environ.get("BENCH_CHUNK", "default")
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
        # BASELINE row 6. NOTE single-chip memory plan: 32B int4 weights
        # are ~16.3 GB — they do NOT fit one 16 GB v5e chip; serving needs
        # tp >= 2 (weights+KV shard on "model"). The single-chip bench can
        # only run this arch with a reduced layer count for kernel-shape
        # validation; the scaling artifact (tools/scaling_study.py
        # --model 32b) carries the projected multi-chip numbers.
        "32b": dict(num_layers=64, hidden_size=5120, num_q_heads=64,
                    num_kv_heads=8, intermediate_size=25600, tie=False),
    }[model]
    if (n_layers := os.environ.get("BENCH_LAYERS")):
        archs["num_layers"] = int(n_layers)
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
    # The bench drives the real LLMEngine.step loop (one pipelining
    # implementation — the engine's deque of speculated windows; VERDICT r3
    # review: a hand-rolled copy here had already drifted). BENCH_ASYNC=0
    # disables speculation for A/B; BENCH_DEPTH sets the pipeline depth.
    async_on = os.environ.get("BENCH_ASYNC", "1") != "0"
    depth = int(os.environ.get("BENCH_DEPTH", 2))
    eng = LLMEngine(
        spec=spec,
        params=params_box.pop(),
        decode_window=window,
        max_num_seqs=max(batch, 8),
        max_model_len=2048,
        # Cap the prefill step at 8k tokens: a single T = batch*prompt
        # bucket at b64 x 1024 is a 65k-token executable whose activations
        # alone blow HBM at 8B (measured compile OOM at 24.7 GB).
        # BENCH_PREFILL_BUDGET shrinks it further: at the 1024-ctx north
        # star the KV pool + weights leave < 0.4 GB for activations on the
        # 15.75 GiB chip, and the 8192-token prefill bucket alone exceeds
        # that (chunked prefill solves the same problem shape-by-shape).
        max_num_batched_tokens=int(os.environ.get(
            "BENCH_PREFILL_BUDGET",
            min(max(4096, batch * prompt_len), 8192),
        )),
        kvcache_block_size=64,
        # BENCH_BLOCKS pins the KV pool size exactly (block math done by
        # hand for capacity-edge runs; -1 = derive from the HBM budget).
        num_kvcache_blocks=int(os.environ.get("BENCH_BLOCKS", -1)),
        quantization=quant,
        kv_cache_dtype=kv,
        decode_kv_mode=kv_mode,
        attn_dequant_mode=os.environ.get("BENCH_DEQUANT", "fold"),
        hbm_memory_utilization=hbm_util,
        eos=-1,
        async_decode=async_on,
        async_decode_depth=depth,
        # Steady-state throughput bench: compile only the shapes actually
        # timed (the first prefill + decode window below). The full warmup
        # grid + AOT sizing probe are production-init features measured by
        # tests, and cost ~20 tunnel compiles (many minutes) here.
        warmup_shapes=False,
        kv_size_probe=False,
        **(
            {}
            if chunk_env == "default"
            else {"prefill_chunk_tokens": int(chunk_env)}
        ),
    )
    rng = __import__("numpy").random.default_rng(0)
    sp = SamplingParams(
        temperature=0.0, max_tokens=(decode_steps + 4) * window, ignore_eos=True
    )
    for _ in range(batch):
        eng.add_request(
            rng.integers(1, spec.vocab_size, size=prompt_len).tolist(), sp
        )

    # Prefill (may take several scheduler steps) + warmup decode window.
    # p50 TTFT (a named north-star metric, BASELINE.md:21): per-request
    # time from submission to its first sampled token. The first prefill
    # step pays the one-time jit compile, so with the persistent
    # compilation cache warm this is the serving p50; cold-cache runs
    # inflate it by the compile time (visible as prefill_s >> tokens/rate).
    prefill_s = 0.0
    prefill_tokens = 0
    t_submit = time.perf_counter()
    ttft: dict[int, float] = {}
    while True:
        t0 = time.perf_counter()
        _, n, is_prefill = eng.step()
        jax.block_until_ready(eng.model_runner.cache.k)
        dt = time.perf_counter() - t0
        if is_prefill:
            now = time.perf_counter()
            for s in eng.scheduler.running:
                if s.num_completion_tokens == 1 and s.seq_id not in ttft:
                    ttft[s.seq_id] = now - t_submit
            prefill_s += dt
            prefill_tokens += n
        else:
            break  # first decode window done (compiled)
    ttfts = sorted(ttft.values())
    p50_ttft = ttfts[len(ttfts) // 2] if ttfts else 0.0

    t0 = time.perf_counter()
    done = 0
    steps = 0
    while steps < decode_steps and not eng.is_finished():
        _, n, is_prefill = eng.step()
        assert not is_prefill
        done += n
        steps += 1
    jax.block_until_ready(eng.model_runner.cache.k)
    decode_s = time.perf_counter() - t0

    # WARM p50 TTFT: the cold number above is dominated by the first-step
    # jit compile (the axon remote-AOT transport bypasses the persistent
    # compilation cache, ~20 s at the 8B T=8192 prefill bucket). Submit a
    # fresh batch of same-shape prompts — every executable is now compiled —
    # and measure submission -> first sampled token per request. This is
    # the serving TTFT a warmed process delivers (and includes contention
    # with the still-running decode batch, as real serving would).
    for _ in range(batch):
        eng.add_request(
            rng.integers(1, spec.vocab_size, size=prompt_len).tolist(),
            SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
        )
    t_submit2 = time.perf_counter()
    ttft2: dict[int, float] = {}
    guard = 0
    # Warm prefill throughput: tokens/s over the prefill steps of this
    # mixed phase (every executable compiled — the serving-rate number; the
    # cold prefill_tok_s above is compile-dominated). Plus decode window
    # GAPS: wall time between consecutive decode-window completions while
    # prompts are being admitted — the inter-token QoS that chunked prefill
    # exists to bound (one monolithic long-prompt prefill stalls every
    # running decode for its full duration).
    warm_prefill_tokens = 0
    warm_prefill_s = 0.0
    compile_steps = 0
    decode_gaps: list[float] = []
    last_decode_t = None
    while len(ttft2) < batch and guard < 400:
        t_step = time.perf_counter()
        _, n, is_prefill = eng.step()
        now = time.perf_counter()
        guard += 1
        step_s = now - t_step
        if is_prefill:
            # Steps > 5 s are first-time jit compiles of admission-phase
            # shapes (small-batch prefills as slots free up; the axon
            # remote-AOT transport bypasses the persistent cache) — count
            # them separately so the warm rate measures serving, not XLA.
            if step_s < 5.0:
                warm_prefill_tokens += n
                warm_prefill_s += step_s
            else:
                compile_steps += 1
            for s in eng.scheduler.running:
                if (
                    s.num_completion_tokens == 1
                    and s.seq_id not in ttft
                    and s.seq_id not in ttft2
                ):
                    ttft2[s.seq_id] = now - t_submit2
        else:
            if last_decode_t is not None:
                decode_gaps.append(now - last_decode_t)
            last_decode_t = now
    warm = sorted(ttft2.values())
    p50_ttft_warm = warm[len(warm) // 2] if warm else 0.0
    gaps = sorted(g for g in decode_gaps if g < 5.0)  # compile gaps excluded
    compile_gaps = sum(1 for g in decode_gaps if g >= 5.0)
    gap_p99 = gaps[min(len(gaps) - 1, int(len(gaps) * 0.99))] if gaps else 0.0

    tok_per_s = done / decode_s
    result = {
        "metric": f"decode throughput Qwen3-{model} {quant or 'bf16'} kv={kv} m={kv_mode} b{batch} w{cfg_window} (1 chip)",
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_per_s / NORTH_STAR_TOK_S, 3),
        # Warm p50 time-to-first-token (all executables compiled, measured
        # against a running decode batch); cold includes the first-step jit
        # compile. prefill_tok_s is the cold admission-phase rate.
        "p50_ttft_s": round(p50_ttft_warm, 3),
        "p50_ttft_cold_s": round(p50_ttft, 3),
        "prefill_tok_s": round(
            warm_prefill_tokens / warm_prefill_s, 1
        ) if warm_prefill_s else 0.0,
        "prefill_cold_tok_s": round(
            prefill_tokens / prefill_s, 1
        ) if prefill_s else 0.0,
        # p99 gap between decode-window completions while prompts admit
        # (inter-token QoS; bounded by prefill_chunk_tokens when chunking).
        # First-time jit compiles (> 5 s, cold-cache only) counted apart.
        "decode_gap_p99_s": round(gap_p99, 3),
        "cold_compile_events": compile_gaps + compile_steps,
        "prefill_chunk_tokens": eng.config.prefill_chunk_tokens,
        "prompt_len": prompt_len,
    }
    if os.environ.get("BENCH_STATS"):
        # Capacity/pressure diagnostics: window-shrink + recompute-
        # preemption thrash shows up here, not in the throughput number
        # (each shrunk window size is a fresh executable — ~20 s over the
        # tunnel transport, which silently turns a capacity problem into
        # an apparent throughput collapse).
        st = eng.stats
        result["preemptions"] = st["preemptions"]
        result["blocks_total"] = st["blocks_total"]
        result["blocks_free"] = st["blocks_free"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
