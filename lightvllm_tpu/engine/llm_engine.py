"""LLMEngine: orchestrates tokenizer, runner, scheduler, and the step loop.

Parity: reference `lightvllm/engine/llm_engine.py:30-295` — add_request /
step / is_finished / generate / exit surface, per-step throughput accounting
(prefill vs decode tokens/s), tqdm progress. TPU-first: no worker-process
spawn/atexit teardown — single-controller JAX owns all local devices; step()
returns (finished outputs, num_tokens) with an explicit is_prefill flag
instead of the reference's signed-token-count convention (SURVEY.md §2.9.10).
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import fields

import numpy as np

from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.runner import ModelRunner
from lightvllm_tpu.engine.scheduler import Scheduler
from lightvllm_tpu.engine.sequence import Sequence
from lightvllm_tpu.models import get_model_module
from lightvllm_tpu.sampling_params import SamplingParams


class LLMEngine:
    def __init__(self, model: str = "", **kwargs):
        from lightvllm_tpu.parallel.distributed import maybe_init_distributed

        maybe_init_distributed()  # no-op off multi-host pods
        config_kwargs = {
            k: v for k, v in kwargs.items() if k in {f.name for f in fields(Config)}
        }
        self.config = Config(model=model, **config_kwargs)
        self.tokenizer = None
        # pop, not get: kwargs must not keep a second reference to the
        # weight tree alive through ModelRunner construction (the runner
        # rebinds params during lm-head quantization / projection fusion —
        # a lingering ref doubles weight HBM at 8B).
        params = kwargs.pop("params", None)
        spec = kwargs.pop("spec", None)
        if model:
            from transformers import AutoTokenizer

            try:
                self.tokenizer = AutoTokenizer.from_pretrained(model)
                if self.config.eos < 0 and self.tokenizer.eos_token_id is not None:
                    self.config.eos = self.tokenizer.eos_token_id
            except Exception:
                self.tokenizer = None  # token-id-only mode
            mod = get_model_module(self.config.hf_config)
            if spec is None:
                spec = mod.ModelSpec.from_hf_config(
                    self.config.hf_config, self.config.dtype
                )
            if params is None:
                if self.config.quantized_checkpoint:
                    from lightvllm_tpu.utils.loader import load_saved_params

                    params = load_saved_params(
                        self.config.quantized_checkpoint, spec
                    )
                else:
                    params = mod.load_params(
                        self.config.model_path,
                        spec,
                        self.config.quantization,
                        self.config.quant_group_size,
                    )
        assert spec is not None and params is not None, (
            "provide a model path or explicit spec= and params="
        )
        if self.config.eos < 0 and self.config.hf_config is not None:
            eos = getattr(self.config.hf_config, "eos_token_id", None)
            if isinstance(eos, (list, tuple)):
                eos = eos[0]
            if eos is not None:
                self.config.eos = eos
        # Transfer ownership of the weight tree into the runner: it rebinds
        # `params` during lm-head quantization / projection fusion, and a
        # lingering reference here would keep the pre-transform tree alive
        # through KV-cache allocation (double weight HBM at 8B). Callers
        # passing params= explicitly keep their own reference (tests reuse
        # trees across engines); checkpoint loads are owned solely here.
        params_box = [params]
        del params
        rng_seed = kwargs.get("rng_seed", 0)
        dp = self.config.data_parallel_size
        if dp > 1:
            # Data parallelism: one INDEPENDENT runner per group, each on
            # its own ("model",)-axis sub-mesh with a private KV pool and
            # dispatch queue. Groups run fully independent phases (a group
            # can prefill while another's decode windows are in flight on
            # its own devices) with pipelined decode and the shard_map
            # Pallas path — replacing the r3 vmapped (DP,)-stacked dispatch,
            # which forced lock-stepped phases, synchronous decode, and the
            # GSPMD jnp-oracle attention. Weights are replicated per group
            # (each sub-mesh holds a full tp-sharded copy), matching the
            # "model"-only sharding the stacked layout had.
            import copy

            import jax
            import numpy as np
            from jax.sharding import Mesh

            from lightvllm_tpu.engine.dp_scheduler import DataParallelScheduler

            tp = self.config.tensor_parallel_size
            devices = jax.devices()
            assert len(devices) >= dp * tp, (
                f"dp={dp} x tp={tp} needs {dp * tp} devices, "
                f"have {len(devices)}"
            )
            host_params = params_box.pop()
            self.runners = []
            group_scheds = []
            for g in range(dp):
                gcfg = copy.copy(self.config)
                gcfg.data_parallel_size = 1
                if self.config.num_kvcache_blocks > 0:
                    gcfg.num_kvcache_blocks = (
                        self.config.num_kvcache_blocks // dp
                    )
                mesh = Mesh(
                    np.asarray(devices[g * tp : (g + 1) * tp]), ("model",)
                )
                self.runners.append(
                    ModelRunner(
                        gcfg, spec, host_params, rng_seed=rng_seed + g,
                        mesh=mesh,
                    )
                )
                group_scheds.append(Scheduler(gcfg))
            del host_params
            self.model_runner = self.runners[0]
            self.scheduler = DataParallelScheduler(group_scheds)
            self._groups = list(zip(group_scheds, self.runners))
        else:
            self.model_runner = ModelRunner(
                self.config, spec, params_box.pop(), rng_seed=rng_seed
            )
            self.runners = [self.model_runner]
            self.scheduler = Scheduler(self.config)
            self._groups = [(self.scheduler, self.model_runner)]
        self._stats = {"prefill_tokens": 0, "decode_tokens": 0, "prefill_s": 0.0, "decode_s": 0.0}
        # Pipelined decode state: per-group FIFOs of in-flight speculated
        # windows (engine.step drains a group's queue before scheduling
        # anything else for that group).
        self._pending: list[deque] = [deque() for _ in self._groups]
        self._async_decode = self.config.async_decode
        # depth 0 disables speculation entirely (dispatch/fetch with no
        # window chained ahead — the synchronous A/B baseline).
        self._async_depth = self.config.async_decode_depth

    # ---------------- public API (mirrors the reference surface) ---------

    def add_request(
        self, prompt: str | list[int], sampling_params: SamplingParams | None = None
    ) -> int:
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompt needs a tokenizer"
            prompt = self.tokenizer.encode(prompt)
        # A near-max prompt must not decode past max_model_len: the runner's
        # fixed-width block tables are sized for max_model_len, so an
        # unclamped max_tokens would overrun them mid-serving.
        room = self.config.max_model_len - len(prompt)
        if room < 1:
            raise ValueError(
                f"prompt length {len(prompt)} leaves no room to decode within "
                f"max_model_len={self.config.max_model_len}"
            )
        seq = Sequence(
            prompt, sampling_params, block_size=self.config.kvcache_block_size
        )
        seq.max_tokens = min(seq.max_tokens, room)
        self.scheduler.add(seq)
        return seq.seq_id

    def step(self) -> tuple[list[tuple[int, list[int]]], int, bool]:
        """Run one engine step: a prefill batch, or a fused decode window.

        Returns (finished [(seq_id, completion_token_ids)], num_tokens
        processed, is_prefill). With data parallelism each group is an
        independent (scheduler, runner, dispatch-queue) triple; a step
        first gives every idle group work — prefills run immediately (other
        groups' in-flight decode windows keep computing on their own
        devices), decode windows are dispatched asynchronously — then
        blocks on the OLDEST in-flight window across groups.
        """
        t0 = time.perf_counter()
        finished: list = []
        prefill_n = 0
        # Phase 1: give every idle group work.
        for gi, (sched, runner) in enumerate(self._groups):
            q = self._pending[gi]
            if q and all(s.is_finished for s in q[0].seqs):
                # The whole batch drained at the previous postprocess —
                # every speculated window is garbage for every slot. Drop
                # them without blocking: their writes only touched
                # never-hash-registered tail pages, and anything reusing
                # those pages dispatches after them in device order (see
                # Scheduler.speculate_next_window).
                q.clear()
            if q or sched.is_finished():
                continue
            seqs, is_prefill, window = sched.schedule()
            if is_prefill:
                token_ids = runner.run(seqs, True)
                # Count prefill work BEFORE postprocess appends the token
                # (chunked prompts process [num_cached, prefill_end) only).
                prefill_n += sum(
                    (s.prefill_end or len(s)) - s.num_cached_tokens
                    for s in seqs
                )
                sched.postprocess(seqs, token_ids)
                finished += [
                    (s.seq_id, s.completion_token_ids)
                    for s in seqs
                    if s.is_finished
                ]
            else:
                q.append(runner.dispatch_decode(seqs, window))
        if prefill_n:
            self._stats["prefill_tokens"] += prefill_n
            self._stats["prefill_s"] += time.perf_counter() - t0
            return finished, prefill_n, True
        # Phase 2 — pipelined decode: keep up to `async_decode_depth`
        # further windows enqueued per group (each fed by the previous
        # window's device-resident last token row) before blocking on the
        # oldest one, so no device idles on host postprocess + input prep,
        # and (depth >= 2) the sampled-token D2H transfer overlaps the next
        # window's compute.
        for gi, (sched, runner) in enumerate(self._groups):
            q = self._pending[gi]
            while (
                self._async_decode
                and q
                and len(q) <= self._async_depth
                and sched.speculate_next_window(
                    q[-1].seqs, q[-1].window, inflight=len(q)
                )
            ):
                last = q[-1]
                q.append(
                    runner.dispatch_decode(
                        last.seqs,
                        last.window,
                        # Host sequence state lags by every in-flight window.
                        advance=len(q) * last.window,
                        chained_tokens=last.last_tokens,
                    )
                )
        # Phase 3: block on the oldest in-flight window across groups.
        live = [(gi, q) for gi, q in enumerate(self._pending) if q]
        assert live, "step() called on a finished engine"
        gi, q = min(live, key=lambda t: t[1][0].t0)
        sched, runner = self._groups[gi]
        pending = q.popleft()
        token_ids = runner.fetch_decode(pending)
        # Report only sequences that finish at THIS postprocess: later
        # in-flight windows share the same seqs list, and re-emitting an
        # already-finished sequence would deliver its completion (and tick
        # generate()'s progress bar) once per pipeline level.
        was_finished = [s.is_finished for s in pending.seqs]
        appended = sched.postprocess(pending.seqs, token_ids)
        finished += [
            (s.seq_id, s.completion_token_ids)
            for s, was in zip(pending.seqs, was_finished)
            if s.is_finished and not was
        ]
        self._stats["decode_tokens"] += appended
        self._stats["decode_s"] += time.perf_counter() - t0
        return finished, appended, False

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    def generate(
        self,
        prompts: list[str] | list[list[int]],
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        use_tqdm: bool = True,
    ) -> list[dict]:
        if sampling_params is None or isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        seq_ids = [
            self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)
        ]
        order = {sid: i for i, sid in enumerate(seq_ids)}
        outputs: dict[int, list[int]] = {}
        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(prompts), desc="generating")
        while not self.is_finished():
            finished, _, _ = self.step()
            for sid, completion in finished:
                if sid in order:
                    outputs[sid] = completion
                    if pbar:
                        pbar.update(1)
        if pbar:
            pbar.close()
        results = []
        for sid in seq_ids:
            completion = outputs[sid]
            text = (
                self.tokenizer.decode(completion, skip_special_tokens=True)
                if self.tokenizer
                else ""
            )
            results.append(
                {"seq_id": sid, "token_ids": completion, "text": text}
            )
        return results

    @property
    def throughput(self) -> dict:
        s = self._stats
        return {
            "prefill_tok_per_s": s["prefill_tokens"] / s["prefill_s"]
            if s["prefill_s"]
            else 0.0,
            "decode_tok_per_s": s["decode_tokens"] / s["decode_s"]
            if s["decode_s"]
            else 0.0,
            **s,
        }

    @property
    def stats(self) -> dict:
        """Structured engine state (SURVEY.md §5: the reference only has a
        tqdm postfix; serving stacks need batch/blocks/cache visibility)."""
        sched = self.scheduler
        bms = (
            [g.block_manager for g in sched.groups]
            if hasattr(sched, "groups")
            else [sched.block_manager]
        )
        queries = sum(bm.prefix_cache_queries for bm in bms)
        return {
            **self.throughput,
            "waiting": len(sched.waiting),
            "running": len(sched.running),
            "preemptions": sched.num_preemptions,
            "blocks_total": sum(bm.num_blocks for bm in bms),
            "blocks_free": sum(bm.num_free_blocks for bm in bms),
            "prefix_cache_hit_rate": (
                sum(bm.prefix_cache_hits for bm in bms) / queries
                if queries
                else 0.0
            ),
            "last_step": dict(self.model_runner.last_step_stats),
        }

    def start_profile(self, trace_dir: str) -> None:
        """Capture a device trace of subsequent steps (jax.profiler;
        viewable in XProf/TensorBoard)."""
        import jax

        jax.profiler.start_trace(trace_dir)

    def stop_profile(self) -> None:
        import jax

        jax.profiler.stop_trace()

    def exit(self) -> None:
        # No worker processes or SHM to tear down (single-controller JAX).
        pass
