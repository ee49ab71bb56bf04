"""Continuous-batching scheduler.

Parity: reference `lightvllm/engine/scheduler.py:36-134` — prefill-first
admission (FIFO drain of waiting subject to max_num_seqs /
max_num_batched_tokens / can_allocate), decode batching over the running
deque, recompute-only preemption of the lowest-priority (tail) running
sequence when no block is free, postprocess finishing on EOS/max_tokens.

A step schedules either ONE prefill batch or ONE decode batch, never mixed —
this maps directly onto the two jit-compiled step shapes on TPU.
"""

from __future__ import annotations

from collections import deque

from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.block_manager import BlockManager
from lightvllm_tpu.engine.sequence import Sequence, SequenceStatus


class Scheduler:
    def __init__(self, config: Config):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        self.decode_window = max(1, config.decode_window)
        self.prefill_chunk_tokens = config.prefill_chunk_tokens
        # Chunk/decode alternation: after a PARTIAL prompt chunk, yield one
        # step to the running decodes before the next chunk — otherwise
        # prefill-first priority runs all chunks back-to-back and the total
        # decode stall equals the unchunked one (just split into steps).
        self._chunk_yield = False
        assert config.num_kvcache_blocks > 0, "num_kvcache_blocks must be set"
        self.block_manager = BlockManager(
            config.num_kvcache_blocks, config.kvcache_block_size
        )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        self.num_preemptions = 0

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence) -> None:
        # Enforced here rather than hardcoded class attrs (reference quirk,
        # SURVEY.md §2.9.3): the sequence's block math must match the pool's.
        assert seq.block_size == self.block_manager.block_size
        self.waiting.append(seq)

    def preempt(self, seq: Sequence) -> None:
        """Recompute-only preemption: drop all KV blocks, requeue at the
        front of waiting for full re-prefill (no swap-to-host)."""
        self.num_preemptions += 1
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        self.waiting.appendleft(seq)

    def admission_watermark(self) -> int:
        """Blocks kept free past a prompt's own needs at admission: ~1% of
        the pool (>= 1 block per running seq's next append), so admission
        cannot drive decode into window-shrink + preemption thrash. Empty
        engine: nothing to protect, admit to the brim."""
        if not self.running:
            return 0
        return max(self.block_manager.num_blocks // 100, len(self.running) + 1)

    def can_admit(self) -> bool:
        """True when the head of waiting would be admitted by schedule()'s
        prefill phase. The single predicate shared with
        DataParallelScheduler's phase vote — keeping them one definition
        means the vote can never diverge from what schedule() then does."""
        if not self.waiting:
            return False
        if self.waiting[0].prefill_end is not None:
            return True  # mid-chunk prompt: already allocated, must continue
        return self.block_manager.can_allocate(
            self.waiting[0], spare=self.admission_watermark()
        )

    def schedule(self) -> tuple[list[Sequence], bool, int]:
        """Returns (scheduled sequences, is_prefill, window).

        window is the number of decode steps the runner should fuse into one
        device dispatch (1 for prefill). Multi-step decode is the TPU analog
        of the reference's CUDA-graph replay (SURVEY.md §2.8) taken further:
        it amortizes host->device dispatch AND keeps the sampled-token
        feedback loop on device for `window` steps.
        """
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0

        # Phase 1: prefill admission (strictly preempts decode scheduling).
        # The watermark guards the decode phase against admission-driven
        # window-shrink + recompute-preemption thrash (measured collapse:
        # b64 x 1024-token prompts in an exactly-sized pool fell to
        # 76 tok/s). The reference admits to the last block
        # (scheduler.py:72-90) and thrashes the same way.
        watermark = self.admission_watermark()
        bs = self.block_manager.block_size
        if self._chunk_yield:
            self._chunk_yield = False
            if self.running and self.waiting:
                return self._schedule_decode()
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            mid_chunk = seq.prefill_end is not None
            if not mid_chunk and not self.block_manager.can_allocate(
                seq, spare=watermark
            ):
                break
            # Per-step prompt-token budget: chunked prefill
            # (prefill_chunk_tokens > 0) caps the tokens one step processes
            # so a long prompt cannot stall every running decode for a full
            # max-length step; the reference prefills whole prompts only
            # (SURVEY.md §2.7). Chunks end on page boundaries (whole-page
            # KV writes); a partial prompt stays at the head of waiting.
            room = self.max_num_batched_tokens - num_batched_tokens
            if self.prefill_chunk_tokens:
                room = min(room, self.prefill_chunk_tokens - num_batched_tokens)
            if mid_chunk:
                # Register the blocks the previous chunk wrote, then resume.
                self.block_manager.register_prefill_hashes(
                    seq, seq.num_cached_tokens
                )
                start = seq.num_cached_tokens
            else:
                # Probe prefix hits BEFORE allocating so hash registration
                # can be bounded to what this chunk writes (see
                # BlockManager.allocate register_upto).
                start = self.block_manager.count_prefix_hits(seq)
            remaining = len(seq) - start
            if remaining <= room:
                take = remaining
            elif not self.prefill_chunk_tokens:
                # Chunking disabled: whole-prompt admission only (reference
                # semantics) — stop when the next prompt cannot fit the
                # remaining batch-token budget.
                break
            else:
                take = (room // bs) * bs
            if take <= 0:
                break
            partial = take < remaining
            end = start + take
            if not mid_chunk:
                # Count only uncached tokens against the batch-token budget;
                # a prefix-cache hit makes admission cheaper (reference
                # scheduler.py:82).
                self.block_manager.allocate(
                    seq, register_upto=end if partial else None
                )
                assert seq.num_cached_tokens == start, "probe/allocate skew"
            num_seqs += 1
            num_batched_tokens += take
            scheduled.append(seq)
            if partial:
                seq.prefill_end = end
                # Yield the next step to the running decodes (alternation;
                # see _chunk_yield) so the long prompt's chunks interleave
                # with decode windows instead of stalling them end-to-end.
                self._chunk_yield = bool(self.running)
                break  # budget exhausted; the partial prompt keeps the head
            seq.prefill_end = None
            seq.status = SequenceStatus.RUNNING
            self.waiting.popleft()
            self.running.append(seq)
        if scheduled:
            return scheduled, True, 1
        return self._schedule_decode()

    def _schedule_decode(self) -> tuple[list[Sequence], bool, int]:
        # Decode batching over an n-step window. The window shrinks to the
        # smallest remaining token budget in the batch so no step is wasted
        # past a sequence's max_tokens.
        scheduled: list[Sequence] = []
        num_seqs = 0
        if not self.running:
            if self.waiting:
                # A waiting sequence that can never be admitted (its prompt
                # needs more blocks than the whole pool) — a config problem,
                # not a caller bug.
                raise RuntimeError(
                    "KV cache too small: a waiting prompt needs more blocks "
                    "than the pool holds (increase num_kvcache_blocks or "
                    "reduce max_model_len)"
                )
            raise AssertionError("schedule() called on a finished engine")
        window = self.decode_window
        for seq in self.running:
            window = min(window, max(1, seq.max_tokens - seq.num_completion_tokens))
        # Round down to a power of two: each distinct window is its own
        # compiled executable, so cap the shape count at log2(decode_window).
        window = 1 << (window.bit_length() - 1)
        # Under memory pressure, shrink the window before resorting to
        # preemption: a shorter window needs fewer pre-allocated pages.
        while window > 1 and (
            sum(self.block_manager.blocks_needed_for_append(s, window) for s in self.running)
            > self.block_manager.num_free_blocks
        ):
            window //= 2
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            preempted_self = False
            while not self.block_manager.can_append(seq, window):
                if self.running:
                    self.preempt(self.running.pop())
                else:
                    self.preempt(seq)
                    preempted_self = True
                    break
            if preempted_self:
                break
            num_seqs += 1
            self.block_manager.may_append(seq, window)
            scheduled.append(seq)
        if not scheduled:
            # Only reachable when a lone sequence outgrew the entire pool:
            # recompute-preemption needs strictly more blocks than it freed,
            # so this cannot resolve. Surface it instead of looping forever.
            raise RuntimeError(
                "KV cache too small: a single sequence exceeds the block pool "
                "(increase num_kvcache_blocks or reduce max_model_len)"
            )
        # Re-insert at the front of running, preserving priority order.
        self.running.extendleft(reversed(scheduled))
        return scheduled, False, window

    def speculate_next_window(
        self, seqs: list[Sequence], window: int, inflight: int = 1
    ) -> bool:
        """Reserve ANOTHER fused decode window for the same batch before
        the in-flight windows' tokens are known (pipelined decode,
        `Config.async_decode`). `inflight` is the number of windows already
        dispatched but not yet postprocessed — their appends are not
        reflected in the sequences, so every horizon below spans
        (inflight + 1) windows. Returns True only when the schedule()
        after those windows land is provably this same (seqs, window)
        decode step:

          - nothing is waiting (the next step cannot be a prefill, and a
            request added later still dispatches after the speculated
            window — device execution order makes its freshly-allocated
            pages safe);
          - the running deque IS `seqs` (no capped-out stragglers whose
            turn it would be, no sequence finished since dispatch);
          - no sequence can hit max_tokens within ANY of the
            (inflight + 1) windows (so the window size provably repeats).
            An EOS finish inside an in-flight window is the one
            unpredictable event, and it is benign: that slot computes up
            to `inflight` windows of garbage that postprocess discards
            (`is_finished` skip), and its pages are freed only at that
            window's postprocess — after the speculated dispatches are
            already enqueued, so device order protects any reuse;
          - all (inflight + 1) windows' pages fit in the free pool WITHOUT
            preemption (speculation never preempts — under pressure it
            just declines and the next real schedule() applies policy).

        On success the block tables are pre-extended (`may_append` with an
        (inflight + 1)-window horizon) so the shifted window's KV writes
        all have physical pages. Hash registration of blocks that fill during the
        first window self-defers: their token ids are not known yet, and
        `may_append` only registers token-complete blocks, so the next
        non-speculative schedule registers them."""
        if self.waiting:
            return False
        if len(self.running) != len(seqs) or any(
            a is not b for a, b in zip(self.running, seqs)
        ):
            return False
        horizon = (inflight + 1) * window
        for s in seqs:
            if s.max_tokens - s.num_completion_tokens < horizon:
                return False
        bm = self.block_manager
        if (
            sum(bm.blocks_needed_for_append(s, horizon) for s in seqs)
            > bm.num_free_blocks
        ):
            return False
        for s in seqs:
            bm.may_append(s, horizon)
        return True

    def postprocess(self, seqs: list[Sequence], token_ids) -> int:
        """Apply sampled tokens. token_ids is (B,) for a single step or
        (window, B) for a fused decode window; tokens sampled after a
        sequence finished mid-window are discarded. Returns the number of
        tokens actually appended."""
        if token_ids and not isinstance(token_ids[0], (list, tuple)):
            token_ids = [token_ids]
        appended = 0
        any_finished = False
        for step_tokens in token_ids:
            for seq, token_id in zip(seqs, step_tokens):
                if seq.is_finished:
                    continue
                if seq.status == SequenceStatus.WAITING:
                    # Mid-chunk prefill: the sampled token predicts a prompt
                    # token we already have — discard it, advance the
                    # processed-token cursor; the prompt continues from
                    # prefill_end at the next prefill step.
                    seq.num_cached_tokens = seq.prefill_end
                    continue
                seq.append_token(token_id)
                appended += 1
                hit_stop = token_id in seq.stop_token_ids or (
                    not seq.ignore_eos and token_id == self.eos
                )
                if hit_stop or seq.num_completion_tokens >= seq.max_tokens:
                    seq.status = SequenceStatus.FINISHED
                    self.block_manager.deallocate(seq)
                    any_finished = True
        if any_finished:
            # One O(n) filter pass instead of deque.remove() per finished
            # sequence (O(n) each — O(n^2) when a large batch drains at once).
            self.running = deque(s for s in self.running if not s.is_finished)
        return appended
