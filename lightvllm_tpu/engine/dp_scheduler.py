"""Data-parallel scheduling: DP independent continuous-batching groups
behind one engine step.

The reference has no data parallelism (SURVEY.md §2.4); this implements the
TPU-native version of the BASELINE multi-chip serving story: weights are
replicated over the mesh "data" axis (they are sharded only on "model",
parallel/sharding.py), each data group owns a private slice of the paged KV
pool, and one jitted dispatch steps every group at once — group-stacked
inputs vmapped over a leading axis that GSPMD shards on "data"
(engine/runner.py). Scheduling stays deterministic pure Python: requests
are routed to the least-loaded group at admission, and every group runs the
same phase each step (a prefill step admits on all groups that have waiting
work; a decode step advances every group with running sequences).

Synchronized phases are the one simplification vs. fully independent
per-group loops: a group with only running sequences idles for one step
while another group prefills. Groups drain their admission queues in the
same step, so sustained mixed phases cannot starve either side.
"""

from __future__ import annotations

from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.scheduler import Scheduler
from lightvllm_tpu.engine.sequence import Sequence


class DataParallelScheduler:
    """Same surface as Scheduler, but schedule() returns per-group lists."""

    def __init__(self, config: Config, dp_size: int):
        assert dp_size >= 1
        assert config.num_kvcache_blocks >= dp_size, (
            "fewer KV blocks than data-parallel groups"
        )
        self.dp_size = dp_size
        # Each group owns num_blocks // dp of the pool; block ids are LOCAL
        # to the group (the cache carries a leading (DP,) axis).
        import copy

        self.groups: list[Scheduler] = []
        for _ in range(dp_size):
            gcfg = copy.copy(config)
            gcfg.num_kvcache_blocks = config.num_kvcache_blocks // dp_size
            self.groups.append(Scheduler(gcfg))

    # -- aggregate views -------------------------------------------------

    @property
    def block_manager(self):  # stats compatibility (first group)
        return self.groups[0].block_manager

    @property
    def waiting(self):
        return [s for g in self.groups for s in g.waiting]

    @property
    def running(self):
        return [s for g in self.groups for s in g.running]

    @property
    def num_preemptions(self) -> int:
        return sum(g.num_preemptions for g in self.groups)

    def is_finished(self) -> bool:
        return all(g.is_finished() for g in self.groups)

    def add(self, seq: Sequence) -> None:
        """Route to the least-loaded group (waiting + running count)."""
        g = min(self.groups, key=lambda g: len(g.waiting) + len(g.running))
        g.add(seq)

    # -- stepping --------------------------------------------------------

    def schedule(self) -> tuple[list[list[Sequence]], bool, int]:
        """Returns (per-group scheduled lists, is_prefill, window).

        Phase rule: prefill if ANY group can admit waiting work this step;
        groups with nothing to do contribute an empty list (the runner pads
        them). Decode windows are the min over active groups so every
        group's fused scan stays in lockstep in the single dispatch.
        """
        # Single shared predicate (Scheduler.can_admit) so the phase vote
        # cannot diverge from what each group's schedule() then does.
        admitting = [g for g in self.groups if g.can_admit()]
        if admitting:
            out: list[list[Sequence]] = []
            for g in self.groups:
                if g in admitting:
                    seqs, is_prefill, _ = g.schedule()
                    assert is_prefill
                    out.append(seqs)
                else:
                    out.append([])
            return out, True, 1

        out = []
        window = None
        for g in self.groups:
            if g.running or g.waiting:
                seqs, is_prefill, w = g.schedule()
                assert not is_prefill
                out.append(seqs)
                window = w if window is None else min(window, w)
            else:
                out.append([])
        if window is None:
            raise AssertionError("schedule() called on a finished engine")
        return out, False, window

    def postprocess(self, group_seqs: list[list[Sequence]], group_tokens) -> int:
        appended = 0
        for g, seqs, tokens in zip(self.groups, group_seqs, group_tokens):
            if seqs:
                appended += g.postprocess(seqs, tokens)
        return appended
