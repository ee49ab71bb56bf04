"""Data-parallel request routing over independent per-group schedulers.

The reference has no data parallelism (SURVEY.md §2.4); this implements the
TPU-native version of the BASELINE multi-chip serving story: LLMEngine
instantiates one (Scheduler, ModelRunner) pair per data group — each runner
on its own ("model",)-axis sub-mesh with a private KV pool — and drives the
groups with fully INDEPENDENT phases: a group can prefill while another
group's pipelined decode windows are still in flight on its own devices
(engine/llm_engine.py step()). This class is only the request router and
the aggregate stats view; scheduling itself happens per group.

(r3 note: the previous design stacked inputs on a leading (DP,) axis and
vmapped one dispatch over all groups — which forced lock-stepped phases,
disabled pipelined decode, and pinned attention to the GSPMD jnp-oracle
path. Independent per-group dispatch queues remove all three limits; the
host dispatches asynchronously, so groups genuinely overlap on device.)
"""

from __future__ import annotations

from lightvllm_tpu.engine.scheduler import Scheduler
from lightvllm_tpu.engine.sequence import Sequence


class DataParallelScheduler:
    """Routes requests to per-group Schedulers; aggregates their views."""

    def __init__(self, groups: list[Scheduler]):
        assert groups
        self.groups = groups

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
