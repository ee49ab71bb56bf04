"""Unit tests for the continuous-batching scheduler (reference has none)."""

from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.scheduler import Scheduler
from lightvllm_tpu.engine.sequence import Sequence, SequenceStatus
from lightvllm_tpu.sampling_params import SamplingParams

BS = 16


def make_config(**kw):
    defaults = dict(
        max_num_batched_tokens=64,
        max_num_seqs=4,
        max_model_len=64,
        kvcache_block_size=BS,
        num_kvcache_blocks=8,
        eos=0,
    )
    defaults.update(kw)
    return Config(**defaults)


def make_seq(n_tokens, **kw):
    return Sequence(
        [i + 1 for i in range(n_tokens)], SamplingParams(**kw), block_size=BS
    )


def test_prefill_first_then_decode():
    sched = Scheduler(make_config())
    s1, s2 = make_seq(8), make_seq(8)
    sched.add(s1)
    sched.add(s2)
    seqs, is_prefill, window = sched.schedule()
    assert is_prefill and seqs == [s1, s2]
    assert all(s.status == SequenceStatus.RUNNING for s in seqs)
    sched.postprocess(seqs, [5, 6])
    seqs, is_prefill, window = sched.schedule()
    assert not is_prefill and seqs == [s1, s2]


def test_token_budget_limits_prefill_admission():
    sched = Scheduler(make_config(max_num_batched_tokens=64, max_model_len=60))
    big, small = make_seq(60), make_seq(30)
    sched.add(big)
    sched.add(small)
    seqs, is_prefill, window = sched.schedule()
    # 60 + 30 > 64: only the first fits this step (FIFO, no reorder).
    assert is_prefill and seqs == [big]
    sched.postprocess(seqs, [5])
    seqs, is_prefill, window = sched.schedule()
    assert is_prefill and seqs == [small]


def test_max_num_seqs_limits_admission():
    sched = Scheduler(make_config(max_num_seqs=2, num_kvcache_blocks=16))
    seqs_in = [make_seq(4) for _ in range(3)]
    for s in seqs_in:
        sched.add(s)
    seqs, is_prefill, window = sched.schedule()
    assert is_prefill and len(seqs) == 2


def test_eos_finishes_sequence():
    sched = Scheduler(make_config())
    s = make_seq(4)
    sched.add(s)
    seqs, _, _ = sched.schedule()
    sched.postprocess(seqs, [0])  # eos = 0
    assert s.is_finished
    assert sched.is_finished()
    assert sched.block_manager.num_free_blocks == 8


def test_ignore_eos_and_max_tokens():
    sched = Scheduler(make_config())
    s = make_seq(4, ignore_eos=True, max_tokens=2)
    sched.add(s)
    seqs, _, _ = sched.schedule()
    sched.postprocess(seqs, [0])
    assert not s.is_finished  # eos ignored
    sched.schedule()
    sched.postprocess([s], [0])
    assert s.is_finished  # max_tokens reached


def test_preemption_frees_lowest_priority_tail():
    # 4 blocks of 16 tokens; two seqs of 17 tokens each use 2 blocks each.
    sched = Scheduler(make_config(num_kvcache_blocks=4, max_num_batched_tokens=64))
    s1, s2 = make_seq(16), make_seq(16)
    sched.add(s1)
    sched.add(s2)
    seqs, is_prefill, window = sched.schedule()
    assert is_prefill and len(seqs) == 2
    sched.postprocess(seqs, [5, 6])  # both now 17 tokens -> each needs block 2
    seqs, is_prefill, window = sched.schedule()
    assert not is_prefill
    # s1 grabs a new block; s2 grabs the last one. Next growth forces preempt.
    sched.postprocess(seqs, [7, 8])  # 18 tokens, rem 2: no new block yet
    for _ in range(20):
        seqs, is_prefill, window = sched.schedule()
        if is_prefill or sched.num_preemptions:
            break
        sched.postprocess(seqs, [9] * len(seqs))
    # At some point s2 (tail) must have been preempted back to waiting.
    assert sched.num_preemptions >= 1


def test_lone_sequence_outgrowing_pool_raises():
    import pytest

    sched = Scheduler(make_config(num_kvcache_blocks=2, max_num_batched_tokens=64))
    s = make_seq(31)  # 2 blocks: 16 + 15
    sched.add(s)
    seqs, is_prefill, window = sched.schedule()
    assert is_prefill
    sched.postprocess(seqs, [5])  # 32 tokens: fills block 2 exactly
    seqs, is_prefill, window = sched.schedule()
    assert not is_prefill  # rem 0: no new block needed yet
    sched.postprocess(seqs, [5])  # 33 tokens -> needs a 3rd block, none exists
    with pytest.raises(RuntimeError, match="KV cache too small"):
        sched.schedule()
    assert sched.num_preemptions >= 1


def test_prefix_cached_admission_counts_uncached_only():
    sched = Scheduler(make_config(max_num_batched_tokens=64, num_kvcache_blocks=16))
    toks = list(range(1, 49))  # 48 tokens = 3 full blocks
    a = Sequence(toks, SamplingParams(), block_size=BS)
    sched.add(a)
    seqs, _, _ = sched.schedule()
    sched.postprocess(seqs, [0])  # finish via eos, blocks freed but cached
    b = Sequence(toks + [100] * 30, SamplingParams(), block_size=BS)
    c = Sequence(toks[:32] + [7], SamplingParams(), block_size=BS)
    sched.add(b)
    sched.add(c)
    seqs, is_prefill, window = sched.schedule()
    # b: 78 total but 48 cached -> 30 new. c: 33 total, 32 cached -> 1 new.
    # 30 + 1 <= 64 even though totals exceed the budget.
    assert is_prefill and len(seqs) == 2
    assert b.num_cached_tokens == 48
    assert c.num_cached_tokens == 32
