"""Data-parallel engine tests on the virtual 8-device CPU mesh.

The reference has no data parallelism (SURVEY.md §2.4). Here dp>1 must
reproduce the single-engine greedy outputs exactly: requests are routed to
per-group schedulers, and each group is an independent (scheduler, runner,
dispatch-queue) triple on its own sub-mesh with a private KV pool and
fully independent phases (engine/llm_engine.py, engine/dp_scheduler.py).
"""

import pytest

import jax

from lightvllm_tpu import SamplingParams
from lightvllm_tpu.engine.llm_engine import LLMEngine
from lightvllm_tpu.models import qwen3

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
    ),
]

BS = 16


def tiny_spec():
    return qwen3.ModelSpec(
        num_layers=2,
        hidden_size=64,
        num_q_heads=8,
        num_kv_heads=8,
        head_dim=16,
        intermediate_size=128,
        vocab_size=128,
        rope_theta=10000.0,
        rms_eps=1e-6,
        tie_word_embeddings=True,
        dtype="float32",
    )


def make_engine(spec, params, tp=1, dp=1, **kw):
    return LLMEngine(
        spec=spec,
        params=params,
        kvcache_block_size=BS,
        num_kvcache_blocks=64,
        max_model_len=128,
        max_num_seqs=4,
        eos=127,
        tensor_parallel_size=tp,
        data_parallel_size=dp,
        **kw,
    )


@pytest.fixture(scope="module")
def spec_and_params():
    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    return spec, params


PROMPTS = [
    [1, 5, 9, 2, 7],
    [3, 1, 4, 1, 5, 9, 2, 6],
    [11, 12],
    [7] * 17,  # crosses a block boundary
    [2, 4, 6],
]


def run_greedy(engine, prompts, n=8):
    res = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True),
        use_tqdm=False,
    )
    return [r["token_ids"] for r in res]


def test_dp2_matches_single_engine(spec_and_params):
    spec, params = spec_and_params
    ref = run_greedy(make_engine(spec, params), PROMPTS)
    dp = run_greedy(make_engine(spec, params, dp=2), PROMPTS)
    assert dp == ref


def test_dp2_tp4_matches_single_engine(spec_and_params):
    """The full mesh: 2 data groups x 4-way tensor parallel."""
    spec, params = spec_and_params
    ref = run_greedy(make_engine(spec, params), PROMPTS)
    dp = run_greedy(make_engine(spec, params, tp=4, dp=2), PROMPTS)
    assert dp == ref


def test_dp_cache_and_routing(spec_and_params):
    spec, params = spec_and_params
    engine = make_engine(spec, params, dp=2)
    # One independent runner per group, each with a private half-pool.
    assert len(engine.runners) == 2
    for runner in engine.runners:
        assert runner.cache.k[0].shape[0] == 64 // 2
    # Groups live on disjoint devices.
    devs = [
        {d for arr in r.cache.k for d in arr.devices()}
        for r in engine.runners
    ]
    assert devs[0].isdisjoint(devs[1])
    for p in PROMPTS:
        engine.add_request(
            p, SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
        )
    sizes = [len(g.waiting) for g in engine.scheduler.groups]
    assert sorted(sizes) == [2, 3]  # least-loaded routing balances groups
    while not engine.is_finished():
        engine.step()
    stats = engine.stats
    assert stats["blocks_total"] == 64
    assert stats["blocks_free"] == 64  # all freed after finish


def test_dp2_mixed_phase_progress(spec_and_params):
    """A late add_request while other groups decode: the engine must
    prefill the newcomer and still finish everything."""
    spec, params = spec_and_params
    engine = make_engine(spec, params, dp=2)
    first = [
        engine.add_request(
            p, SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
        )
        for p in PROMPTS[:2]
    ]
    engine.step()  # prefill both groups
    engine.add_request(
        PROMPTS[2],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
    )
    done = {}
    while not engine.is_finished():
        finished, _, _ = engine.step()
        done.update(dict(finished))
    assert len(done) == 3
    ref = run_greedy(make_engine(spec, params), PROMPTS[:3], n=12)
    assert done[first[0]] == ref[0]
    assert done[first[1]] == ref[1]


def test_dp2_warmup_and_probe_shapes(spec_and_params):
    """Every DP group's runner warms the decode shape grid and AOT-probes
    activation peaks independently (VERDICT r2 weak#4: both were skipped
    for dp>1, re-opening mid-serving compile stalls and the OOM-at-first-
    max-batch risk)."""
    spec, params = spec_and_params
    engine = make_engine(spec, params, dp=2, decode_window=2)
    runner = engine.runners[1]
    # force=True: exercise the warmup shapes on the CPU backend (on TPU
    # this runs automatically at init).
    runner.warmup_decode_shapes(force=True)
    # The probe lowers the worst-case group-stacked executables; on
    # backends without AOT memory analysis it falls back to 0.
    assert runner._probe_activation_bytes() >= 0
    # The engine still serves correctly after the warmup wrote dummy KV.
    outs = engine.generate(
        [[1, 5, 9], [2, 7]],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
        use_tqdm=False,
    )
    assert all(len(o["token_ids"]) == 4 for o in outs)


def test_dp2_desynced_phases(spec_and_params):
    """One group's prefill must NOT drain another group's in-flight decode
    windows: with dp=2, group A decoding with speculated windows queued and
    a newcomer routed to (empty) group B, the next step prefills B while
    A's queue stays live (the r3 vmapped design lock-stepped phases, so a
    prefill anywhere idled every decoding group for that step)."""
    spec, params = spec_and_params
    engine = make_engine(spec, params, dp=2, decode_window=2)
    a = engine.add_request(
        PROMPTS[0],
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
    )
    engine.step()  # prefill group A
    engine.step()  # decode window A; speculation fills A's queue
    qa = next(q for q in engine._pending if q)
    assert len(qa) >= 1
    depth_before = len(qa)
    b = engine.add_request(
        PROMPTS[2],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
    )
    finished, n, is_prefill = engine.step()
    assert is_prefill  # B prefilled...
    assert len(qa) >= depth_before  # ...without draining A's queue
    done = dict(finished)
    while not engine.is_finished():
        f, _, _ = engine.step()
        done.update(dict(f))
    ref = run_greedy(make_engine(spec, params), [PROMPTS[0]], n=16)
    refb = run_greedy(make_engine(spec, params), [PROMPTS[2]], n=4)
    assert done[a] == ref[0] and done[b] == refb[0]
