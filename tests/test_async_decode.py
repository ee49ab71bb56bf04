"""Pipelined (speculative) decode must be bit-identical to synchronous.

`Config.async_decode` dispatches window N+1 — fed by window N's
device-resident last token row — before fetching window N (VERDICT r2
next#8, the TPU answer to the reference's async-H2D prep overlap,
`lightvllm/engine/model_runner.py:335-364`). These tests drive both modes
over the same tiny model and require identical token streams through every
hazard: EOS mid-window, max_tokens landing inside a window, a request
arriving mid-serving, and block-pool pressure that declines speculation.
"""

import jax
import pytest

import lightvllm_tpu  # noqa: F401  (conftest pins the cpu backend)
from lightvllm_tpu import SamplingParams
from lightvllm_tpu.engine.llm_engine import LLMEngine
from lightvllm_tpu.models import qwen3

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'


def tiny_spec():
    return qwen3.ModelSpec(
        num_layers=2, hidden_size=64, num_q_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, vocab_size=128, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="float32",
    )


@pytest.fixture(scope="module")
def spec_params():
    spec = tiny_spec()
    return spec, qwen3.init_params(spec, jax.random.PRNGKey(0))


def make_engine(spec_params, async_decode, **kw):
    spec, params = spec_params
    kw.setdefault("kvcache_block_size", 16)
    kw.setdefault("num_kvcache_blocks", 64)
    kw.setdefault("max_model_len", 64)
    kw.setdefault("max_num_seqs", 4)
    kw.setdefault("decode_window", 4)
    return LLMEngine(
        spec=spec, params=params, eos=127, async_decode=async_decode, **kw
    )


def run_both(spec_params, prompts, sp, **kw):
    outs = []
    for mode in (False, True):
        eng = make_engine(spec_params, mode, **kw)
        outs.append(eng.generate(prompts, sp, use_tqdm=False))
    sync, pipelined = outs
    for a, b in zip(sync, pipelined):
        assert a["token_ids"] == b["token_ids"]
    return sync


def test_greedy_parity_and_speculation_engaged(spec_params):
    prompts = [list(range(1, 9)), list(range(3, 20)), [5, 6, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    # Parity across an odd max_tokens so the final window shrinks.
    run_both(spec_params, prompts, sp)
    # And the pipelined engine must actually speculate in steady state.
    eng = make_engine(spec_params, True)
    for p in prompts:
        eng.add_request(p, sp)
    saw_speculated = False
    while not eng.is_finished():
        eng.step()
        saw_speculated |= bool(
            eng.model_runner.last_step_stats.get("speculated")
        )
    assert saw_speculated, "async_decode never overlapped a window"


def test_eos_mid_window_discards_speculated_tokens(spec_params):
    """Force a stop token mid-window: the speculated window for the drained
    slot computes garbage that postprocess must discard."""
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    probe = run_both(
        spec_params, prompts,
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
    )
    # Pick a token that appears mid-stream (not on a window boundary) in
    # sequence 0 and make it a stop token for both engines.
    stop = probe[0]["token_ids"][5]
    sp = SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        stop_token_ids=[stop],
    )
    sync = run_both(spec_params, prompts, sp)
    assert sync[0]["token_ids"][-1] == stop
    assert len(sync[0]["token_ids"]) <= 16


def test_max_tokens_exact_two_windows(spec_params):
    """max_tokens == 2*window: speculation covers exactly the final window
    and the sequence must finish without an extra garbage window."""
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = run_both(spec_params, [[1, 2, 3]], sp)
    assert len(outs[0]["token_ids"]) == 8


def test_request_added_mid_serving(spec_params):
    """A request arriving while a speculated window is in flight must drain
    the pending window, then prefill — token streams identical to sync."""
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    results = {}
    for mode in (False, True):
        eng = make_engine(spec_params, mode)
        first = eng.add_request([1, 2, 3, 4, 5], sp)
        done = {}
        steps = 0
        second = None
        while not eng.is_finished():
            finished, _, _ = eng.step()
            for sid, toks in finished:
                done[sid] = toks
            steps += 1
            if steps == 2 and second is None:
                second = eng.add_request([11, 12, 13], sp)
        results[mode] = (done[first], done[second])
    assert results[False] == results[True]


def test_block_pressure_declines_speculation(spec_params):
    """A pool too small for a two-window horizon: speculation declines (no
    preemption from the speculative path) and output still matches."""
    prompts = [list(range(1, 17)), list(range(21, 37))]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    run_both(
        spec_params, prompts, sp,
        num_kvcache_blocks=8, kvcache_block_size=16,
    )


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_depth_sweep_parity(spec_params, depth):
    """Every pipeline depth must produce the synchronous token stream,
    including depths deeper than the remaining request lifetime."""
    prompts = [list(range(1, 9)), [5, 6, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    sync = make_engine(spec_params, False).generate(
        prompts, sp, use_tqdm=False
    )
    piped = make_engine(
        spec_params, True, async_decode_depth=depth
    ).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(sync, piped):
        assert a["token_ids"] == b["token_ids"]


def test_depth2_chains_multiple_windows(spec_params):
    """With depth 2 and a long run, the engine must hold two speculated
    windows in flight (the pending queue reaches the configured depth)."""
    eng = make_engine(spec_params, True, async_decode_depth=2)
    eng.add_request(
        [1, 2, 3],
        SamplingParams(temperature=0.0, max_tokens=48, ignore_eos=True),
    )
    max_q = 0
    while not eng.is_finished():
        eng.step()
        max_q = max(max_q, len(eng._pending[0]))
    assert max_q == 2, f"pipeline never reached depth 2 (max {max_q})"
