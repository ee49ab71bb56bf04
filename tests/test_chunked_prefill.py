"""Chunked prefill (Config.prefill_chunk_tokens) — serving QoS.

The reference prefills whole prompts only (SURVEY.md §2.7), so one
max-length prompt stalls every running decode for a full step. Chunking
caps the prompt tokens per prefill step; a partial prompt stays at the
head of waiting and continues next prefill step. Tokens must be EXACTLY
the unchunked engine's (attention masks each chunk at its processed end).
"""

import pytest

import jax

from lightvllm_tpu import SamplingParams
from lightvllm_tpu.engine.llm_engine import LLMEngine
from lightvllm_tpu.models import qwen3

pytestmark = pytest.mark.slow  # core lane: pytest -m 'not slow'

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


@pytest.fixture(scope="module")
def spec_and_params():
    spec = tiny_spec()
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    return spec, params


def make_engine(spec, params, chunk=0, **kw):
    return LLMEngine(
        spec=spec,
        params=params,
        kvcache_block_size=BS,
        num_kvcache_blocks=96,
        max_model_len=128,
        max_num_seqs=8,
        eos=127,
        prefill_chunk_tokens=chunk,
        **kw,
    )


def run_greedy(engine, prompts, n=6):
    res = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True),
        use_tqdm=False,
    )
    return [r["token_ids"] for r in res]


# Prompts chosen to cross chunk boundaries: 3 blocks + partial, exactly 2
# chunks, shorter than one chunk, and a shared 2-block prefix pair.
LONG = [(i * 7 + 3) % 126 + 1 for i in range(BS * 3 + 5)]
PROMPTS = [
    LONG,
    [(i * 5 + 1) % 126 + 1 for i in range(BS * 2)],
    [1, 5, 9],
]
SHARED_PREFIX = LONG[: BS * 2]
PROMPTS_SHARED = [LONG, SHARED_PREFIX + [99, 98, 97]]


def test_chunked_matches_unchunked(spec_and_params):
    spec, params = spec_and_params
    ref = run_greedy(make_engine(spec, params), PROMPTS)
    for chunk in (BS, 2 * BS):
        got = run_greedy(make_engine(spec, params, chunk=chunk), PROMPTS)
        assert got == ref, f"chunk={chunk}"


def test_chunked_prefix_cache_sharing(spec_and_params):
    """A prompt sharing a chunked prompt's prefix must (a) produce exact
    tokens and (b) actually hit the cache — and never read pages a chunk
    has not written yet (hash registration is bounded per chunk)."""
    spec, params = spec_and_params
    ref = run_greedy(make_engine(spec, params), PROMPTS_SHARED)
    eng = make_engine(spec, params, chunk=BS)
    got = run_greedy(eng, PROMPTS_SHARED)
    assert got == ref
    assert eng.scheduler.block_manager.prefix_cache_hits >= 2


def test_chunk_steps_bounded(spec_and_params):
    """No prefill step processes more than prefill_chunk_tokens tokens, and
    decode windows run BETWEEN a long prompt's chunks when another request
    is already decoding (the whole point: the long prompt cannot stall
    running decodes for its full length)."""
    spec, params = spec_and_params
    eng = make_engine(spec, params, chunk=BS)
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    eng.add_request([2, 4, 6], sp)  # short: prefills + decodes first
    # One step: prefill the short prompt.
    _, n0, p0 = eng.step()
    assert p0 and n0 == 3
    # Now add the long prompt; its chunks must interleave with decode.
    eng.add_request(LONG, SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))
    phases = []
    while not eng.is_finished():
        _, n, is_prefill = eng.step()
        phases.append((is_prefill, n))
        if is_prefill:
            assert n <= BS, f"chunk budget exceeded: {n}"
    kinds = [p for p, _ in phases]
    # The long prompt needs ceil(53/16)=4 chunks; decode happens in between.
    assert kinds.count(True) >= 4
    first_decode = kinds.index(False)
    assert True in kinds[first_decode:], "no chunk ran after decode started"


def test_chunked_with_pipelined_decode_and_preemption_safety(spec_and_params):
    """Chunked prefill + async decode + small pool: still exact tokens."""
    spec, params = spec_and_params
    prompts = [LONG, PROMPTS[1], [7] * 20, [3, 1, 4]]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    ref = make_engine(spec, params).generate(prompts, sp, use_tqdm=False)
    got = make_engine(
        spec, params, chunk=2 * BS, async_decode_depth=2
    ).generate(prompts, sp, use_tqdm=False)
    assert [r["token_ids"] for r in got] == [r["token_ids"] for r in ref]
