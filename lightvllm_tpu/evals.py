"""Teacher-forced perplexity evaluation.

The quantization quality gate from BASELINE.md (ppl delta <= 0.1 for INT8,
<= 0.5 for INT4 vs BF16). The reference has no evaluation harness at all
(SURVEY.md §2.10); this one drives the same jitted forward path the engine
serves with (paged cache + prefill metadata), so the measured quality can
include every serving-path approximation — quantized matmuls always, fp8 KV
via kv_cache_dtype="fp8", the Pallas attention kernels via attn_impl —
rather than an idealized offline dequant.

Loss is computed inside jit in vocab chunks so the (T, V) logits matrix is
never materialized (Qwen3's 151k vocab x 2k window would be 1.2 GB f32).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from lightvllm_tpu.models import qwen3
from lightvllm_tpu.ops.kv_cache import alloc_kv_cache
from lightvllm_tpu.utils.metadata import PrefillMeta


@functools.partial(
    jax.jit, static_argnames=("spec", "block_size", "attn_impl", "fp8", "int8")
)
def _window_nll(
    params: dict,
    spec,
    token_ids: jnp.ndarray,  # (T,) int32, padded window
    n_valid: jnp.ndarray,  # scalar: real tokens in the window
    block_size: int,
    attn_impl: str,
    fp8: bool,
    int8: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sum of -log p(token[i+1] | tokens[:i+1]) over valid positions."""
    T = token_ids.shape[0]
    NB = -(-T // block_size)
    cache = alloc_kv_cache(
        spec.num_layers, spec.num_kv_heads, NB, block_size, spec.head_dim,
        spec.jnp_dtype, fp8=fp8, int8=int8,
    )
    meta = PrefillMeta(
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        token_seq=jnp.zeros(T, jnp.int32),
        token_rect_pos=jnp.arange(T, dtype=jnp.int32),
        rect_index=jnp.arange(T, dtype=jnp.int32)[None, :],
        cached_lens=jnp.zeros(1, jnp.int32),
        ctx_lens=jnp.asarray([T], jnp.int32),
        block_tables=jnp.arange(NB, dtype=jnp.int32)[None, :],
        last_flat_idx=jnp.asarray([T - 1], jnp.int32),
        temperatures=jnp.zeros(1, jnp.float32),
        top_ks=jnp.zeros(1, jnp.int32),
        top_ps=jnp.ones(1, jnp.float32),
        seeds=jnp.full((1,), -1, jnp.int32),
    )
    h, _ = qwen3.hidden_states_prefill(
        params, spec, token_ids, meta, cache, block_size, attn_impl=attn_impl,
        page_aligned_kv=(T % block_size == 0),  # slot_mapping is arange(T)
    )  # (T, E)

    targets = jnp.roll(token_ids, -1)  # target[i] = token[i+1]
    valid = jnp.arange(T) < (n_valid - 1)

    chunk = 256

    def body(carry, idx):
        nll_sum, cnt = carry
        hs = jax.lax.dynamic_slice_in_dim(h, idx * chunk, chunk, 0)
        ts = jax.lax.dynamic_slice_in_dim(targets, idx * chunk, chunk, 0)
        vs = jax.lax.dynamic_slice_in_dim(valid, idx * chunk, chunk, 0)
        logits = qwen3.compute_logits(params, spec, hs)  # (chunk, V) f32
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(logp, ts[:, None], axis=-1)[:, 0]
        nll_sum += jnp.sum(jnp.where(vs, -tok_logp, 0.0))
        cnt += jnp.sum(vs)
        return (nll_sum, cnt), None

    n_chunks = -(-T // chunk)
    if T % chunk:
        pad = n_chunks * chunk - T
        h = jnp.pad(h, ((0, pad), (0, 0)))
        targets = jnp.pad(targets, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    (nll, cnt), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), jnp.arange(n_chunks)
    )
    return nll, cnt


def evaluate_ppl(
    params: dict,
    spec,
    tokens: np.ndarray | list,
    window: int = 1024,
    block_size: int = 64,
    attn_impl: str = "jnp",
    kv_cache_dtype: str = "auto",  # "auto" (model dtype) | "fp8" | "int8"
) -> dict:
    """Non-overlapping-window perplexity over a token stream.

    attn_impl and kv_cache_dtype select the same serving-path variants the
    engine runs with (Pallas attention kernels, fp8 KV), so the gate measures
    exactly what production serves. Returns {"ppl", "nll_per_token",
    "tokens"}.
    """
    fp8 = kv_cache_dtype == "fp8"
    int8 = kv_cache_dtype == "int8"
    tokens = np.asarray(tokens, np.int32)
    total_nll, total_cnt = 0.0, 0
    for start in range(0, len(tokens), window):
        w = tokens[start : start + window]
        if len(w) < 2:
            break
        n_valid = len(w)
        if len(w) < window:
            w = np.pad(w, (0, window - len(w)))
        nll, cnt = _window_nll(
            params, spec, jnp.asarray(w), jnp.int32(n_valid), block_size,
            attn_impl, fp8, int8,
        )
        total_nll += float(nll)
        total_cnt += int(cnt)
    assert total_cnt > 0, "token stream too short for one window"
    nll_per_tok = total_nll / total_cnt
    return {
        "ppl": math.exp(nll_per_tok),
        "nll_per_token": nll_per_tok,
        "tokens": total_cnt,
    }
