"""Paged attention over block tables — jnp reference implementations.

Parity: reference `lightvllm/layers/attention.py:126-179`, which dispatches
to the external flash-attn CUDA library (varlen prefill + paged decode). Here
we own the attention math. These jnp versions are the correctness oracles and
the fallback path; the Pallas flash kernels in ops/pallas/ are swapped in by
the runner on TPU (same signatures).

Both read K/V from the paged cache (which already contains this step's
freshly written tokens), so prefix-cached prefill and decode share one code
path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.kv_cache import KVCache, gather_kv_for_seqs
from lightvllm_tpu.ops.quantization import _precision
from lightvllm_tpu.utils.metadata import DecodeMeta, PrefillMeta

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _grouped_scores(q, k):
    """q (B, Sq, Hq, D), k (B, Skv, Hkv, D) -> scores (B, Hkv, G, Sq, Skv)."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Sq, Hkv, G, D)
    return jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        qg,
        k,
        preferred_element_type=jnp.float32,
        precision=_precision(q),
    )


def _weighted_values(p, v):
    """p (B, Hkv, G, Sq, Skv), v (B, Skv, Hkv, D) -> (B, Sq, Hq, D)."""
    B, Hkv, G, Sq, _ = p.shape
    D = v.shape[-1]
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd",
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
        precision=_precision(v),
    )
    return out.reshape(B, Sq, Hkv * G, D)


def paged_prefill_attention(
    q: jnp.ndarray,  # (T, Hq, D) flat new tokens, already rope'd
    cache: KVCache,
    layer: jnp.ndarray,
    meta: PrefillMeta,
    block_size: int,
    scale: float,
) -> jnp.ndarray:  # (T, Hq, D)
    T, Hq, D = q.shape
    B, Sq = meta.rect_index.shape
    # Rectangularize: (B, Sq, Hq, D); padding slots clamp-gather garbage that
    # is never read back (flat gather below only touches real tokens).
    q_rect = q[jnp.clip(meta.rect_index, 0, T - 1)]
    k, v = gather_kv_for_seqs(
        cache, layer, meta.block_tables, block_size, jnp.float32
    )  # (B, Skv, Hkv, D)
    Skv = k.shape[1]

    s = _grouped_scores(q_rect.astype(jnp.float32), k) * scale
    q_pos = meta.cached_lens[:, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :]
    kv_pos = jnp.arange(Skv, dtype=jnp.int32)
    mask = (kv_pos[None, None, :] <= q_pos[:, :, None]) & (
        kv_pos[None, None, :] < meta.ctx_lens[:, None, None]
    )  # (B, Sq, Skv)
    s = jnp.where(mask[:, None, None, :, :], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out_rect = _weighted_values(p, v)  # (B, Sq, Hq, D) f32
    out = out_rect[meta.token_seq, meta.token_rect_pos]  # (T, Hq, D)
    return out.astype(q.dtype)


def paged_prefill_attention_pallas(
    q: jnp.ndarray,  # (T, Hq, D) flat new tokens, already rope'd
    cache: KVCache,
    layer: jnp.ndarray,
    meta: PrefillMeta,
    block_size: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:  # (T, Hq, D)
    """Pallas varlen flash prefill over HBM pages
    (ops/pallas/prefill_attention.py). Scale-free e4m3 caches ride the same
    kernel (pages upcast to bf16 at the MXU)."""
    from lightvllm_tpu.ops.pallas.prefill_attention import paged_flash_prefill

    T = q.shape[0]
    q_rect = q[jnp.clip(meta.rect_index, 0, T - 1)]  # (B, Sq, Hq, D)
    out_rect = paged_flash_prefill(
        q_rect,
        cache.k[layer],
        cache.v[layer],
        meta.block_tables,
        meta.ctx_lens,
        meta.cached_lens,
        sc_shards=cache.sc_shards,
        block_size=block_size,
        scale=scale,
        interpret=interpret,
    )
    return out_rect[meta.token_seq, meta.token_rect_pos].astype(q.dtype)


def paged_decode_attention_pallas(
    q: jnp.ndarray,  # (B, Hq, D), already rope'd
    cache: KVCache,
    layer: jnp.ndarray,
    meta: DecodeMeta,
    block_size: int,
    scale: float,
    interpret: bool = False,
    k_stage: jnp.ndarray | None = None,  # (B, Hkv, W, D) window staging
    v_stage: jnp.ndarray | None = None,
    stage_len: jnp.ndarray | None = None,  # scalar: valid staged rows
    pages_ctx: jnp.ndarray | None = None,  # (B,) paged-context override
    k_new: jnp.ndarray | None = None,  # (B, Hkv, D) current step's rows
    v_new: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pallas flash-decode over HBM pages (ops/pallas/decode_attention.py).
    Scale-free e4m3 caches ride the same kernel (bf16 at the MXU). With
    window staging (the staged decode path) the kernel additionally folds
    the dense unflushed tail into its online softmax; k_new/v_new pass the
    CURRENT step's rows separately (see forward_decode_staged)."""
    from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode

    return paged_flash_decode(
        q,
        cache.k[layer],
        cache.v[layer],
        meta.block_tables,
        meta.ctx_lens if pages_ctx is None else pages_ctx,
        k_stage,
        v_stage,
        stage_len,
        k_new,
        v_new,
        sc_shards=cache.sc_shards,
        block_size=block_size,
        scale=scale,
        interpret=interpret,
    )


def paged_decode_attention(
    q: jnp.ndarray,  # (B, Hq, D), already rope'd
    cache: KVCache,
    layer: jnp.ndarray,
    meta: DecodeMeta,
    block_size: int,
    scale: float,
    k_stage: jnp.ndarray | None = None,  # (B, Hkv, W, D) window staging
    v_stage: jnp.ndarray | None = None,
    stage_len: jnp.ndarray | None = None,
    pages_ctx: jnp.ndarray | None = None,
    k_new: jnp.ndarray | None = None,  # (B, Hkv, D) current step's rows
    v_new: jnp.ndarray | None = None,
) -> jnp.ndarray:  # (B, Hq, D)
    k, v = gather_kv_for_seqs(
        cache, layer, meta.block_tables, block_size, jnp.float32
    )
    ctx = meta.ctx_lens if pages_ctx is None else pages_ctx
    Skv = k.shape[1]
    kv_pos = jnp.arange(Skv, dtype=jnp.int32)
    mask = kv_pos[None, :] < ctx[:, None]  # (B, Skv)
    if k_stage is not None:
        W = k_stage.shape[2]
        k = jnp.concatenate(
            [k, k_stage.transpose(0, 2, 1, 3).astype(jnp.float32)], axis=1
        )
        v = jnp.concatenate(
            [v, v_stage.transpose(0, 2, 1, 3).astype(jnp.float32)], axis=1
        )
        st_mask = jnp.arange(W, dtype=jnp.int32)[None, :] < stage_len
        mask = jnp.concatenate(
            [mask, jnp.broadcast_to(st_mask, (mask.shape[0], W))], axis=1
        )
    if k_new is not None:
        # Current step's rows, always attended (see forward_decode_staged).
        k = jnp.concatenate([k, k_new[:, None].astype(jnp.float32)], axis=1)
        v = jnp.concatenate([v, v_new[:, None].astype(jnp.float32)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.ones((mask.shape[0], 1), bool)], axis=1
        )
    s = _grouped_scores(q[:, None].astype(jnp.float32), k) * scale
    s = jnp.where(mask[:, None, None, None, :], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = _weighted_values(p, v)  # (B, 1, Hq, D)
    return out[:, 0].astype(q.dtype)
