"""Paged KV-cache storage and update.

Parity: reference `lightvllm/layers/attention.py:9-108` (Triton scatter
writing token i's K/V to cache rows slot_mapping[i]). TPU-first: the cache is
an explicit pytree threaded through the jitted step (donated), laid out
page-major (L, NB, Hkv, BSZ, D) so that

  - one page is one contiguous HBM region: the decode kernel fetches all KV
    heads of a page with a single 128KB-class DMA;
  - within a fetched page, per-head tiles (BSZ, D) are contiguous — head
    slicing in VMEM is block addressing, not a lane/sublane relayout;
  - the KV-head axis shards on the "model" mesh axis (co-located with the
    query heads that attend to it).

Padding tokens carry an out-of-range slot and are dropped by the scatter.

FP8 storage is scale-free e4m3: a float format keeps per-element exponents,
so per-token rescaling does not improve its RELATIVE precision — it only
extends range, and RMSNorm'd K / activation V never approach e4m3's +-448.
Scale-free halves the bookkeeping, removes all scale DMAs from the attention
kernels, and matches what production fp8-KV serving stacks default to. The
perplexity harness gates the end-to-end quality delta (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.quantization import FP8_DTYPE, FP8_MAX

# Slot value for padding tokens: far out of range -> scatter mode="drop".
PAD_SLOT = jnp.iinfo(jnp.int32).max


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v"],
    meta_fields=[],
)
@dataclass
class KVCache:
    """k/v: (L, NB, Hkv, BSZ, D); bf16/f32, or scale-free e4m3 when fp8."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @property
    def is_fp8(self) -> bool:
        return self.k.dtype == FP8_DTYPE


def alloc_kv_cache(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
    dtype,
    fp8: bool,
) -> KVCache:
    kv_dtype = FP8_DTYPE if fp8 else dtype
    shape = (num_layers, num_blocks, num_kv_heads, block_size, head_dim)
    return KVCache(k=jnp.zeros(shape, kv_dtype), v=jnp.zeros(shape, kv_dtype))


def kv_cache_bytes_per_block(
    num_layers: int, num_kv_heads: int, block_size: int, head_dim: int, dtype, fp8: bool
) -> int:
    itemsize = 1 if fp8 else jnp.dtype(dtype).itemsize
    return 2 * num_layers * num_kv_heads * block_size * head_dim * itemsize


def to_kv_dtype(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Cast K/V to the cache dtype; e4m3 saturates at +-448 via clip."""
    if dtype == FP8_DTYPE:
        return jnp.clip(x.astype(jnp.float32), -FP8_MAX, FP8_MAX).astype(dtype)
    return x.astype(dtype)


def write_kv_layer(
    cache: KVCache,
    layer: jnp.ndarray,  # scalar int32 (traced inside scan)
    k_new: jnp.ndarray,  # (T, Hkv, D)
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # (T,) int32 = block*BSZ + offset; PAD dropped
) -> KVCache:
    bs = cache.block_size
    blocks = slot_mapping // bs
    offsets = slot_mapping % bs
    heads = jnp.arange(cache.k.shape[2], dtype=slot_mapping.dtype)
    # Every index dim is an explicit advanced index so the scatter's update
    # window is only (D,) — innermost in every layout. With the head dim as
    # a slice instead (.at[layer, blocks, :, offsets]), XLA layout-assigns
    # the scatter a token-major cache layout that conflicts with the Pallas
    # kernels' default layout and inserts FULL-CACHE layout-conversion
    # copies every layer (measured 25 ms/layer on a 13 GB cache).
    k_q = to_kv_dtype(k_new, cache.k.dtype)
    v_q = to_kv_dtype(v_new, cache.v.dtype)
    idx = (layer, blocks[:, None], heads[None, :], offsets[:, None])
    k = cache.k.at[idx].set(k_q, mode="drop")
    v = cache.v.at[idx].set(v_q, mode="drop")
    return KVCache(k=k, v=v)


def gather_kv_for_seqs(
    cache: KVCache,
    layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # (B, NB) int32
    block_size: int,
    out_dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-sequence KV: returns (k, v) of (B, NB*block_size, Hkv, D)
    in out_dtype. jnp reference path; the Pallas kernels read pages directly
    from HBM instead."""
    B, NB = block_tables.shape

    def gather_one(data):
        g = data[layer][block_tables]  # (B, NB, Hkv, BSZ, D)
        g = g.astype(jnp.float32).transpose(0, 1, 3, 2, 4)  # (B, NB, BSZ, Hkv, D)
        return g.reshape(B, NB * block_size, *g.shape[3:]).astype(out_dtype)

    return gather_one(cache.k), gather_one(cache.v)
