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
Optional FP8 (e4m3) storage keeps per-(head, slot) scales alongside.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.quantization import FP8_DTYPE, quantize_kv_fp8

# Slot value for padding tokens: far out of range -> scatter mode="drop".
PAD_SLOT = jnp.iinfo(jnp.int32).max


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclass
class KVCache:
    """k/v: (L, NB, Hkv, BSZ, D). Scales (L, NB, Hkv, BSZ) iff fp8."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @property
    def is_fp8(self) -> bool:
        return self.k_scale is not None


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
    k = jnp.zeros(shape, kv_dtype)
    v = jnp.zeros(shape, kv_dtype)
    if fp8:
        ks = jnp.ones(shape[:4], jnp.float32)
        vs = jnp.ones(shape[:4], jnp.float32)
    else:
        ks = vs = None
    return KVCache(k=k, v=v, k_scale=ks, v_scale=vs)


def kv_cache_bytes_per_block(
    num_layers: int, num_kv_heads: int, block_size: int, head_dim: int, dtype, fp8: bool
) -> int:
    itemsize = 1 if fp8 else jnp.dtype(dtype).itemsize
    per = 2 * num_layers * num_kv_heads * block_size * head_dim * itemsize
    if fp8:
        per += 2 * num_layers * num_kv_heads * block_size * 4  # f32 scales
    return per


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
    # Indexing [layer, blocks, :, offsets]: layer/blocks/offsets are advanced
    # indices separated by the head slice -> indexed shape (T, Hkv, ...) with
    # the advanced (token) dims leading, matching k_new's layout.
    if cache.is_fp8:
        k_q, k_s = quantize_kv_fp8(k_new)
        v_q, v_s = quantize_kv_fp8(v_new)
        k_scale = cache.k_scale.at[layer, blocks, :, offsets].set(k_s, mode="drop")
        v_scale = cache.v_scale.at[layer, blocks, :, offsets].set(v_s, mode="drop")
    else:
        k_q, v_q = k_new.astype(cache.k.dtype), v_new.astype(cache.v.dtype)
        k_scale, v_scale = cache.k_scale, cache.v_scale
    k = cache.k.at[layer, blocks, :, offsets].set(k_q, mode="drop")
    v = cache.v.at[layer, blocks, :, offsets].set(v_q, mode="drop")
    return KVCache(k=k, v=v, k_scale=k_scale, v_scale=v_scale)


def gather_kv_for_seqs(
    cache: KVCache,
    layer: jnp.ndarray,
    block_tables: jnp.ndarray,  # (B, NB) int32
    block_size: int,
    out_dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather + dequantize per-sequence KV: returns (k, v) of
    (B, NB*block_size, Hkv, D) in out_dtype. jnp reference path; the Pallas
    decode kernel reads pages directly from HBM instead."""
    B, NB = block_tables.shape

    def gather_one(data, scale):
        g = data[layer][block_tables]  # (B, NB, Hkv, BSZ, D)
        g = g.astype(jnp.float32)
        if scale is not None:
            s = scale[layer][block_tables]  # (B, NB, Hkv, BSZ)
            g = g * s[..., None]
        g = g.transpose(0, 1, 3, 2, 4)  # (B, NB, BSZ, Hkv, D)
        return g.reshape(B, NB * block_size, *g.shape[3:]).astype(out_dtype)

    k = gather_one(cache.k, cache.k_scale)
    v = gather_one(cache.v, cache.v_scale)
    return k, v
