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

v5e performance note: this chip generation has no hardware e4m3 path, so
the attention kernels' fp8->bf16 upcast is VPU-emulated (~13 ops/element,
measured ~72 Gelem/s) — fp8 KV on v5e trades decode VPU time for 2x KV
capacity (longer contexts / more sequences per chip). On fp8-native TPUs
the same kernels run at full speed.
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
    data_fields=["k", "v", "scale"],
    meta_fields=[],
)
@dataclass
class KVCache:
    """k/v: per-layer tuples of (NB, Hkv, BSZ, D) page arrays; bf16/f32,
    scale-free e4m3 when fp8, or int8 with per-(page, head, channel) scales.

    INT8 KV (the decode-bandwidth lever on v5e — attention page reads are
    the measured dominant decode cost, and int8<->bf16 converts are
    hardware-fast where e4m3 upcasts are VPU-emulated): `scale` holds one
    (NB, 2, Hkv, D) float32 array per layer — [*, 0] dequantizes K pages,
    [*, 1] dequantizes V — quantization axis = channel within a page, so
    the kernels' dequant is a native lane-preserving broadcast multiply and
    each page's scales travel in ONE aligned whole-entry DMA (1/16 of the
    page bytes). A page's scales are set when its first row is written
    (with headroom margin for later appends, KV_INT8_MARGIN) and reused by
    subsequent appends — block reuse is safe because a reused page always
    restarts at row 0.

    One array PER LAYER, not a stacked (L, ...) array, for two measured
    reasons (decode step 98 ms -> ~3 ms on a 13 GB cache):
      - a lax.scan over a stacked cache dynamic-slices every layer's weights
        and pages (materializing copies), while an unrolled layer loop over
        a SINGLE stacked cache makes layer i+1's scatter and layer i's
        attention read conflict on one buffer with no data edge — XLA's
        copy-insertion then duplicates the whole cache every layer;
      - with per-layer buffers each scatter/read pair touches its own array,
        donation aliases in place, and the attention kernels drop the layer
        index entirely.
    """

    k: tuple
    v: tuple
    scale: tuple | None = None  # int8 mode: per-layer (NB, 2, Hkv, D) f32

    @property
    def num_layers(self) -> int:
        return len(self.k)

    @property
    def block_size(self) -> int:
        return self.k[0].shape[2]

    @property
    def num_blocks(self) -> int:
        return self.k[0].shape[0]

    @property
    def is_fp8(self) -> bool:
        return self.k[0].dtype == FP8_DTYPE

    @property
    def is_int8(self) -> bool:
        return self.k[0].dtype == jnp.int8


# Headroom applied when a page's channel scales are set at first write:
# later rows appended to the page reuse the scale, so it must cover values
# somewhat larger than the first rows'. Costs 1 bit of the int8 range.
KV_INT8_MARGIN = 2.0


def alloc_kv_cache(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
    dtype,
    fp8: bool,
    int8: bool = False,
) -> KVCache:
    assert not (fp8 and int8)
    kv_dtype = FP8_DTYPE if fp8 else (jnp.int8 if int8 else dtype)
    shape = (num_blocks, num_kv_heads, block_size, head_dim)
    scale = None
    if int8:
        # Zero-init: a never-written page dequantizes to exact 0 (masked
        # out anyway); first write overwrites the whole entry.
        scale = tuple(
            jnp.zeros((num_blocks, 2, num_kv_heads, head_dim), jnp.float32)
            for _ in range(num_layers)
        )
    return KVCache(
        k=tuple(jnp.zeros(shape, kv_dtype) for _ in range(num_layers)),
        v=tuple(jnp.zeros(shape, kv_dtype) for _ in range(num_layers)),
        scale=scale,
    )


def kv_cache_bytes_per_block(
    num_layers: int,
    num_kv_heads: int,
    block_size: int,
    head_dim: int,
    dtype,
    fp8: bool,
    int8: bool = False,
) -> int:
    itemsize = 1 if (fp8 or int8) else jnp.dtype(dtype).itemsize
    n = 2 * num_layers * num_kv_heads * block_size * head_dim * itemsize
    if int8:
        n += num_layers * 2 * num_kv_heads * head_dim * 4  # scale entries
    return n


def to_kv_dtype(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Cast K/V to the cache dtype; e4m3 saturates at +-448 via clip."""
    if dtype == FP8_DTYPE:
        return jnp.clip(x.astype(jnp.float32), -FP8_MAX, FP8_MAX).astype(dtype)
    return x.astype(dtype)


def _page_scales_for_write(
    scale_arr: jnp.ndarray,  # (NB, 2, Hkv, D) f32
    k_new: jnp.ndarray,  # (T, Hkv, D)
    v_new: jnp.ndarray,
    blocks: jnp.ndarray,  # (T,) int32
    offsets: jnp.ndarray,  # (T,)
    valid: jnp.ndarray,  # (T,) bool
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Update per-page channel scales for an int8 write and return
    (new scale array, per-row K scale, per-row V scale).

    Pages whose row 0 is written in this batch are (re)started: their scale
    entry is SET from this batch's channel absmax x KV_INT8_MARGIN (safe
    against stale entries from a previous owner of the block). Appended
    pages reuse their existing entry — consistent because a page's rows are
    only ever written front-to-back."""
    nb = scale_arr.shape[0]
    seg = jnp.where(valid, blocks, nb)  # PAD rows -> overflow segment
    absk = jnp.abs(k_new.astype(jnp.float32))
    absv = jnp.abs(v_new.astype(jnp.float32))
    page_max_k = jax.ops.segment_max(absk, seg, num_segments=nb + 1)[:-1]
    page_max_v = jax.ops.segment_max(absv, seg, num_segments=nb + 1)[:-1]
    started = (
        jax.ops.segment_max(
            (valid & (offsets == 0)).astype(jnp.int32), seg, num_segments=nb + 1
        )[:-1]
        > 0
    )  # (NB,)
    fresh = (
        jnp.stack([page_max_k, page_max_v], axis=1)  # (NB, 2, Hkv, D)
        * (KV_INT8_MARGIN / 127.0)
    )
    scale_arr = jnp.where(started[:, None, None, None], fresh, scale_arr)
    row_scale = scale_arr[jnp.clip(blocks, 0, nb - 1)]  # (T, 2, Hkv, D)
    return scale_arr, row_scale[:, 0], row_scale[:, 1]


def _quantize_rows(x: jnp.ndarray, row_scale: jnp.ndarray) -> jnp.ndarray:
    q = x.astype(jnp.float32) / jnp.maximum(row_scale, 1e-20)
    return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)


def write_kv_pages(
    cache: KVCache,
    layer: int,
    k_new: jnp.ndarray,  # (T, Hkv, D), T % block_size == 0, PAGE-ALIGNED rows
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # (T,); row r*BSZ starts page r's slots
) -> KVCache:
    """Whole-page KV write for page-aligned token streams (prefill).

    XLA lowers a row scatter to a SERIAL per-row loop (~2 us/row/layer on
    v5e): per-token writes made an 8K-token prefill ~95% scatter time
    (measured 487 ms p50 TTFT at b8x1024 — the serial loop, not the MXU,
    was the bill). prepare_prefill pads every sequence's uncached region to
    a block multiple (regions already START on block boundaries — prefix
    hits are whole blocks), so the flat stream reshapes directly into
    pages and the scatter runs over T/BSZ whole-page rows: 64x fewer
    serial iterations. Padding rows inside a partial page are zeroed
    (never attended: their positions are >= the sequence's context; decode
    later overwrites them in place via the window flush)."""
    bs = cache.block_size
    T = k_new.shape[0]
    P = T // bs
    page_ids = slot_mapping[::bs] // bs  # (P,); PAD rows -> huge -> dropped
    valid = (slot_mapping != PAD_SLOT)[:, None, None]

    def to_pages(x):
        x = jnp.where(valid, x, jnp.zeros_like(x))
        return x.reshape(P, bs, x.shape[1], x.shape[2]).transpose(0, 2, 1, 3)

    kp = to_pages(k_new)  # (P, Hkv, BSZ, D)
    vp = to_pages(v_new)
    k = list(cache.k)
    v = list(cache.v)
    if cache.is_int8:
        def quant(x):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2)  # (P,Hkv,D)
            sc = amax * (KV_INT8_MARGIN / 127.0)
            qd = jnp.clip(
                jnp.round(x.astype(jnp.float32) / jnp.maximum(sc[:, :, None], 1e-20)),
                -127,
                127,
            ).astype(jnp.int8)
            return qd, sc

        kq, ksc = quant(kp)
        vq, vsc = quant(vp)
        scale = list(cache.scale)
        scale[layer] = scale[layer].at[page_ids].set(
            jnp.stack([ksc, vsc], axis=1), mode="drop"
        )
        k[layer] = k[layer].at[page_ids].set(kq, mode="drop")
        v[layer] = v[layer].at[page_ids].set(vq, mode="drop")
        return KVCache(k=tuple(k), v=tuple(v), scale=tuple(scale))
    k[layer] = k[layer].at[page_ids].set(
        to_kv_dtype(kp, k[layer].dtype), mode="drop"
    )
    v[layer] = v[layer].at[page_ids].set(
        to_kv_dtype(vp, v[layer].dtype), mode="drop"
    )
    return KVCache(k=tuple(k), v=tuple(v), scale=cache.scale)


def write_kv_layer(
    cache: KVCache,
    layer: int,  # static layer index (unrolled layer loop)
    k_new: jnp.ndarray,  # (T, Hkv, D)
    v_new: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # (T,) int32 = block*BSZ + offset; PAD dropped
) -> KVCache:
    bs = cache.block_size
    k = list(cache.k)
    v = list(cache.v)
    if cache.is_int8:
        blocks_i = slot_mapping // bs
        offsets_i = slot_mapping % bs
        valid = slot_mapping != PAD_SLOT
        scale = list(cache.scale)
        scale[layer], ks_row, vs_row = _page_scales_for_write(
            scale[layer], k_new, v_new, blocks_i, offsets_i, valid
        )
        k_q = _quantize_rows(k_new, ks_row)
        v_q = _quantize_rows(v_new, vs_row)
        heads = jnp.arange(k[layer].shape[1], dtype=slot_mapping.dtype)
        idx = (blocks_i[:, None], heads[None, :], offsets_i[:, None])
        # PAD rows: blocks_i is huge -> mode="drop" discards them.
        k[layer] = k[layer].at[idx].set(k_q, mode="drop")
        v[layer] = v[layer].at[idx].set(v_q, mode="drop")
        return KVCache(k=tuple(k), v=tuple(v), scale=tuple(scale))
    k_q = to_kv_dtype(k_new, k[layer].dtype)
    v_q = to_kv_dtype(v_new, v[layer].dtype)
    # NOTE: XLA lowers this scatter to a serial per-row loop (~3.5 ms/step
    # at decode b64 across 28 layers, ~20% of the step). A Pallas in-place
    # DMA append exists (ops/pallas/kv_append.py) but Mosaic requires bf16
    # HBM DMA destinations to be 2-sublane aligned, which single-token row
    # writes violate; candidate fixes (pair read-modify-write, token-major
    # pages) each trade against the attention kernels' layout. Known
    # next-round optimization.
    blocks = slot_mapping // bs
    offsets = slot_mapping % bs
    heads = jnp.arange(cache.k[layer].shape[1], dtype=slot_mapping.dtype)
    # Every index dim is an explicit advanced index so the scatter's update
    # window is only (D,) — innermost in every layout. With the head dim as
    # a slice instead (.at[blocks, :, offsets]), XLA layout-assigns the
    # scatter a token-major cache layout that conflicts with the Pallas
    # kernels' default layout and inserts FULL-CACHE layout-conversion
    # copies every layer (measured 25 ms/layer on a 13 GB cache).
    idx = (blocks[:, None], heads[None, :], offsets[:, None])
    k[layer] = k[layer].at[idx].set(k_q, mode="drop")
    v[layer] = v[layer].at[idx].set(v_q, mode="drop")
    return KVCache(k=tuple(k), v=tuple(v))


def gather_kv_for_seqs(
    cache: KVCache,
    layer: int,
    block_tables: jnp.ndarray,  # (B, NB) int32
    block_size: int,
    out_dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-sequence KV: returns (k, v) of (B, NB*block_size, Hkv, D)
    in out_dtype. jnp reference path; the Pallas kernels read pages directly
    from HBM instead."""
    B, NB = block_tables.shape

    def gather_one(data, sc=None):
        g = data[block_tables]  # (B, NB, Hkv, BSZ, D)
        g = g.astype(jnp.float32).transpose(0, 1, 3, 2, 4)  # (B, NB, BSZ, Hkv, D)
        if sc is not None:  # int8: per-(page, head, channel) dequant
            g = g * sc[block_tables][:, :, None]  # (B, NB, 1, Hkv, D)
        return g.reshape(B, NB * block_size, *g.shape[3:]).astype(out_dtype)

    ks = vs = None
    if cache.is_int8:
        ks = cache.scale[layer][:, 0]  # (NBtot, Hkv, D)
        vs = cache.scale[layer][:, 1]
    return gather_one(cache.k[layer], ks), gather_one(cache.v[layer], vs)
