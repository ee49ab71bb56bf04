"""Pallas paged flash-decode kernel.

Parity: replaces the reference's external `flash_attn_with_kvcache` call
(`lightvllm/layers/attention.py:172-175`) — one query token per sequence
attending over a block-table-paged KV cache.

Design (TPU-first):
  - KV pages are page-major (NB, Hkv, BSZ, D): one page = one contiguous
    HBM region = ONE async DMA for all heads (measured: one-DMA-per-
    (head,page) designs were latency-bound at ~56-126 GB/s).
  - grid (B, num_chunks): each step gathers pages_per_chunk pages with
    concurrent DMAs into double-buffered VMEM and computes the online-
    softmax update; the next chunk's DMAs are issued first (double
    buffering hides HBM latency behind compute).
  - GQA is BLOCK-DIAGONAL: scores live in the compact (Hkv, Gc, tokens)
    layout computed by Hkv-batched dot_generals on the pages' NATIVE
    (Hkv, BSZ, D) layout. The r1-r4 design folded all heads into one wide
    (Hkv*Gc, Hkv*tokens) matmul with a cross-head mask — 8x the MXU
    columns and 8x the mask/exp/sum VPU elements at Hkv=8, all masked
    away. Compact form needs NO head mask at all (only the position
    mask), and no operand ever reshapes across an int8 sublane boundary
    (a Mosaic mis-lowering hazard found on-chip in r5).
  - online softmax in fp32 with running (m, l) VMEM scratch; output block
    revisits across the chunk axis and is normalized on the sequence's
    last real chunk.
  - chunks fully beyond a sequence's context are skipped (no DMA, no
    FLOPs). Callers must clamp padding rows' ctx_lens to >= 1.
  - FP8 KV is scale-free e4m3 (see ops/kv_cache.py): pages upcast to bf16
    inside the MXU matmuls; no scale arrays, no extra DMAs.
  - INT8 KV scales ride IN-PAGE (ops/kv_cache.py module docstring): the K
    page carries trailing scale heads, so the page DMA delivers data +
    scales together. dequant_mode:
      "fold" — per-page K scale folds into q (bf16 MXU dots; V scale
               folds into the f32 output partial);
      "s8"   — additionally QUANTIZES the folded q per row and p (fixed
               127 scale: p <= 1 with exact zeros preserved) so both dots
               run s8 x s8 -> s32 with the int8 pages feeding the MXU
               uncast — the elementwise int8->bf16 slab casts were the
               fold path's largest VPU term.
  - the current decode step's K/V rows arrive as SEPARATE (B, Hkv, D)
    inputs (k_new/v_new) merged in the finalize step: attention must not
    consume the post-update staging buffer, or XLA copies the whole
    buffer every step instead of updating the scan carry in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightvllm_tpu.ops.kv_cache import scale_plane_rows

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# Default int8 dequant strategy for callers that don't pass dequant_mode
# (the engine sets this from Config.attn_dequant_mode at runner init).
DECODE_DEQUANT_MODE = "fold"


def set_decode_dequant_mode(mode: str) -> None:
    global DECODE_DEQUANT_MODE
    assert mode in ("fold", "s8"), mode
    DECODE_DEQUANT_MODE = mode


def _compute_dtype(page_dtype) -> jnp.dtype:
    """bf16 for sub-bf16 (fp8) and int8 pages, else the page dtype."""
    return jnp.bfloat16 if jnp.dtype(page_dtype).itemsize < 2 else page_dtype


def decode_inpage_scales(sc_heads, num_heads: int):
    """(P, Sh, BSZ, D) int8 scale-head payload -> ((P, Hkv, D) f32 K, V).

    Mosaic-native decode of ops/kv_cache.py's byte planes: widen to int32
    (8-bit vector shifts are unsupported), recombine the two bf16 bytes
    into the high half of an f32 bit pattern, same-width bitcast."""
    P, Sh, BSZ, D = sc_heads.shape
    spl = scale_plane_rows(num_heads)
    flat = sc_heads.reshape(P, Sh * BSZ, D)
    rows = flat[:, : 4 * spl].astype(jnp.int32)  # (P, 4*spl, D)

    def plane(i):
        return rows[:, i * spl : i * spl + num_heads]

    def combine(hi, lo):
        bits = ((hi & 0xFF) << 24) | ((lo & 0xFF) << 16)
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    return combine(plane(0), plane(1)), combine(plane(2), plane(3))


def _chunk_copies(pages_hbm, buf, sem, tables_ref, b, chunk, buf_idx, ppcb):
    """One whole-page DMA per page in the chunk (all heads at once).
    pages_hbm is one layer's (NBtot, H, BSZ, D) page array."""
    return [
        pltpu.make_async_copy(
            pages_hbm.at[tables_ref[b, chunk * ppcb + j]],
            buf.at[buf_idx, j],
            sem.at[buf_idx],
        )
        for j in range(ppcb)
    ]


def _run_chunk_copies(op, copies, npages_ref, b, chunk, ppcb):
    """start()/wait() each page copy only if the page is inside the
    sequence's context: the last chunk of a context is usually partial, and
    unconditionally fetching its clamped straggler pages costs real HBM
    bytes (up to (ppcb-1)/ppcb of a chunk per sequence per layer). Start
    and wait conditions match, so the shared semaphore stays balanced."""
    np_b = npages_ref[b]
    for j, c in enumerate(copies):
        @pl.when(chunk * ppcb + j < np_b)
        def _go(c=c):
            getattr(c, op)()


def _online_merge(m_ref, l_ref, o_ref, s, values_fn):
    """One online-softmax accumulation step in the compact layout.

    s: (Hkv, Gc, C) masked scores. values_fn(p) -> (Hkv, Gc, D) f32
    weighted-value partial for this block. Updates (m, l, o) in place and
    returns nothing."""
    Hkv, Gc, _ = s.shape
    HG = Hkv * Gc
    m_prev = m_ref[:, :1]  # (HG, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (Hkv, Gc, 1)
    m_next = jnp.maximum(m_prev, m_cur.reshape(HG, 1))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next.reshape(Hkv, Gc, 1))  # (Hkv, Gc, C)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1).reshape(HG, 1)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
    o_cur = values_fn(p)  # (Hkv, Gc, D) f32
    o_ref[0] = o_ref[0] * alpha.reshape(Hkv, Gc, 1) + o_cur


def _decode_kernel(
    # scalar prefetch
    tables_ref,  # (B, NB_padded) int32
    ctx_lens_ref,  # (B,) int32
    npages_ref,  # (B,) int32 valid pages per seq (>= 1): gates page DMAs
    stage_len_ref,  # (1,) int32 (number of valid staging rows; 0 = no stage)
    # inputs
    q_ref,  # (1, Hkv, Gc, D) VMEM — Gc = G padded to the sublane tile
    k_hbm,  # (NBtot, Hkv [+ scale heads], BSZ, D) ANY (HBM), one layer
    v_hbm,  # (NBtot, Hkv, BSZ, D)
    # [ks_ref, vs_ref] when has_stage: (1, Hkv, W, D) VMEM staging tail
    # [kn_ref, vn_ref] when has_new: (1, Hkv, D) current step's rows
    # outputs
    # o_ref (1, Hkv, Gc, D) f32 VMEM
    # scratch: m_ref, l_ref (Hkv*Gc, 128) f32; k_buf/v_buf; sems; smem
    *refs,
    block_size: int,
    ppcb: int,
    scale: float,
    num_kv_heads: int,
    has_stage: bool,
    has_new: bool = False,
    has_scale: bool = False,  # int8 pages with in-page scale heads
    dequant_mode: str = "fold",  # "fold" | "s8" (see module docstring)
):
    refs = list(refs)
    if has_stage:
        ks_ref, vs_ref = refs.pop(0), refs.pop(0)
    else:
        ks_ref = vs_ref = None
    if has_new:
        kn_ref, vn_ref = refs.pop(0), refs.pop(0)
    else:
        kn_ref = vn_ref = None
    o_ref, m_ref, l_ref, k_buf, v_buf, k_sem, v_sem = refs[:7]
    buf_idx_ref, init_ref = refs[7:]
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_b = pl.num_programs(0)
    num_chunks = pl.num_programs(1)
    chunk_tokens = ppcb * block_size
    ctx = ctx_lens_ref[b]
    Hkv = num_kv_heads

    def chunk_valid(b_, i_):
        # Chunk 0 always runs: it initializes (m, l, o) and, for ctx <= 0
        # rows (padding, or 1-token prompts whose only token lives in the
        # staging tail), everything it reads is masked out.
        return (i_ == 0) | (i_ * chunk_tokens < ctx_lens_ref[b_])

    # SMEM scratch is uninitialized: zero the init flag on the very first
    # grid instance (always valid since every ctx >= 1). Page buffers are
    # zeroed too: partial-chunk page DMAs are skipped (npages gating), and
    # a never-written VMEM slot could hold NaN bit patterns that poison the
    # masked 0 * garbage products. (Zero bytes in the in-page scale region
    # decode to scale 0.0 — the int8 path needs no extra handling.)
    @pl.when((b == 0) & (i == 0))
    def _zero_flags():
        init_ref[0] = 0
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)

    @pl.when(chunk_valid(b, i))
    def _body():
        @pl.when(i == 0)
        def _init_seq():
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
            o_ref[...] = jnp.zeros_like(o_ref)

        # First valid instance: prime the pipeline with our own chunk.
        @pl.when(init_ref[0] == 0)
        def _first():
            init_ref[0] = 1
            buf_idx_ref[0] = 0
            _run_chunk_copies(
                "start",
                _chunk_copies(k_hbm, k_buf, k_sem, tables_ref, b, i, 0, ppcb),
                npages_ref, b, i, ppcb,
            )
            _run_chunk_copies(
                "start",
                _chunk_copies(v_hbm, v_buf, v_sem, tables_ref, b, i, 0, ppcb),
                npages_ref, b, i, ppcb,
            )

        buf_idx = buf_idx_ref[0]

        # Lookahead: chunk 0 is valid for every sequence (ctx >= 1), so the
        # next valid chunk is i+1 (same seq) or chunk 0 of seq b+1.
        same_seq = chunk_valid(b, i + 1) & (i + 1 < num_chunks)
        next_b = jnp.where(same_seq, b, b + 1)
        next_i = jnp.where(same_seq, i, -1) + 1  # i+1 or 0
        has_next = same_seq | (b + 1 < num_b)

        @pl.when(has_next)
        def _prefetch():
            nxt = 1 - buf_idx
            _run_chunk_copies(
                "start",
                _chunk_copies(k_hbm, k_buf, k_sem, tables_ref, next_b, next_i, nxt, ppcb),
                npages_ref, next_b, next_i, ppcb,
            )
            _run_chunk_copies(
                "start",
                _chunk_copies(v_hbm, v_buf, v_sem, tables_ref, next_b, next_i, nxt, ppcb),
                npages_ref, next_b, next_i, ppcb,
            )
            buf_idx_ref[0] = nxt

        # Wait for this chunk's K pages, then Hkv-BATCHED score dots per
        # page on the page's native (Hkv, BSZ, D) layout — block-diagonal
        # GQA, no cross-head columns, no head mask.
        _run_chunk_copies(
            "wait",
            _chunk_copies(k_hbm, k_buf, k_sem, tables_ref, b, i, buf_idx, ppcb),
            npages_ref, b, i, ppcb,
        )

        Gc = q_ref.shape[2]
        cd = _compute_dtype(k_buf.dtype)
        q = q_ref[0].astype(jnp.float32) * scale  # (Hkv, Gc, D)
        kslab = k_buf[buf_idx]  # (ppcb, Hkv [+Sh], BSZ, D)
        if has_scale:
            # In-page scales rode the K page DMA we just waited on.
            sc_k, sc_v = decode_inpage_scales(kslab[:, Hkv:], Hkv)
            kslab = kslab[:, :Hkv]
        dn_qk = (((2,), (2,)), ((0,), (0,)))  # contract D, batch Hkv
        s_parts = []
        if has_scale and dequant_mode == "s8":
            # Fold the per-(page, head, channel) K scale into q, quantize
            # the folded q per row, and run s8 x s8 -> s32: the int8 page
            # feeds the MXU with NO elementwise cast (the fold path's
            # largest VPU term). Products are exact in s32; the only new
            # error is the per-row q rounding (~0.4% relative).
            for pg in range(ppcb):
                qs = q * sc_k[pg][:, None, :]  # (Hkv, Gc, D) f32
                aq = jnp.maximum(
                    jnp.max(jnp.abs(qs), axis=2, keepdims=True), 1e-30
                )
                qs8 = jnp.round(qs * (127.0 / aq)).astype(jnp.int8)
                s_pg = jax.lax.dot_general(
                    qs8, kslab[pg], dn_qk,
                    preferred_element_type=jnp.int32,
                )  # (Hkv, Gc, BSZ) s32
                s_parts.append(
                    s_pg.astype(jnp.float32) * (aq * (1.0 / 127.0))
                )
        elif has_scale:  # "fold"
            for pg in range(ppcb):
                qs = (q * sc_k[pg][:, None, :]).astype(cd)
                k4 = kslab[pg].astype(cd)
                s_parts.append(
                    jax.lax.dot_general(
                        qs, k4, dn_qk, preferred_element_type=jnp.float32
                    )
                )
        else:
            qcd = q.astype(cd)
            for pg in range(ppcb):
                s_parts.append(
                    jax.lax.dot_general(
                        qcd, kslab[pg].astype(cd), dn_qk,
                        preferred_element_type=jnp.float32,
                    )
                )
        s = jnp.concatenate(s_parts, axis=2)  # (Hkv, Gc, chunk_tokens)

        # Position mask: one broadcast compare. Columns past the context
        # (incl. skipped pages' stale buffer content) select MASK.
        col = jax.lax.broadcasted_iota(
            jnp.int32, (Gc, chunk_tokens), 1
        )[None]
        s = jnp.where(col < (ctx - i * chunk_tokens), s, MASK_VALUE)

        _run_chunk_copies(
            "wait",
            _chunk_copies(v_hbm, v_buf, v_sem, tables_ref, b, i, buf_idx, ppcb),
            npages_ref, b, i, ppcb,
        )
        vslab = v_buf[buf_idx]  # (ppcb, Hkv, BSZ, D)
        dn_pv = (((2,), (1,)), ((0,), (0,)))  # contract tokens, batch Hkv

        def values(p):  # p (Hkv, Gc, chunk_tokens)
            o_cur = jnp.zeros_like(o_ref[0], jnp.float32)
            for pg in range(ppcb):
                p_pg = p[:, :, pg * block_size : (pg + 1) * block_size]
                if has_scale and dequant_mode == "s8":
                    # p <= 1 with the row max EXACTLY 1 and masked entries
                    # exactly 0: a fixed 127 scale quantizes it; the int8
                    # V page again feeds the MXU uncast.
                    p8 = jnp.round(p_pg * 127.0).astype(jnp.int8)
                    o_pg = jax.lax.dot_general(
                        p8, vslab[pg], dn_pv,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * (1.0 / 127.0)
                else:
                    o_pg = jax.lax.dot_general(
                        p_pg.astype(cd), vslab[pg].astype(cd), dn_pv,
                        preferred_element_type=jnp.float32,
                    )
                if has_scale:
                    # Per-(page, head, channel) V scale folds into the f32
                    # output partial (strictly tighter than page dequant).
                    o_pg = o_pg * sc_v[pg][:, None, :]
                o_cur = o_cur + o_pg
            return o_cur

        _online_merge(m_ref, l_ref, o_ref, s, values)

        # On this sequence's last real chunk: fold in the dense staging
        # tail and the current step's K/V rows, then normalize.
        @pl.when(jnp.logical_not(same_seq))
        def _finalize():
            qcd = q.astype(cd)
            if has_stage:
                W = ks_ref.shape[2]
                s2 = jax.lax.dot_general(
                    qcd, ks_ref[0].astype(cd), dn_qk,
                    preferred_element_type=jnp.float32,
                )  # (Hkv, Gc, W)
                c2 = jax.lax.broadcasted_iota(jnp.int32, (Gc, W), 1)[None]
                s2 = jnp.where(c2 < stage_len_ref[0], s2, MASK_VALUE)

                def stage_values(p2):
                    return jax.lax.dot_general(
                        p2.astype(cd), vs_ref[0].astype(cd), dn_pv,
                        preferred_element_type=jnp.float32,
                    )

                _online_merge(m_ref, l_ref, o_ref, s2, stage_values)
            if has_new:
                # Current step's rows, passed SEPARATELY from the staging
                # buffer so the per-step staging update's only consumer is
                # the scan carry (see module docstring).
                kn = kn_ref[0].astype(cd)  # (Hkv, D)
                s3 = jax.lax.dot_general(
                    qcd, kn[:, None, :], dn_qk,
                    preferred_element_type=jnp.float32,
                )  # (Hkv, Gc, 1)

                def new_values(p3):
                    return jax.lax.dot_general(
                        p3.astype(cd), vn_ref[0].astype(cd)[:, None, :],
                        dn_pv, preferred_element_type=jnp.float32,
                    )

                _online_merge(m_ref, l_ref, o_ref, s3, new_values)
            l = l_ref[:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            Gc_ = o_ref.shape[2]
            o_ref[0] = o_ref[0] * l_inv.reshape(Hkv, Gc_, 1)


def paged_flash_decode(*args, dequant_mode: str | None = None, **kwargs):
    """Shim: resolve the module-default dequant mode BEFORE the jit
    boundary so it lands in the jit cache key (a trace-time global read
    inside the jitted body would pin the first engine's mode for every
    later engine in the process)."""
    if dequant_mode is None:
        dequant_mode = DECODE_DEQUANT_MODE
    return _paged_flash_decode(*args, dequant_mode=dequant_mode, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "ppcb", "sc_shards", "interpret",
        "dequant_mode",
    ),
)
def _paged_flash_decode(
    q: jnp.ndarray,  # (B, Hq, D)
    k_pages: jnp.ndarray,  # (NB_total, Hkv [+ scale heads], BSZ, D)
    v_pages: jnp.ndarray,  # (NB_total, Hkv, BSZ, D)
    block_tables: jnp.ndarray,  # (B, NB) int32
    ctx_lens: jnp.ndarray,  # (B,) int32 — PAGED context only (may be <= 0)
    k_stage: jnp.ndarray | None = None,  # (B, Hkv, W, D) dense staging tail
    v_stage: jnp.ndarray | None = None,
    stage_len: jnp.ndarray | None = None,  # scalar int32: valid staging rows
    k_new: jnp.ndarray | None = None,  # (B, Hkv, D) current step's rows,
    v_new: jnp.ndarray | None = None,  # attended in ADDITION to the stage
    *,
    sc_shards: int = 0,  # int8 pages: in-page scale-head shard groups
    block_size: int,
    scale: float,
    ppcb: int = 8,
    dequant_mode: str = "fold",  # "fold" | "s8" (see kernel)
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Hq, D) in q.dtype
    B, Hq, D = q.shape
    Hkv = v_pages.shape[1]
    has_scale = sc_shards > 0
    # The kernel sees the LOCAL shard view (shard_map) or a single device:
    # one [data | scale] group. Multi-group global views only exist on the
    # jnp oracle path (ops/kv_cache.gather_kv_for_seqs).
    assert sc_shards in (0, 1), sc_shards
    assert dequant_mode in ("fold", "s8"), dequant_mode
    G = Hq // Hkv
    # Queries per kv head, padded to the fp32 sublane tile: each batched
    # dot instance's M axis. The compact layout's VPU cost scales with
    # Hkv*Gc*tokens — 8x less than the old head-folded wide layout at
    # Hkv=8 (which also needed a cross-head mask).
    Gc = max(G, 8)
    NB = block_tables.shape[1]
    ppcb = min(ppcb, NB)
    num_chunks = -(-NB // ppcb)
    NB_padded = num_chunks * ppcb
    has_stage = k_stage is not None
    has_new = k_new is not None

    # Clamp out-of-context table entries onto the sequence's page 0 so
    # straggler DMAs of the last partial chunk stay valid and local.
    num_pages = jnp.maximum((ctx_lens + block_size - 1) // block_size, 1)
    steps = jnp.arange(NB_padded, dtype=jnp.int32)[None, :]
    padded_tables = jnp.pad(block_tables, ((0, 0), (0, NB_padded - NB)))
    clamped_tables = jnp.where(
        steps < num_pages[:, None], padded_tables, padded_tables[:, :1]
    )

    qg = q.reshape(B, Hkv, G, D)
    if Gc != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gc - G), (0, 0)))

    if stage_len is None:
        stage_len = jnp.int32(0)
    stage_len = jnp.reshape(stage_len, (1,)).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, Hkv, Gc, D), lambda b, i, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [qg, k_pages, v_pages]
    if has_stage:
        W = k_stage.shape[2]
        in_specs += [
            pl.BlockSpec((1, Hkv, W, D), lambda b, i, *_: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, W, D), lambda b, i, *_: (b, 0, 0, 0)),
        ]
        inputs += [k_stage, v_stage]
    if has_new:
        in_specs += [
            pl.BlockSpec((1, Hkv, D), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, i, *_: (b, 0, 0)),
        ]
        inputs += [k_new, v_new]

    scratch_shapes = [
        pltpu.VMEM((Hkv * Gc, 128), jnp.float32),
        pltpu.VMEM((Hkv * Gc, 128), jnp.float32),
        pltpu.VMEM((2, ppcb, k_pages.shape[1], block_size, D), k_pages.dtype),
        pltpu.VMEM((2, ppcb, Hkv, block_size, D), v_pages.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, num_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, Gc, D), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    kernel = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            block_size=block_size,
            ppcb=ppcb,
            scale=scale,
            num_kv_heads=Hkv,
            has_stage=has_stage,
            has_new=has_new,
            has_scale=has_scale,
            dequant_mode=dequant_mode,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gc, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        # The TPU-flavored interpreter handles DMAs/semaphores on CPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    out = kernel(clamped_tables, ctx_lens, num_pages, stage_len, *inputs)
    return out[:, :, :G].reshape(B, Hq, D).astype(q.dtype)
