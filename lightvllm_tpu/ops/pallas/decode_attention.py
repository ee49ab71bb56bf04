"""Pallas paged flash-decode kernel.

Parity: replaces the reference's external `flash_attn_with_kvcache` call
(`lightvllm/layers/attention.py:172-175`) — one query token per sequence
attending over a block-table-paged KV cache.

Design (TPU-first):
  - KV pages are page-major (NB, Hkv, BSZ, D): one page = one contiguous
    HBM region = ONE async DMA for all heads (measured: one-DMA-per-
    (head,page) designs were latency-bound at ~56-126 GB/s).
  - grid (B, num_chunks): each step gathers pages_per_chunk pages with
    concurrent DMAs into double-buffered VMEM and computes all KV heads'
    online-softmax updates; the next chunk's DMAs are issued first
    (double buffering hides HBM latency behind compute).
  - online softmax in fp32 with running (m, l) VMEM scratch; output block
    revisits across the chunk axis and is normalized on the sequence's
    last real chunk.
  - GQA: per KV head, its G = Hq/Hkv query heads form one (G, D) tile
    (padded to the fp32 sublane tile 8). Head slices of a fetched page are
    contiguous (BSZ, D) tiles — no relayout.
  - chunks fully beyond a sequence's context are skipped (no DMA, no
    FLOPs). Callers must clamp padding rows' ctx_lens to >= 1.
  - FP8 KV is scale-free e4m3 (see ops/kv_cache.py): pages upcast to bf16
    inside the MXU matmuls; no scale arrays, no extra DMAs — the kernel
    handles it purely through the compute dtype.
  - INT8 KV scales ride IN-PAGE (ops/kv_cache.py module docstring): the K
    page carries trailing scale heads, so the page DMA delivers data +
    scales together — no third DMA stream, no scale semaphores, and a
    zeroed page region decodes to scale 0.0 (no NaN-garbage hazard). The
    kernel decodes the bf16 byte planes with widen/shift/int32->f32
    bitcast on a (4*SPL, D)-sized sliver — negligible VPU work next to
    the dequant multiply itself.
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
# (the engine sets this from Config.attn_dequant_mode at runner init):
#   "fold" — per-page K scale folded into q, bf16 MXU dots
#   "page" — page-side dequant, single big bf16 dot per chunk
#   "s8"   — quantized folded-q and p, s8 x s8 -> s32 MXU dots (no casts)
DECODE_DEQUANT_MODE = "fold"


def set_decode_dequant_mode(mode: str) -> None:
    global DECODE_DEQUANT_MODE
    assert mode in ("fold", "page", "s8"), mode
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


def _decode_kernel(
    # scalar prefetch
    tables_ref,  # (B, NB_padded) int32
    ctx_lens_ref,  # (B,) int32
    npages_ref,  # (B,) int32 valid pages per seq (>= 1): gates page DMAs
    stage_len_ref,  # (1,) int32 (number of valid staging rows; 0 = no stage)
    # inputs
    q_ref,  # (1, HG = Hkv*Gp, D) VMEM — Gp is the MINIMAL group pad
    k_hbm,  # (NBtot, Hkv [+ scale heads], BSZ, D) ANY (HBM), one layer
    v_hbm,  # (NBtot, Hkv, BSZ, D)
    # [ks_ref, vs_ref] when has_stage: (1, Hkv, W, D) VMEM staging tail
    # outputs
    # o_ref (1, HG, D) f32 VMEM
    # scratch: m_ref, l_ref (HG, 128) f32; hmask_ref (HG, Tbig) f32
    #          additive head mask (0 / MASK, grid-invariant, built once);
    #          k_buf/v_buf; sems; smem flags
    *refs,
    block_size: int,
    ppcb: int,
    scale: float,
    num_kv_heads: int,
    group_pad: int,  # Gp: queries per kv head incl. minimal sublane pad
    has_stage: bool,
    has_new: bool = False,  # current-step K/V rows passed separately
    has_scale: bool = False,  # int8 pages with in-page scale heads
    dequant_mode: str = "fold",  # "fold" (into q / output) | "page"
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
    (
        o_ref, m_ref, l_ref, hmask_ref, relpos_ref, k_buf, v_buf,
        k_sem, v_sem,
    ) = refs[:9]
    buf_idx_ref, init_ref = refs[9:]
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_b = pl.num_programs(0)
    num_chunks = pl.num_programs(1)
    chunk_tokens = ppcb * block_size
    ctx = ctx_lens_ref[b]

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
        # Grid-invariant mask ingredients, built ONCE: the additive head
        # mask (0 on diagonal blocks, MASK off them) and the within-chunk
        # token positions (chunk-relative, so `pos < ctx` becomes a
        # broadcast compare against ctx - chunk_base). The old per-chunk
        # iota/div/mod/compare/and/select chain on (HG, Tbig) was ~half the
        # kernel's VPU time.
        HGm, Tm = hmask_ref.shape
        rh = jax.lax.broadcasted_iota(jnp.int32, (HGm, Tm), 0) // group_pad
        colm = jax.lax.broadcasted_iota(jnp.int32, (HGm, Tm), 1)
        ch = (colm // block_size) % num_kv_heads
        hmask_ref[...] = jnp.where(rh == ch, 0.0, MASK_VALUE)
        colr = jax.lax.broadcasted_iota(
            jnp.int32, relpos_ref.shape, 1
        )
        relpos_ref[...] = (
            (colr // (num_kv_heads * block_size)) * block_size
            + colr % block_size
        ).astype(jnp.float32)

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

        # Wait for this chunk's K pages. All heads fold into ONE matmul pair:
        # Q_all (Hkv*Gp, D) @ K_chunk (D, ppcb*Hkv*BSZ) computes every
        # (q-head, kv-head) pair; cross-head scores are masked to -inf so
        # their softmax weight is exactly 0 and a single P @ V_chunk matmul
        # yields correct per-head outputs. Decode is HBM-bound, so the extra
        # MXU work is cheap — and under tensor parallelism the local Hkv
        # (the waste factor) shrinks toward 1.
        _run_chunk_copies(
            "wait",
            _chunk_copies(k_hbm, k_buf, k_sem, tables_ref, b, i, buf_idx, ppcb),
            npages_ref, b, i, ppcb,
        )

        Hkv = num_kv_heads
        Gp = group_pad
        HG = q_ref.shape[1]  # Hkv * Gp
        Tbig = ppcb * Hkv * block_size
        cd = _compute_dtype(k_buf.dtype)
        q = q_ref[0].astype(jnp.float32) * scale  # (HG, D)
        kslab = k_buf[buf_idx]  # (ppcb, Hkv [+Sh], BSZ, D)
        if has_scale:
            # In-page scales rode the K page DMA we just waited on.
            sc_k, sc_v = decode_inpage_scales(kslab[:, Hkv:], Hkv)
            kslab = kslab[:, :Hkv]
        # Cast BEFORE the sublane-merging reshape: reshaping an 8-bit (fp8)
        # array across sublane dims lowers to a slow Mosaic relayout
        # (measured ~1.9 ms/layer vs 0.3 for bf16); the elementwise cast on
        # the native page layout is cheap and the bf16 reshape is free.
        # ("s8" mode skips the cast entirely — the int8 page feeds the MXU.)
        if not (has_scale and dequant_mode == "s8"):
            k4 = kslab.astype(cd)  # (ppcb, Hkv, BSZ, D); exact in cd
        if has_scale and dequant_mode == "page":
            # Page-side dequant: multiply the page by its per-(page, head,
            # channel) scale so BOTH score and output matmuls run the
            # single-big-matmul (no per-page split) path below. BSZ/Gp more
            # VPU multiplies than the q/output fold, but ONE dot per chunk
            # instead of ppcb small ones — A/B'd on hardware
            # (tools/profile_attn.py --dequant page).
            k4 = (k4.astype(jnp.float32) * sc_k[:, :, None, :]).astype(cd)
        if has_scale and dequant_mode == "s8":
            # int8-MXU scores: fold the per-(page, head, channel) K scale
            # into q (as in "fold"), then QUANTIZE the folded q per row so
            # the score dot runs s8 x s8 -> s32 — the int8 K page feeds the
            # MXU with NO elementwise cast at all (the int8->bf16 slab
            # convert was the fold path's largest VPU term: ~1M elements
            # per chunk). Products are exact in s32; the only new error is
            # the per-row q rounding (~0.4% relative).
            qs = (
                q.reshape(Hkv, Gp, -1)[None, :, :, :]
                * sc_k[:, :, None, :]
            )  # (ppcb, Hkv, Gp, D) f32
            aq = jnp.maximum(
                jnp.max(jnp.abs(qs), axis=3, keepdims=True), 1e-30
            )
            qs8 = jnp.round(qs * (127.0 / aq)).astype(jnp.int8)
            sq_row = aq.reshape(ppcb, HG, 1) * (1.0 / 127.0)
            s = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        qs8[pg].reshape(HG, -1),
                        kslab[pg].reshape(Hkv * block_size, -1),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    * sq_row[pg]
                    for pg in range(ppcb)
                ],
                axis=1,
            )  # (HG, Tbig)
        elif has_scale and dequant_mode == "fold":
            # Dequant by folding the per-(page, head, channel) K scale into
            # q, not into the page: q*sc_k is (ppcb, HG, D) VPU work vs
            # (ppcb, Hkv, BSZ, D) for page-side dequant — BSZ/Gp (8x at
            # BSZ=64) fewer multiplies, and the int8 page feeds the MXU
            # unmodified (values <= 127 are exact in bf16). Scores become
            # sum_d (q_d sc_d) k_d — identical math, page-batched matmuls.
            qs = (
                q.reshape(Hkv, Gp, -1)[None, :, :, :]
                * sc_k[:, :, None, :]
            ).astype(cd)  # (ppcb, Hkv, Gp, D)
            s = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        qs[pg].reshape(HG, -1),
                        k4[pg].reshape(Hkv * block_size, -1),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for pg in range(ppcb)
                ],
                axis=1,
            )  # (HG, Tbig) — same (page, head, token) column order
        else:
            k = k4.reshape(Tbig, -1)  # (Tbig, D)
            s = jax.lax.dot_general(
                q.astype(cd),
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (HG, Tbig)

        # Masking: one add (precomputed head mask) + one broadcast compare/
        # select (precomputed within-chunk positions vs ctx - chunk base) —
        # replaces the old per-chunk iota/div/mod/compare/and/select chain
        # (~half the kernel's VPU time at decode shapes).
        lim = (ctx - i * chunk_tokens).astype(jnp.float32)
        s = jnp.where(relpos_ref[:1] < lim, s + hmask_ref[...], MASK_VALUE)

        m_prev = m_ref[:, :1]  # (HG, 1)
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # (HG, Tbig); exact zeros off-head
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        _run_chunk_copies(
            "wait",
            _chunk_copies(v_hbm, v_buf, v_sem, tables_ref, b, i, buf_idx, ppcb),
            npages_ref, b, i, ppcb,
        )
        if has_scale and dequant_mode == "s8":
            # int8-MXU PV: p in [0, 1] with max exactly 1 per visited row,
            # so a FIXED 127 scale quantizes it (masked entries stay exact
            # zeros — the cross-head property the fold relies on). The V
            # page again feeds the MXU uncast; per-page output partials
            # rescale by sc_v/127 in f32.
            p8 = jnp.round(p * 127.0).astype(jnp.int8)
            vslab = v_buf[buf_idx]  # (ppcb, Hkv, BSZ, D) int8, uncast
            T1 = Hkv * block_size
            D_ = vslab.shape[-1]
            sc_v_rows = jnp.broadcast_to(
                sc_v[:, :, None, :], (ppcb, Hkv, Gp, D_)
            ).reshape(ppcb, HG, D_)
            o_cur = jnp.zeros((HG, D_), jnp.float32)
            for pg in range(ppcb):
                o_pg = jax.lax.dot(
                    p8[:, pg * T1 : (pg + 1) * T1],
                    vslab[pg].reshape(T1, -1),
                    preferred_element_type=jnp.int32,
                )  # (HG, D) s32, exact
                o_cur = o_cur + o_pg.astype(jnp.float32) * (
                    sc_v_rows[pg] * (1.0 / 127.0)
                )
        elif has_scale and dequant_mode == "fold":
            # V dequant folds into the per-page partial output: row hg of
            # p_pg @ v_pg only accumulates tokens of head hg//Gp (cross-head
            # scores are exact zeros), so the per-(page, head, channel) V
            # scale multiplies the (HG, D) partial in f32 — BSZ/Gp fewer
            # VPU ops than page-side dequant, and the rescale happens in
            # f32 output domain (strictly tighter than bf16 page dequant).
            v4 = v_buf[buf_idx].astype(cd)
            pcd = p.astype(cd)
            T1 = Hkv * block_size
            D_ = v4.shape[-1]
            sc_v_rows = jnp.broadcast_to(
                sc_v[:, :, None, :], (ppcb, Hkv, Gp, D_)
            ).reshape(ppcb, HG, D_)
            o_cur = jnp.zeros((HG, D_), jnp.float32)
            for pg in range(ppcb):
                o_pg = jax.lax.dot(
                    pcd[:, pg * T1 : (pg + 1) * T1],
                    v4[pg].reshape(T1, -1),
                    preferred_element_type=jnp.float32,
                )  # (HG, D)
                o_cur = o_cur + o_pg * sc_v_rows[pg]
        else:
            v4 = v_buf[buf_idx].astype(cd)
            if has_scale and dequant_mode == "page":
                v4 = (
                    v4.astype(jnp.float32) * sc_v[:, :, None, :]
                ).astype(cd)
            v = v4.reshape(Tbig, -1)  # (Tbig, D)
            o_cur = jax.lax.dot(
                p.astype(cd), v, preferred_element_type=jnp.float32
            )  # (HG, D)
        o_ref[0] = o_ref[0] * alpha + o_cur  # (HG, D)

        # On this sequence's last real chunk: fold in the dense staging tail
        # (the current decode window's unflushed tokens), then normalize.
        @pl.when(jnp.logical_not(same_seq))
        def _finalize():
            if has_stage:
                W = ks_ref.shape[2]
                ks = ks_ref[0].astype(cd).reshape(Hkv * W, -1)  # (Hkv*W, D)
                s2 = jax.lax.dot_general(
                    q.astype(cd),
                    ks,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (HG, Hkv*W)
                rh = jax.lax.broadcasted_iota(jnp.int32, (HG, Hkv * W), 0) // Gp
                c2 = jax.lax.broadcasted_iota(jnp.int32, (HG, Hkv * W), 1)
                ch2 = c2 // W
                s2 = jnp.where(
                    (rh == ch2) & (c2 % W < stage_len_ref[0]), s2, MASK_VALUE
                )
                m_prev2 = m_ref[:, :1]
                l_prev2 = l_ref[:, :1]
                m_cur2 = jnp.max(s2, axis=-1, keepdims=True)
                m_next2 = jnp.maximum(m_prev2, m_cur2)
                alpha2 = jnp.exp(m_prev2 - m_next2)
                p2 = jnp.exp(s2 - m_next2)
                l_ref[...] = jnp.broadcast_to(
                    alpha2 * l_prev2 + jnp.sum(p2, axis=-1, keepdims=True),
                    l_ref.shape,
                )
                vs = vs_ref[0].astype(cd).reshape(Hkv * W, -1)
                o2 = jax.lax.dot(
                    p2.astype(cd), vs, preferred_element_type=jnp.float32
                )
                o_ref[0] = o_ref[0] * alpha2 + o2
            if has_new:
                # Current step's K/V rows, passed SEPARATELY from the
                # staging buffer so the per-step staging update's only
                # consumer is the scan carry (XLA then updates it in
                # place; feeding the updated buffer to this kernel forced
                # a full-buffer copy per layer per step — measured
                # 8.2 us x72/step of dynamic_update_slice in the trace).
                kn = kn_ref[0].astype(cd)  # (Hkv, D)
                s3 = jax.lax.dot_general(
                    q.astype(cd), kn,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (HG, Hkv)
                rh3 = (
                    jax.lax.broadcasted_iota(jnp.int32, (HG, Hkv), 0) // Gp
                )
                ch3 = jax.lax.broadcasted_iota(jnp.int32, (HG, Hkv), 1)
                s3 = jnp.where(rh3 == ch3, s3, MASK_VALUE)
                m_prev3 = m_ref[:, :1]
                l_prev3 = l_ref[:, :1]
                m_next3 = jnp.maximum(
                    m_prev3, jnp.max(s3, axis=-1, keepdims=True)
                )
                alpha3 = jnp.exp(m_prev3 - m_next3)
                p3 = jnp.exp(s3 - m_next3)
                l_ref[...] = jnp.broadcast_to(
                    alpha3 * l_prev3 + jnp.sum(p3, axis=-1, keepdims=True),
                    l_ref.shape,
                )
                o3 = jax.lax.dot(
                    p3.astype(cd), vn_ref[0].astype(cd),
                    preferred_element_type=jnp.float32,
                )  # (HG, D)
                o_ref[0] = o_ref[0] * alpha3 + o3
            l = l_ref[:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0] = o_ref[0] * l_inv


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
    dequant_mode: str = "fold",  # int8 dequant: "fold" | "page" (see kernel)
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Hq, D) in q.dtype
    B, Hq, D = q.shape
    Hkv = v_pages.shape[1]
    has_scale = sc_shards > 0
    # The kernel sees the LOCAL shard view (shard_map) or a single device:
    # one [data | scale] group. Multi-group global views only exist on the
    # jnp oracle path (ops/kv_cache.gather_kv_for_seqs).
    assert sc_shards in (0, 1), sc_shards
    G = Hq // Hkv
    # MINIMAL group pad: HG = Hkv*Gp only needs to land on the fp32
    # sublane tile (8 rows). The old per-head pad (Gp = max(G, 8)) doubled
    # every score-matrix row at the 8B ratio (G=4 -> 8, HG 32 -> 64) —
    # i.e. 2x the mask/exp VPU work and 2x the matmul rows, for rows that
    # were sliced away.
    Gp = G
    while (Hkv * Gp) % 8:
        Gp += 1
    HG = Hkv * Gp
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

    # (B, Hq, D) rows are already grouped by kv head; when Gp == G the q
    # array passes through UNCHANGED (no relayout, no padding rows).
    if Gp != G:
        qg = jnp.pad(
            q.reshape(B, Hkv, G, D), ((0, 0), (0, 0), (0, Gp - G), (0, 0))
        ).reshape(B, HG, D)
    else:
        qg = q

    if stage_len is None:
        stage_len = jnp.int32(0)
    stage_len = jnp.reshape(stage_len, (1,)).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, HG, D), lambda b, i, *_: (b, 0, 0)),
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

    Tbig = ppcb * Hkv * block_size
    scratch_shapes = [
        pltpu.VMEM((HG, 128), jnp.float32),
        pltpu.VMEM((HG, 128), jnp.float32),
        pltpu.VMEM((HG, Tbig), jnp.float32),  # additive head mask
        pltpu.VMEM((8, Tbig), jnp.float32),  # within-chunk positions
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
        out_specs=pl.BlockSpec((1, HG, D), lambda b, i, *_: (b, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    kernel = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            block_size=block_size,
            ppcb=ppcb,
            scale=scale,
            num_kv_heads=Hkv,
            group_pad=Gp,
            has_stage=has_stage,
            has_new=has_new,
            has_scale=has_scale,
            dequant_mode=dequant_mode,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HG, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        # The TPU-flavored interpreter handles DMAs/semaphores on CPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    out = kernel(clamped_tables, ctx_lens, num_pages, stage_len, *inputs)
    if Gp != G:
        out = out.reshape(B, Hkv, Gp, D)[:, :, :G]
    return out.reshape(B, Hq, D).astype(q.dtype)
