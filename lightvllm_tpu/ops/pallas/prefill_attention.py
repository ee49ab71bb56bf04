"""Pallas paged varlen flash-attention kernel (prefill).

Parity: replaces the reference's external `flash_attn_varlen_func` call
(`lightvllm/layers/attention.py:159-165`) — causal attention of a
rectangularized batch of new tokens over the block-table-paged KV cache
(which already holds this step's freshly written K/V plus any prefix-cached
context, so prefix-cache hits ride the same path).

Design (TPU-first):
  - grid (B, num_q_tiles, num_kv_chunks), kv innermost: online-softmax state
    (m, l) and the f32 output tile live in VMEM across the kv axis and are
    normalized on the tile's last causally-valid chunk.
  - KV pages are page-major (NB, Hkv, BSZ, D): one page = one contiguous HBM
    region = ONE async DMA for all heads, double-buffered across grid steps
    so the next chunk's fetch overlaps this chunk's compute.
  - Prefill is compute-bound, so unlike the decode kernel there is no
    cross-head masked mega-matmul: each KV head's G = Hq/Hkv query heads
    form a (TQ*G, D) tile and heads loop inside the kernel — zero wasted
    MXU work. Head slices of a fetched page are contiguous (BSZ, D) tiles.
  - Causality prunes the kv axis: chunks past a q-tile's last position (or
    past the sequence's context) are skipped — no DMA, no FLOPs. Chunk 0 is
    always valid for every tile, which keeps pipeline priming trivial.
  - Queries interleave as row = q_pos * G + g so one causal mask (row//G)
    serves every head.
  - INT8 KV scales ride IN-PAGE as trailing K-array scale heads (see
    ops/kv_cache.py) — decoded from the same page DMA, no third stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightvllm_tpu.ops.pallas.decode_attention import decode_inpage_scales

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _page_copies(pages_hbm, buf, sem, tables_ref, b, chunk, buf_idx, ppcb):
    """One whole-page DMA per page in the chunk (all KV heads at once).
    pages_hbm is one layer's (NBtot, H, BSZ, D) page array."""
    return [
        pltpu.make_async_copy(
            pages_hbm.at[tables_ref[b, chunk * ppcb + j]],
            buf.at[buf_idx, j],
            sem.at[buf_idx],
        )
        for j in range(ppcb)
    ]


def _prefill_kernel(
    # scalar prefetch
    tables_ref,  # (B, NB_padded) int32
    ctx_lens_ref,  # (B,) int32 full context length per seq
    cached_lens_ref,  # (B,) int32 prefix-cached tokens per seq
    # inputs
    q_ref,  # (1, Hkv, TQ*G, D) VMEM
    k_hbm,  # (NBtot, Hkv [+ scale heads], BSZ, D) ANY (HBM), one layer
    v_hbm,  # (NBtot, Hkv, BSZ, D)
    # outputs: o_ref (1, Hkv, TQ*G, D) f32 VMEM
    # scratch: m_ref, l_ref (Hkv, TQ*G, 128) f32; k_buf/v_buf; sems;
    #          smem flags
    *refs,
    block_size: int,
    ppcb: int,
    tq: int,
    scale: float,
    num_kv_heads: int,
    group: int,
    has_scale: bool = False,
):
    refs = list(refs)
    o_ref, m_ref, l_ref, k_buf, v_buf, k_sem, v_sem = refs[:7]
    buf_idx_ref, init_ref = refs[7:]
    b = pl.program_id(0)
    qt = pl.program_id(1)
    c = pl.program_id(2)
    num_b = pl.num_programs(0)
    num_qt = pl.num_programs(1)
    num_chunks = pl.num_programs(2)
    chunk_tokens = ppcb * block_size
    ctx = ctx_lens_ref[b]
    cached = cached_lens_ref[b]

    def n_valid_chunks(b_, qt_):
        # Chunks this (seq, q-tile) must visit: up to the causal frontier
        # (last q position of the tile) and the sequence context, >= 1.
        frontier = jnp.minimum(
            cached_lens_ref[b_] + (qt_ + 1) * tq, ctx_lens_ref[b_]
        )
        return jnp.maximum(pl.cdiv(frontier, chunk_tokens), 1)

    nvalid = n_valid_chunks(b, qt)

    def start_chunk(b_, c_, slot):
        for cp in _page_copies(k_hbm, k_buf, k_sem, tables_ref, b_, c_, slot, ppcb):
            cp.start()
        for cp in _page_copies(v_hbm, v_buf, v_sem, tables_ref, b_, c_, slot, ppcb):
            cp.start()

    def wait_chunk(b_, c_, slot):
        for cp in _page_copies(k_hbm, k_buf, k_sem, tables_ref, b_, c_, slot, ppcb):
            cp.wait()
        for cp in _page_copies(v_hbm, v_buf, v_sem, tables_ref, b_, c_, slot, ppcb):
            cp.wait()

    @pl.when((b == 0) & (qt == 0) & (c == 0))
    def _zero_flags():
        init_ref[0] = 0

    @pl.when(c < nvalid)
    def _body():
        @pl.when(c == 0)
        def _init_tile():
            m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
            l_ref[...] = jnp.zeros_like(l_ref)
            o_ref[...] = jnp.zeros_like(o_ref)

        @pl.when(init_ref[0] == 0)
        def _prime():
            init_ref[0] = 1
            buf_idx_ref[0] = 0
            start_chunk(b, c, 0)

        buf_idx = buf_idx_ref[0]

        # Lookahead: chunk 0 is valid for every (b, qt), so the next valid
        # instance is (b, qt, c+1), else (b, qt+1, 0), else (b+1, 0, 0).
        same_tile = (c + 1 < nvalid) & (c + 1 < num_chunks)
        next_qt = jnp.where(same_tile, qt, jnp.where(qt + 1 < num_qt, qt + 1, 0))
        next_b = jnp.where(same_tile | (qt + 1 < num_qt), b, b + 1)
        next_c = jnp.where(same_tile, c + 1, 0)
        has_next = same_tile | (qt + 1 < num_qt) | (b + 1 < num_b)

        @pl.when(has_next)
        def _prefetch():
            nxt = 1 - buf_idx
            start_chunk(next_b, next_c, nxt)
            buf_idx_ref[0] = nxt

        wait_chunk(b, c, buf_idx)

        if has_scale:
            sc_k, sc_v = decode_inpage_scales(
                k_buf[buf_idx][:, num_kv_heads:], num_kv_heads
            )  # (ppcb, Hkv, D) f32 each

        rows = tq * group
        # One causal mask serves all heads: row r is query position
        # cached + qt*tq + r//group; buffer column j is kv position
        # c*chunk_tokens + j (pages in a chunk are consecutive table slots).
        q_pos = (
            cached
            + qt * tq
            + jax.lax.broadcasted_iota(jnp.int32, (rows, chunk_tokens), 0) // group
        )
        kv_pos = c * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, (rows, chunk_tokens), 1
        )
        mask = (kv_pos <= q_pos) & (kv_pos < ctx)

        is_last = jnp.logical_not(same_tile)
        # bf16 compute for sub-bf16 (scale-free e4m3 / int8) pages.
        cd = jnp.bfloat16 if jnp.dtype(k_buf.dtype).itemsize < 2 else k_buf.dtype
        for h in range(num_kv_heads):
            q = q_ref[0, h].astype(jnp.float32) * scale  # (rows, D)
            # Cast before the sublane-merging reshape (slow relayout on
            # 8-bit arrays; see the decode kernel).
            k3 = k_buf[buf_idx, :, h].astype(cd)  # (ppcb, BSZ, D)
            if has_scale:
                # One bf16 VPU pass (see the decode kernel note).
                k3 = k3 * sc_k[:, h][:, None, :].astype(cd)
            k = k3.reshape(chunk_tokens, -1)
            s = jax.lax.dot_general(
                q.astype(cd),
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, chunk_tokens)
            s = jnp.where(mask, s, MASK_VALUE)

            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[h] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_next, l_ref.shape[1:])

            v3 = v_buf[buf_idx, :, h].astype(cd)
            if has_scale:
                v3 = v3 * sc_v[:, h][:, None, :].astype(cd)
            v = v3.reshape(chunk_tokens, -1)
            o_cur = jax.lax.dot(
                p.astype(cd), v, preferred_element_type=jnp.float32
            )  # (rows, D)
            o_prev = o_ref[0, h]
            o_next = o_prev * alpha + o_cur

            # Rows always have at least kv position 0 unmasked (0 <= q_pos,
            # 0 < ctx), so l > 0 and the divide is safe.
            @pl.when(is_last)
            def _final(o=o_next, l=l_next, h=h):
                o_ref[0, h] = o / l

            @pl.when(jnp.logical_not(is_last))
            def _carry(o=o_next, h=h):
                o_ref[0, h] = o


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_size", "scale", "ppcb", "tq", "sc_shards", "interpret"
    ),
)
def paged_flash_prefill(
    q: jnp.ndarray,  # (B, Sq, Hq, D) rectangular new-token queries, rope'd
    k_pages: jnp.ndarray,  # (NBtot, Hkv [+ scale heads], BSZ, D)
    v_pages: jnp.ndarray,  # (NBtot, Hkv, BSZ, D)
    block_tables: jnp.ndarray,  # (B, NB) int32
    ctx_lens: jnp.ndarray,  # (B,) int32 full lengths (cached + new)
    cached_lens: jnp.ndarray,  # (B,) int32 prefix-cached lengths
    *,
    sc_shards: int = 0,  # int8 pages: in-page scale-head shard groups
    block_size: int,
    scale: float,
    ppcb: int = 8,
    tq: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:  # (B, Sq, Hq, D) in q.dtype
    B, Sq, Hq, D = q.shape
    Hkv = v_pages.shape[1]
    has_scale = sc_shards > 0
    assert sc_shards in (0, 1), sc_shards  # local shard view (see decode)
    G = Hq // Hkv
    NB = block_tables.shape[1]
    ppcb = min(ppcb, NB)
    num_chunks = -(-NB // ppcb)
    NB_padded = num_chunks * ppcb

    tq = min(tq, max(8, Sq))
    Sqp = -(-Sq // tq) * tq
    num_qt = Sqp // tq

    # Padding rows must look like 1-token fresh sequences so chunk 0 is
    # always valid and their normalization divide stays safe.
    ctx_lens = jnp.maximum(ctx_lens, 1)
    cached_lens = jnp.minimum(cached_lens, ctx_lens - 1)

    # Clamp out-of-context table entries onto the sequence's page 0 so
    # straggler DMAs of the last partial chunk stay valid and local.
    num_pages = (ctx_lens + block_size - 1) // block_size
    steps = jnp.arange(NB_padded, dtype=jnp.int32)[None, :]
    padded_tables = jnp.pad(block_tables, ((0, 0), (0, NB_padded - NB)))
    clamped_tables = jnp.where(
        steps < num_pages[:, None], padded_tables, padded_tables[:, :1]
    )

    # (B, Sq, Hkv, G, D) -> (B, Hkv, Sq, G, D) -> rows interleaved q_pos*G+g.
    qg = q.reshape(B, Sq, Hkv, G, D).transpose(0, 2, 1, 3, 4)
    if Sqp != Sq:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Sqp - Sq), (0, 0), (0, 0)))
    qg = qg.reshape(B, Hkv, Sqp * G, D)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, Hkv, tq * G, D), lambda b, qt, c, *_: (b, 0, qt, 0)),
        any_spec,
        any_spec,
    ]
    inputs = [qg, k_pages, v_pages]
    scratch_shapes = [
        pltpu.VMEM((Hkv, tq * G, 128), jnp.float32),
        pltpu.VMEM((Hkv, tq * G, 128), jnp.float32),
        pltpu.VMEM((2, ppcb, k_pages.shape[1], block_size, D), k_pages.dtype),
        pltpu.VMEM((2, ppcb, Hkv, block_size, D), v_pages.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, num_qt, num_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hkv, tq * G, D), lambda b, qt, c, *_: (b, 0, qt, 0)
        ),
        scratch_shapes=scratch_shapes,
    )

    kernel = pl.pallas_call(
        functools.partial(
            _prefill_kernel,
            block_size=block_size,
            ppcb=ppcb,
            tq=tq,
            scale=scale,
            num_kv_heads=Hkv,
            group=G,
            has_scale=has_scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Sqp * G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # The default 16 MB scoped-VMEM budget is 124 KB short at
            # G=4 (Hq=32) tq=128: q/o pipeline blocks (6 MB) + m/l (4 MB)
            # + double-buffered pages (4 MB) + the (rows, chunk) score
            # temps. First caught by tools/tpu_smoke.py under real Mosaic
            # (interpret mode has no VMEM model).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    out = kernel(clamped_tables, ctx_lens, cached_lens, *inputs)
    # (B, Hkv, Sqp*G, D) -> (B, Sqp, Hq, D) -> strip padding.
    out = out.reshape(B, Hkv, Sqp, G, D).transpose(0, 2, 1, 3, 4)
    return out[:, :Sq].reshape(B, Sq, Hq, D).astype(q.dtype)
