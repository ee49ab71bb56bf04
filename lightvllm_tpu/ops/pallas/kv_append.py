"""Pallas in-place KV append for decode steps (EXPERIMENTAL — not wired).

Correct in interpret mode (tests/test_kv_append.py) but Mosaic rejects the
compiled form on v5e: bf16 HBM DMA destinations must be 2-sublane aligned,
and a single-token row write is 1 sublane. Kept as groundwork; see the
note in ops/kv_cache.py::write_kv_layer for the design trade-offs.

Parity: the reference's production KV write is a Triton scatter
(`lightvllm/layers/attention.py:9-52`). Our prefill path uses an in-place
XLA scatter (layout-pinned, see ops/kv_cache.py), but XLA lowers scatter to
a SERIAL per-row loop on TPU — at decode batch 64 that is ~3.5 ms/step
across 28 layers for 64 tiny rows. This kernel instead issues one async
DMA per token (all KV heads at once) with the page arrays aliased in/out,
so the write costs ~B DMA issues and no buffer copy.

Only used for decode-sized T (<= max batch); prefill's thousands of rows
amortize the XLA scatter loop fine and would need thousands of DMAs here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _append_kernel(
    slots_ref,  # SMEM (B,) int32; < 0 = padding, skip
    k_new_ref,  # VMEM (B, Hkv, 1, D)
    v_new_ref,
    k_pages_in,  # ANY (NB, Hkv, BSZ, D), aliased to outputs
    v_pages_in,
    k_pages_out,
    v_pages_out,
    k_sems,  # DMA sems (B,)
    v_sems,
    *,
    block_size: int,
    batch: int,
):
    max_slot = k_pages_out.shape[0] * block_size
    for b in range(batch):
        slot = slots_ref[b]
        valid = (slot >= 0) & (slot < max_slot)  # PAD_SLOT (int32 max) skips
        page = jax.lax.div(slot, block_size)
        row = jax.lax.rem(slot, block_size)

        @pl.when(valid)
        def _start(b=b, page=page, row=row):
            pltpu.make_async_copy(
                k_new_ref.at[b],
                k_pages_out.at[page, :, pl.ds(row, 1)],
                k_sems.at[b],
            ).start()
            pltpu.make_async_copy(
                v_new_ref.at[b],
                v_pages_out.at[page, :, pl.ds(row, 1)],
                v_sems.at[b],
            ).start()

    for b in range(batch):
        slot = slots_ref[b]
        valid = (slot >= 0) & (slot < max_slot)
        page = jax.lax.div(slot, block_size)
        row = jax.lax.rem(slot, block_size)

        @pl.when(valid)
        def _wait(b=b, page=page, row=row):
            pltpu.make_async_copy(
                k_new_ref.at[b],
                k_pages_out.at[page, :, pl.ds(row, 1)],
                k_sems.at[b],
            ).wait()
            pltpu.make_async_copy(
                v_new_ref.at[b],
                v_pages_out.at[page, :, pl.ds(row, 1)],
                v_sems.at[b],
            ).wait()


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def kv_append_pallas(
    k_pages: jnp.ndarray,  # (NB, Hkv, BSZ, D), one layer's pages
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,  # (B, Hkv, D), already in the cache dtype
    v_new: jnp.ndarray,
    slots: jnp.ndarray,  # (B,) int32; < 0 = padding (skipped)
    *,
    block_size: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B, Hkv, D = k_new.shape
    kernel = pl.pallas_call(
        functools.partial(_append_kernel, block_size=block_size, batch=B),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        input_output_aliases={3: 0, 4: 1},
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA((B,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    return kernel(
        slots.astype(jnp.int32),
        k_new.reshape(B, Hkv, 1, D),
        v_new.reshape(B, Hkv, 1, D),
        k_pages,
        v_pages,
    )
