"""Standalone Pallas tiled GEMM — the TPU twin of the reference's
sliced-K shared-memory CUDA GEMM (`lightvllm/kernels/cuda_kernels/gemm.cu:28-80`
`sgemm_sliced_k_f32_kernel<BM,BN,BK>`, launcher `:83-102`).

Like the reference kernel it is a standalone, tested building block rather
than the production projection path (the reference never wires its GEMM
into the model either — SURVEY.md §2.9.1; here dense projections belong to
XLA's own MXU matmul and quantized ones to ops/pallas/quant_matmul.py,
PARITY.md). The mapping of the CUDA structure onto TPU:

  CUDA shared-memory A/B tiles  ->  VMEM blocks via pl.BlockSpec
  BM x BN thread block          ->  (TM, TN) grid tile on the MXU
  sliced-K loop over BK chunks  ->  innermost grid axis k with an f32
                                    VMEM accumulator scratch (same
                                    accumulate-then-write structure as
                                    the CUDA registers' `sum`)

Supports f32 and bf16 inputs; accumulation is always f32
(preferred_element_type), matching the CUDA kernel's f32 math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gemm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _write():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _tile(total: int, target: int, quantum: int) -> int:
    """Largest multiple of `quantum` dividing `total`, capped at target.
    Dims smaller than the quantum use the whole dim (Mosaic pads the
    trailing tile internally)."""
    if total < quantum:
        return total
    best = quantum if total % quantum == 0 else total
    t = quantum
    while t <= min(total, target):
        if total % t == 0:
            best = t
        t += quantum
    return best


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def gemm_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    tm: int | None = None,
    tn: int | None = None,
    tk: int | None = None,
) -> jnp.ndarray:
    """C[M,N] = A[M,K] @ B[K,N], tiled (TM, TN, sliced-K TK) on the MXU.

    Shapes must be multiples of the lane/sublane quanta (8, 128) after tile
    selection; arbitrary shapes go through the jnp oracle in callers — this
    kernel is the §2.2 parity twin, exercised standalone like the
    reference's (`lightvllm/test/test_gemm.py:40-65`).
    """
    (M, K), (K2, N) = a.shape, b.shape
    assert K == K2, (a.shape, b.shape)
    tm = tm or _tile(M, 256, 8)
    tn = tn or _tile(N, 256, 128)
    tk = tk or _tile(K, 512, 128)
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (
        f"({M},{K})x({K},{N}) not tileable by ({tm},{tn},{tk})"
    )
    nk = K // tk
    out_dtype = jnp.promote_types(a.dtype, b.dtype)
    return pl.pallas_call(
        functools.partial(_gemm_kernel, nk=nk, out_dtype=out_dtype),
        grid=(M // tm, N // tn, nk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)
