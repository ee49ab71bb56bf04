"""Standalone Pallas kernels mirroring the reference's custom-kernel set.

Parity: reference `lightvllm/kernels/cuda_kernels/*.cu` and
`kernels/triton_kernels/*.py` (SURVEY.md §2.2-2.3) — silu_and_mul
(`activation.cu:29-54`), rms_norm / add_rms_norm (`layernorm.cu:23-107`),
row softmax and single-pass online softmax (`softmax.cu:54-111`,
`triton_kernels/softmax.py:131-161`). The reference's warp/block reduce
primitives (`reduce.cu:9-76`) have no TPU analog: the VPU reduces across
lanes natively (jnp reductions inside the kernel).

On the model's hot path XLA already fuses these elementwise chains into
the surrounding matmuls, so the jnp versions in ops/norms.py and
ops/activations.py are the default; these kernels are the explicit-fusion
variants selected by `Config.kernel_backend = "pallas"` (mirroring the
reference's pluggable kernel_backend, config.py:32) and keep the custom
kernel inventory 1:1 testable against jnp oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tiles(n_rows: int, target: int = 256) -> int:
    t = min(target, max(8, n_rows))
    return t


def _pad_rows(x: jnp.ndarray, tile: int) -> tuple[jnp.ndarray, int]:
    rows = x.shape[0]
    padded = -(-rows // tile) * tile
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows),) + ((0, 0),) * (x.ndim - 1))
    return x, padded


# --------------------------- silu_and_mul ---------------------------------


def _swiglu_kernel(g_ref, u_ref, o_ref):
    g = g_ref[...].astype(jnp.float32)
    o_ref[...] = (g * jax.nn.sigmoid(g) * u_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@jax.jit
def swiglu_pallas(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """SiLU(gate) * up, fp32 math (reference activation.cu:29-54)."""
    lead = gate.shape[:-1]
    d = gate.shape[-1]
    g = gate.reshape(-1, d)
    n = g.shape[0]
    tile = _row_tiles(n)
    g, rows = _pad_rows(g, tile)
    u, _ = _pad_rows(up.reshape(-1, d), tile)
    out = pl.pallas_call(
        _swiglu_kernel,
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), gate.dtype),
    )(g, u)
    return out[:n].reshape(*lead, d)


# --------------------------- rms_norm -------------------------------------


def _rms_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[...] = (x * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def rms_norm_pallas(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """fp32-math RMSNorm (reference layernorm.cu:23-52)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    tile = _row_tiles(n)
    xf, rows = _pad_rows(xf, tile)
    out = pl.pallas_call(
        functools.partial(_rms_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
    )(xf, weight.reshape(1, d))
    return out[:n].reshape(*lead, d)


def _add_rms_kernel(x_ref, r_ref, w_ref, o_ref, nr_ref, *, eps):
    s = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    nr_ref[...] = s.astype(nr_ref.dtype)
    var = jnp.mean(s * s, axis=-1, keepdims=True)
    o_ref[...] = (s * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def add_rms_norm_pallas(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + RMSNorm -> (normed, new_residual)
    (reference layernorm.cu:64-107)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    tile = _row_tiles(n)
    xf, rows = _pad_rows(xf, tile)
    rf, _ = _pad_rows(residual.reshape(-1, d), tile)
    spec = pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, new_res = pl.pallas_call(
        functools.partial(_add_rms_kernel, eps=eps),
        grid=(rows // tile,),
        in_specs=[
            spec,
            spec,
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), x.dtype),
            jax.ShapeDtypeStruct((rows, d), x.dtype),
        ),
    )(xf, rf, weight.reshape(1, d))
    return out[:n].reshape(*lead, d), new_res[:n].reshape(*lead, d)


# --------------------------- softmax ---------------------------------------


def _softmax_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    o_ref[...] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(o_ref.dtype)


def _online_softmax_kernel(x_ref, o_ref, m_ref, l_ref, *, chunk):
    """Single-pass online softmax over column chunks with running (m, l)
    merge (reference softmax.cu:71-111, Milakov-Gimelshein; the reference's
    Triton blockwise variant has an acknowledged cross-block race,
    SURVEY.md §2.9.7 — this one is exact: previously written chunks are
    rescaled by alpha before each merge, like flash attention's output)."""
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...].astype(jnp.float32)  # (tile, chunk)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(x, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(x - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
    # Exact merge: rescale everything written so far (untouched columns are
    # zero, so the row-wide multiply is harmless), then write this chunk.
    o_ref[...] = (o_ref[...].astype(jnp.float32) * alpha).astype(o_ref.dtype)
    o_ref[:, pl.ds(c * chunk, chunk)] = p.astype(o_ref.dtype)

    @pl.when(c == n_chunks - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[...] = (o_ref[...].astype(jnp.float32) / l).astype(o_ref.dtype)


@jax.jit
def softmax_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Row softmax, two-pass max/sum in one VMEM block
    (reference softmax.cu:54-67)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    tile = _row_tiles(n, 128)
    xf, rows = _pad_rows(xf, tile)
    out = pl.pallas_call(
        _softmax_kernel,
        grid=(rows // tile,),
        in_specs=[pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
    )(xf)
    return out[:n].reshape(*lead, d)


@functools.partial(jax.jit, static_argnames=("chunk",))
def online_softmax_pallas(x: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Single-pass online softmax streaming column chunks with a running
    (m, l) merge — exact (unlike the reference's racy Triton blockwise
    variant, SURVEY.md §2.9.7)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    chunk = min(chunk, d)
    assert d % chunk == 0 and chunk % 128 == 0, (d, chunk)
    tile = _row_tiles(n, 128)
    xf, rows = _pad_rows(xf, tile)
    out = pl.pallas_call(
        functools.partial(_online_softmax_kernel, chunk=chunk),
        grid=(rows // tile, d // chunk),
        in_specs=[
            pl.BlockSpec((tile, chunk), lambda i, c: (i, c), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xf)
    return out[:n].reshape(*lead, d)
