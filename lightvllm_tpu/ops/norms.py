"""RMSNorm ops.

Parity: reference `lightvllm/layers/layernorm.py:28-80` (fp32-math RMSNorm and
fused residual-add + RMSNorm returning (normed, new_residual)) and the CUDA
kernels `kernels/cuda_kernels/layernorm.cu:23-107`. The jnp path is the
default (XLA fuses it into neighbors); `Config.kernel_backend = "pallas"`
swaps in the explicit kernels from ops/pallas/elementwise.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops import backend


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    if backend.use_pallas():
        from lightvllm_tpu.ops.pallas.elementwise import rms_norm_pallas

        return rms_norm_pallas(x, weight, eps)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(orig_dtype)


def add_rms_norm(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual add + RMSNorm: returns (normed(x+res), x+res)."""
    if backend.use_pallas():
        from lightvllm_tpu.ops.pallas.elementwise import add_rms_norm_pallas

        return add_rms_norm_pallas(x, residual, weight, eps)
    new_residual = x + residual
    return rms_norm(new_residual, weight, eps), new_residual
