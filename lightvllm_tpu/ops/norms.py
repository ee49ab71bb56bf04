"""RMSNorm ops.

Parity: reference `lightvllm/layers/layernorm.py:28-80` (fp32-math RMSNorm and
fused residual-add + RMSNorm returning (normed, new_residual)). Here these are
pure functions; XLA fuses them into neighboring ops, and a Pallas variant
exists in ops/pallas/fused_norm.py for explicit fusion on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(orig_dtype)


def add_rms_norm(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual add + RMSNorm: returns (normed(x+res), x+res)."""
    new_residual = x + residual
    return rms_norm(new_residual, weight, eps), new_residual
