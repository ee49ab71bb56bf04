"""Rotary position embeddings.

Parity: reference `lightvllm/layers/rotary_embedding.py:5-131` (half-split
rotation, fp32 math, precomputed inv_freq; no rope_scaling). TPU-first: no
cos/sin cache table — computing cos/sin from positions inside the jitted step
is a handful of VPU transcendentals, fuses with the surrounding ops, and
avoids an HBM gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_rope(
    q: jnp.ndarray,  # (T, Hq, D)
    k: jnp.ndarray,  # (T, Hkv, D)
    positions: jnp.ndarray,  # (T,) int32
    theta: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    head_dim = q.shape[-1]
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (T, half)
    cos = jnp.cos(freqs)[:, None, :]  # (T, 1, half)
    sin = jnp.sin(freqs)[:, None, :]

    def rotate(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rotate(q), rotate(k)
