"""Rotary position embeddings, with optional rope_scaling.

Parity: reference `lightvllm/layers/rotary_embedding.py:5-131` (half-split
rotation, fp32 math, precomputed inv_freq). The reference asserts
rope_scaling away (`rotary_embedding.py:158`); here the three schemes that
ship in the advertised model families are implemented — "linear",
"llama3" (Llama-3.x checkpoints), and "yarn" (long-context Qwen) — and any
other scheme is rejected loudly at spec construction.

TPU-first: no cos/sin cache table — cos/sin are computed from positions
inside the jitted step (a handful of VPU transcendentals that fuse with the
surrounding ops, avoiding an HBM gather). The scaled inv_freq vector is
computed in numpy at trace time from static config, so it is a compile-time
constant to XLA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

SUPPORTED_ROPE_TYPES = ("linear", "llama3", "yarn")


def normalize_rope_scaling(rope_scaling) -> tuple | None:
    """HF config dict -> hashable tuple (safe inside a frozen ModelSpec).

    Raises on unsupported schemes instead of silently producing wrong
    numerics (the reference's equivalent guard: rotary_embedding.py:158).
    """
    if rope_scaling is None:
        return None
    if isinstance(rope_scaling, tuple):
        return rope_scaling
    d = dict(rope_scaling)
    rope_type = d.pop("rope_type", None) or d.pop("type", None)
    if rope_type in (None, "default"):
        return None
    if rope_type not in SUPPORTED_ROPE_TYPES:
        raise ValueError(
            f"unsupported rope_scaling type {rope_type!r}; "
            f"supported: {SUPPORTED_ROPE_TYPES}"
        )
    items = tuple(
        (k, float(v)) for k, v in sorted(d.items()) if isinstance(v, (int, float))
    )
    return (("rope_type", rope_type),) + items


def _linear_ramp(lo: float, hi: float, n: int) -> np.ndarray:
    if hi == lo:
        hi += 1e-3
    return np.clip((np.arange(n, dtype=np.float64) - lo) / (hi - lo), 0.0, 1.0)


def scaled_inv_freq(
    head_dim: int, theta: float, rope_scaling: tuple | None
) -> tuple[np.ndarray, float]:
    """Returns (inv_freq (head_dim//2,) f32, attention/mscale factor).

    Mirrors HF transformers' ROPE_INIT_FUNCTIONS for the supported types so
    checkpoints produce identical numerics.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (np.arange(0, half, dtype=np.float64) / half)
    )
    if rope_scaling is None:
        return inv_freq.astype(np.float32), 1.0
    d = dict(rope_scaling)
    rope_type = d["rope_type"]
    factor = float(d.get("factor", 1.0))

    if rope_type == "linear":
        return (inv_freq / factor).astype(np.float32), 1.0

    if rope_type == "llama3":
        low_freq_factor = float(d.get("low_freq_factor", 1.0))
        high_freq_factor = float(d.get("high_freq_factor", 4.0))
        old_len = float(d.get("original_max_position_embeddings", 8192))
        low_freq_wavelen = old_len / low_freq_factor
        high_freq_wavelen = old_len / high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (old_len / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        out = np.where(
            wavelen < high_freq_wavelen,
            inv_freq,
            np.where(wavelen > low_freq_wavelen, scaled, mid),
        )
        return out.astype(np.float32), 1.0

    if rope_type == "yarn":
        # Matches HF transformers _compute_yarn_parameters exactly (incl.
        # the correction range clamping against head_dim, the mscale /
        # mscale_all_dim attention-factor inference, and truncate).
        beta_fast = float(d.get("beta_fast") or 32.0)
        beta_slow = float(d.get("beta_slow") or 1.0)
        old_len = float(d.get("original_max_position_embeddings", 4096))

        def get_mscale(scale: float, m: float = 1.0) -> float:
            return 1.0 if scale <= 1.0 else 0.1 * m * math.log(scale) + 1.0

        attention_factor = d.get("attention_factor")
        if attention_factor is None:
            mscale_n = d.get("mscale")
            mscale_d = d.get("mscale_all_dim")
            if mscale_n and mscale_d:
                attention_factor = get_mscale(factor, mscale_n) / get_mscale(
                    factor, mscale_d
                )
            else:
                attention_factor = get_mscale(factor)

        def correction_dim(num_rotations: float) -> float:
            return (
                head_dim
                * math.log(old_len / (num_rotations * 2.0 * math.pi))
            ) / (2.0 * math.log(theta))

        low = correction_dim(beta_fast)
        high = correction_dim(beta_slow)
        if d.get("truncate", 1.0):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, head_dim - 1)
        # ramp==1 -> pure extrapolation (high-frequency dims unchanged)
        extrap = 1.0 - _linear_ramp(low, high, half)
        out = (inv_freq / factor) * (1.0 - extrap) + inv_freq * extrap
        return out.astype(np.float32), float(attention_factor)

    raise ValueError(f"unsupported rope_scaling type {rope_type!r}")


def apply_rope(
    q: jnp.ndarray,  # (T, Hq, D)
    k: jnp.ndarray,  # (T, Hkv, D)
    positions: jnp.ndarray,  # (T,) int32
    theta: float,
    rope_scaling: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    head_dim = q.shape[-1]
    inv_freq, mscale = scaled_inv_freq(head_dim, theta, rope_scaling)
    half = head_dim // 2
    freqs = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv_freq)[None, :]
    cos = (jnp.cos(freqs) * mscale)[:, None, :]  # (T, 1, half)
    sin = (jnp.sin(freqs) * mscale)[:, None, :]

    def rotate(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rotate(q), rotate(k)
