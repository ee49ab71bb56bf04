"""On-device token sampling.

Parity: reference `lightvllm/layers/sampler.py:16-64` (per-seq temperature;
greedy via argmax for T=0, exponential-race ("Gumbel-trick") sampling
otherwise, mixed by where). TPU-first: sampling runs inside the jitted step
with an explicit threaded PRNG key — deterministic and multi-host
reproducible, unlike the reference's rank-0-only torch RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(
    logits: jnp.ndarray,  # (B, V) float32
    temperatures: jnp.ndarray,  # (B,) float32; 0 = greedy
    key: jax.Array,
) -> jnp.ndarray:  # (B,) int32
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # Gumbel-max: argmax(logits/T + G) samples softmax(logits/T) exactly.
    safe_t = jnp.where(temperatures > 0, temperatures, 1.0)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    sampled = jnp.argmax(logits / safe_t + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures > 0, sampled, greedy)
