"""Per-step batch metadata pytrees.

Parity: reference `lightvllm/utils/context.py:15-75` — a module-global
mutable Context carrying cu_seqlens/slot_mapping/block_tables into the
layers. TPU-first: these are frozen pytrees passed explicitly into the jitted
step function (no global side-channel; everything is traced). All arrays are
padded to bucketed static shapes by the runner.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "slot_mapping",
        "token_seq",
        "token_rect_pos",
        "rect_index",
        "cached_lens",
        "ctx_lens",
        "block_tables",
        "last_flat_idx",
        "temperatures",
        "top_ks",
        "top_ps",
        "seeds",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class PrefillMeta:
    """Flat-token prefill batch of T tokens over B sequences.

    slot_mapping:   (T,)  KV slot per new token (PAD_SLOT for padding)
    token_seq:      (T,)  sequence index per token (B-1 clamped for padding)
    token_rect_pos: (T,)  position within the seq's uncached suffix
    rect_index:     (B, Sq) rect slot -> flat token index (T for padding)
    cached_lens:    (B,)  prefix-cached tokens per seq
    ctx_lens:       (B,)  total tokens per seq incl. new (0 for padding seqs)
    block_tables:   (B, NB) physical block ids (0-padded)
    last_flat_idx:  (B,)  flat index of each seq's last token (logits gather)
    temperatures:   (B,)  sampling temperature per seq
    top_ks/top_ps:  (B,)  per-seq filtering (0 / 1.0 = disabled)
    seeds:          (B,)  per-seq sampling seed (< 0 = unseeded)
    """

    slot_mapping: jnp.ndarray
    token_seq: jnp.ndarray
    token_rect_pos: jnp.ndarray
    rect_index: jnp.ndarray
    cached_lens: jnp.ndarray
    ctx_lens: jnp.ndarray
    block_tables: jnp.ndarray
    last_flat_idx: jnp.ndarray
    temperatures: jnp.ndarray
    top_ks: jnp.ndarray
    top_ps: jnp.ndarray
    seeds: jnp.ndarray


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "positions",
        "ctx_lens",
        "block_tables",
        "temperatures",
        "top_ks",
        "top_ps",
        "seeds",
    ],
    meta_fields=[],
)
@dataclass(frozen=True)
class DecodeMeta:
    """One-token-per-sequence decode batch of B sequences.

    KV slots are derived on device from (block_tables, positions) — the
    host sends no slot mapping, and a fused multi-step decode window just
    advances positions/ctx_lens by the step index.

    positions:    (B,) position of the incoming token (< 0 for padding rows)
    ctx_lens:     (B,) total context length incl. the incoming token
    block_tables: (B, NB)
    temperatures: (B,)
    top_ks/top_ps:(B,) per-seq filtering (0 / 1.0 = disabled)
    seeds:        (B,) per-seq sampling seed (< 0 = unseeded)
    """

    positions: jnp.ndarray
    ctx_lens: jnp.ndarray
    block_tables: jnp.ndarray
    temperatures: jnp.ndarray
    top_ks: jnp.ndarray
    top_ps: jnp.ndarray
    seeds: jnp.ndarray
