"""Qwen3 decoder-only model, functional JAX.

Parity: reference `lightvllm/models/qwen3.py:14-333` — GQA attention with
per-head q/k RMSNorm before RoPE, SwiGLU MLP, pre-norm decoder layers,
optionally tied embeddings; fused qkv and gate_up projections (the
packed_modules_mapping at qwen3.py:292-298 becomes fusion at load time).

TPU-first design:
  - Weights are a pytree with layer-stacked leaves (L, ...) statically
    sliced by an UNROLLED layer loop (see _decoder_stack for why scan's
    dynamic slices are a measured 3x weight-bandwidth tax).
  - The KV cache is per-layer buffers updated in place (donated).
  - No parallel-layer classes: sharding comes from PartitionSpecs on this
    pytree (parallel/sharding.py), and XLA/GSPMD inserts the collectives the
    reference issues manually (linear.py:389, embed_head.py:112,186).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from lightvllm_tpu.ops.activations import swiglu
from lightvllm_tpu.ops.attention import (
    paged_decode_attention,
    paged_decode_attention_pallas,
    paged_prefill_attention,
    paged_prefill_attention_pallas,
)
from lightvllm_tpu.ops.kv_cache import KVCache, PAD_SLOT, write_kv_layer
from lightvllm_tpu.ops.norms import add_rms_norm, rms_norm
from lightvllm_tpu.ops.quantization import matmul, quantize_weight
from lightvllm_tpu.ops.rope import apply_rope
from lightvllm_tpu.utils.metadata import DecodeMeta, PrefillMeta


@dataclass(frozen=True)
class ModelSpec:
    """Static architecture description (hashable; safe as a jit static)."""

    num_layers: int
    hidden_size: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    rope_theta: float
    rms_eps: float
    tie_word_embeddings: bool
    dtype: str = "bfloat16"
    # Family switches: Qwen3 uses per-head q/k RMSNorm and no projection
    # bias; Llama uses neither norm nor bias; Qwen2 adds qkv bias.
    qk_norm: bool = True
    qkv_bias: bool = False
    # Normalized rope_scaling (hashable tuple from ops.rope); None = vanilla
    # RoPE. Unsupported HF schemes are rejected at from_hf_config — the
    # reference asserts them away (rotary_embedding.158); silently
    # ignoring them would produce wrong numerics on Llama-3.x/YaRN
    # checkpoints.
    rope_scaling: tuple | None = None
    # Layout factor of the FUSED projections (wqkv / w_gate_up), when
    # present: the fused out axis is the concatenation over shards s of
    # [q_s | k_s | v_s] (resp. [gate_s | up_s]), so a "model"-axis GSPMD
    # shard of the fused weight holds exactly its own q/k/v (gate/up)
    # columns and the split in layer_fn is layout-preserving (no
    # cross-shard slices -> no resharding collectives). 1 = plain
    # [q | k | v] concat (single chip / unfused).
    tp_shards: int = 1

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def qkv_out(self) -> int:
        return (self.num_q_heads + 2 * self.num_kv_heads) * self.head_dim

    @staticmethod
    def from_hf_config(hf_config: Any, dtype: str = "bfloat16") -> "ModelSpec":
        head_dim = getattr(hf_config, "head_dim", None) or (
            hf_config.hidden_size // hf_config.num_attention_heads
        )
        model_type = getattr(hf_config, "model_type", "qwen3")
        from lightvllm_tpu.ops.rope import normalize_rope_scaling

        return ModelSpec(
            qk_norm=model_type == "qwen3",
            qkv_bias=model_type == "qwen2",
            rope_scaling=normalize_rope_scaling(
                getattr(hf_config, "rope_scaling", None)
            ),
            num_layers=hf_config.num_hidden_layers,
            hidden_size=hf_config.hidden_size,
            num_q_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            head_dim=head_dim,
            intermediate_size=hf_config.intermediate_size,
            vocab_size=hf_config.vocab_size,
            rope_theta=float(getattr(hf_config, "rope_theta", 1e6)),
            rms_eps=float(getattr(hf_config, "rms_norm_eps", 1e-6)),
            tie_word_embeddings=bool(getattr(hf_config, "tie_word_embeddings", False)),
            dtype=dtype,
        )


def init_params(
    spec: ModelSpec,
    key: jax.Array,
    quantization: str | None = None,
    group_size: int = 128,
) -> dict:
    """Random-weight init (benchmarks / tests without a checkpoint)."""
    dt = spec.jnp_dtype
    E, D, L = spec.hidden_size, spec.head_dim, spec.num_layers
    Hq, Hkv, I = spec.num_q_heads, spec.num_kv_heads, spec.intermediate_size
    keys = iter(jax.random.split(key, 16))

    def w(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dt)

    def layered(key, shape):
        """Per-layer tuple of weights (optionally quantized), generated one
        layer at a time so transients stay ~1 layer of f32.

        PER-LAYER LEAVES, not a stacked (L, ...) array: the unrolled layer
        loop's static slice of a stacked array is materialized by XLA as a
        temp before each Pallas quant-matmul custom call — i.e. the whole
        weight tree is COPIED every decode step (measured on v5e: the 8B
        int4 decode weight stream ran at 168 GiB/s stacked vs 379 GiB/s
        with per-layer leaves, 2.25x). Same reasoning as the per-layer KV
        cache buffers (ops/kv_cache.py)."""
        per_layer = [w(jax.random.fold_in(key, i), shape) for i in range(L)]
        if quantization is None:
            return tuple(per_layer)
        bits = 8 if quantization == "int8" else 4
        return tuple(quantize_weight(m, bits, group_size) for m in per_layer)

    def ones(shape):
        return tuple(jnp.ones(shape, dt) for _ in range(L))

    def zeros(shape):
        return tuple(jnp.zeros(shape, dt) for _ in range(L))

    # q/k/v and gate/up are separate tensors here; the runner fuses them
    # into wqkv / w_gate_up (fuse_projection_params) for the serving path.
    params = {
        "embed": w(next(keys), (spec.vocab_size, E)),
        "layers": {
            "input_ln": ones((E,)),
            "wq": layered(next(keys), (E, Hq * D)),
            "wk": layered(next(keys), (E, Hkv * D)),
            "wv": layered(next(keys), (E, Hkv * D)),
            "q_norm": ones((D,)) if spec.qk_norm else None,
            "k_norm": ones((D,)) if spec.qk_norm else None,
            "bq": zeros((Hq * D,)) if spec.qkv_bias else None,
            "bk": zeros((Hkv * D,)) if spec.qkv_bias else None,
            "bv": zeros((Hkv * D,)) if spec.qkv_bias else None,
            "wo": layered(next(keys), (Hq * D, E)),
            "post_ln": ones((E,)),
            "w_gate": layered(next(keys), (E, I)),
            "w_up": layered(next(keys), (E, I)),
            "w_down": layered(next(keys), (I, E)),
        },
        "final_ln": jnp.ones((E,), dt),
        "lm_head": None if spec.tie_word_embeddings else w(next(keys), (E, spec.vocab_size)),
    }
    return params


def can_fuse_projections(spec: ModelSpec, tp_shards: int) -> bool:
    """Fusion needs every fused out axis to split evenly into the
    shard-interleaved layout (real checkpoints always do; guards tiny test
    specs and exotic head counts)."""
    return (
        spec.num_q_heads * spec.head_dim % tp_shards == 0
        and spec.num_kv_heads * spec.head_dim % tp_shards == 0
        and spec.intermediate_size % tp_shards == 0
    )


def fuse_projection_params(params: dict, tp_shards: int = 1) -> dict:
    """Fuse separate q/k/v (and gate/up) weights into single wqkv /
    w_gate_up tensors with the shard-interleaved out-axis layout described
    on ModelSpec.tp_shards (reference analog: QKVParallelLinear /
    MergedColumnParallelLinear, lightvllm/layers/linear.py:240,193 — there a
    load-time weight packing, here a runner-init pytree transform so
    loaders, offline checkpoints and tests keep the simple per-tensor
    format).

    Exact for QuantizedTensor leaves: scales are per-(group, out-channel),
    so out-axis column permutation/concat moves each column's scale with it.
    """
    ly = params["layers"]
    if ly.get("wqkv") is not None or ly.get("wq") is None:
        return params  # already fused / not a standard layer dict

    from lightvllm_tpu.ops.quantization import QuantizedTensor

    def interleave(ws: list):
        """Concat along the out (last) axis, shard-interleaved: the result's
        columns are [w0_s | w1_s | ...] for each shard s in order."""
        first = ws[0]
        if tp_shards == 1:
            cat = lambda get: jnp.concatenate([get(w) for w in ws], axis=-1)
        else:
            def cat(get):
                parts = []
                for s in range(tp_shards):
                    for w in ws:
                        a = get(w)
                        o = a.shape[-1] // tp_shards
                        parts.append(a[..., s * o : (s + 1) * o])
                return jnp.concatenate(parts, axis=-1)
        if isinstance(first, QuantizedTensor):
            assert all(
                isinstance(w, QuantizedTensor)
                and w.bits == first.bits
                and w.data.shape[:-1] == first.data.shape[:-1]
                for w in ws
            ), "fused projections need identical quant group structure"
            return QuantizedTensor(
                data=cat(lambda w: w.data),
                scale=cat(lambda w: w.scale),
                bits=first.bits,
            )
        return cat(lambda w: w)

    new_ly = dict(ly)
    new_ly["wqkv"] = tuple(
        interleave(list(ws)) for ws in zip(ly["wq"], ly["wk"], ly["wv"])
    )
    for k_ in ("wq", "wk", "wv"):
        del new_ly[k_]
    if ly.get("bq") is not None:
        new_ly["bqkv"] = tuple(
            interleave(list(bs)) for bs in zip(ly["bq"], ly["bk"], ly["bv"])
        )
    for k_ in ("bq", "bk", "bv"):
        new_ly.pop(k_, None)
    new_ly["w_gate_up"] = tuple(
        interleave(list(ws)) for ws in zip(ly["w_gate"], ly["w_up"])
    )
    for k_ in ("w_gate", "w_up"):
        del new_ly[k_]
    return {**params, "layers": new_ly}


def _decoder_stack(
    params: dict,
    spec: ModelSpec,
    token_ids: jnp.ndarray,  # (T,) int32
    positions: jnp.ndarray,  # (T,) int32
    cache,  # KV state threaded through write_fn/attn_fn (cache or staging)
    slot_mapping: jnp.ndarray | None,  # (T,); None with a custom write_fn
    attn_fn: Callable,  # (q, kv_state, layer) -> attn out, q (T, Hq, D)
    write_fn: Callable | None = None,  # (kv_state, layer, k, v) -> kv_state
    tp_axis: str | None = None,  # set inside shard_map: manual-collective TP
) -> tuple[jnp.ndarray, KVCache]:
    dt = spec.jnp_dtype
    T = token_ids.shape[0]
    Hq, Hkv, D = spec.num_q_heads, spec.num_kv_heads, spec.head_dim
    if tp_axis is None:
        h = jnp.take(params["embed"], token_ids, axis=0).astype(dt)
    else:
        # Vocab-parallel embedding with an explicit psum — the manual analog
        # of the reference's VocabParallelEmbedding mask + all_reduce
        # (embed_head.py:92-113). `spec` here carries LOCAL head/ffn counts;
        # the embed shard is (V/tp, E) rows [rank*V_local, ...).
        # psum in the embedding dtype, not f32: each token's row lives on
        # exactly ONE rank (the others contribute zeros), so the sum has a
        # single nonzero term and no accumulation error — halving the
        # collective's bytes is exact.
        v_local = params["embed"].shape[0]
        offset = jax.lax.axis_index(tp_axis) * v_local
        local_ids = token_ids - offset
        valid = (local_ids >= 0) & (local_ids < v_local)
        e = jnp.take(params["embed"], jnp.clip(local_ids, 0, v_local - 1), axis=0)
        h = jax.lax.psum(jnp.where(valid[:, None], e, 0).astype(dt), tp_axis)

    def reduce_fn(x):
        # Row-parallel output reduction (reference RowParallelLinear
        # all_reduce, linear.py:388-389) — placed manually so the compiler
        # can schedule it asynchronously against independent work.
        return x if tp_axis is None else jax.lax.psum(x, tp_axis)

    if write_fn is None:
        def write_fn(state, layer_idx, k, v):
            return write_kv_layer(state, layer_idx, k, v, slot_mapping)

    S = spec.tp_shards
    qd_s, kvd_s, i_s = Hq * D // S, Hkv * D // S, spec.intermediate_size // S

    def layer_fn(h, cache, lp, layer_idx):
        # --- attention block ---
        normed = rms_norm(h, lp["input_ln"], spec.rms_eps)
        if lp.get("wqkv") is not None:
            # Fused projection (reference QKVParallelLinear, linear.py:240):
            # ONE quant-matmul invocation instead of three — the 8B decode
            # residual was per-invocation overhead, not bytes. The fused out
            # axis is shard-interleaved (see ModelSpec.tp_shards); the
            # reshape splits the sharded axis by the mesh factor first, so
            # every slice below lands on an unsharded axis.
            qkv = matmul(normed, lp["wqkv"])
            if spec.qkv_bias:
                qkv = qkv + lp["bqkv"]
            r = qkv.reshape(T, S, qd_s + 2 * kvd_s)
            q = r[:, :, :qd_s].reshape(T, Hq, D)
            k = r[:, :, qd_s : qd_s + kvd_s].reshape(T, Hkv, D)
            v = r[:, :, qd_s + kvd_s :].reshape(T, Hkv, D)
        else:
            q = matmul(normed, lp["wq"])
            k = matmul(normed, lp["wk"])
            v = matmul(normed, lp["wv"])
            if spec.qkv_bias:
                q = q + lp["bq"]
                k = k + lp["bk"]
                v = v + lp["bv"]
            q = q.reshape(T, Hq, D)
            k = k.reshape(T, Hkv, D)
            v = v.reshape(T, Hkv, D)
        if spec.qk_norm:
            q = rms_norm(q, lp["q_norm"], spec.rms_eps)
            k = rms_norm(k, lp["k_norm"], spec.rms_eps)
        q, k = apply_rope(q, k, positions, spec.rope_theta, spec.rope_scaling)
        cache = write_fn(cache, layer_idx, k, v)
        attn = attn_fn(q, cache, layer_idx)
        o = reduce_fn(matmul(attn.reshape(T, Hq * D), lp["wo"]))
        # --- MLP block (fused add+norm, reference layernorm.py:52-80) ---
        normed2, h = add_rms_norm(o, h, lp["post_ln"], spec.rms_eps)
        if lp.get("w_gate_up") is not None:
            # Fused gate/up (reference MergedColumnParallelLinear,
            # linear.py:193), same shard-interleaved layout as wqkv.
            gu = matmul(normed2, lp["w_gate_up"])
            r2 = gu.reshape(T, S, 2 * i_s)
            gate = r2[:, :, :i_s].reshape(T, spec.intermediate_size)
            up = r2[:, :, i_s:].reshape(T, spec.intermediate_size)
        else:
            gate = matmul(normed2, lp["w_gate"])
            up = matmul(normed2, lp["w_up"])
        mlp = reduce_fn(matmul(swiglu(gate, up), lp["w_down"]))
        h = h + mlp
        return h, cache

    # Unrolled Python loop over PER-LAYER weight leaves, NOT lax.scan over
    # a stacked (L, ...) tree: scan's dynamic slices materialize a copy of
    # every layer's weights per step (measured 18 ms vs the 6 ms
    # weight-read floor at decode b32), and even static slices of stacked
    # leaves are materialized as temps before Pallas custom calls (the
    # whole weight tree copied per step — 168 vs 379 GiB/s at 8B int4).
    # Tuple leaves hand each kernel its own whole array: nothing to copy.
    for i in range(spec.num_layers):
        lp = {
            k_: (None if v_ is None else v_[i])
            for k_, v_ in params["layers"].items()
        }
        h, cache = layer_fn(h, cache, lp, i)
    h = rms_norm(h, params["final_ln"], spec.rms_eps)
    return h, cache


def compute_logits(
    params: dict,
    spec: ModelSpec,
    h: jnp.ndarray,
    tp_axis: str | None = None,
    gather: bool = True,
) -> jnp.ndarray:
    """h (B, E) -> logits (B, V) float32. Tied head contracts against the
    embedding matrix without materializing its transpose. Inside shard_map
    (tp_axis set) each rank computes its vocab shard and the shards are
    all-gathered in rank order — the manual analog of the reference's
    LM-head logits gather (embed_head.py:175-195). gather=False skips the
    all_gather and returns this rank's LOCAL (B, V_local) shard, possibly
    including vocab-padding tail columns — for ops.sampling.sample_sharded,
    which masks the padding and reduces only per-rank winners."""
    if params.get("lm_head") is not None:
        logits = matmul(h, params["lm_head"]).astype(jnp.float32)
    else:
        from lightvllm_tpu.ops.quantization import _precision

        logits = jax.lax.dot_general(
            h,
            params["embed"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(h),
        )
    if tp_axis is not None:
        if not gather:
            return logits  # local shard; sample_sharded masks padding
        logits = jax.lax.all_gather(logits, tp_axis, axis=1, tiled=True)
    # A quantized head may be vocab-padded for kernel tiling (runner pads
    # to a multiple of 2048 at the END of the global vocab axis, i.e. the
    # tail shard under TP — so slicing after the gather drops exactly the
    # padding). No-op when unpadded. Padded columns would otherwise win
    # the argmax with logit 0 when every real logit is negative.
    return logits[:, : spec.vocab_size]


def hidden_states_prefill(
    params: dict,
    spec: ModelSpec,
    token_ids: jnp.ndarray,
    meta: PrefillMeta,
    cache: KVCache,
    block_size: int,
    attn_impl: str = "jnp",  # "jnp" | "pallas"
    page_aligned_kv: bool = False,  # caller guarantees per-seq block-padded
    tp_axis: str | None = None,  # set inside shard_map: manual-collective TP
) -> tuple[jnp.ndarray, KVCache]:
    """Full per-token hidden states (T, E) — serving prefill and the
    teacher-forced perplexity harness (evals.py) share this path.

    page_aligned_kv: set when every sequence's uncached token run in the
    flat stream starts at a multiple of block_size and is padded to one
    (prepare_prefill does this) — KV then writes via whole-page scatters
    (write_kv_pages, 64x fewer serial scatter rows than per-token)."""
    scale = spec.head_dim**-0.5
    positions = meta.cached_lens[meta.token_seq] + meta.token_rect_pos

    def attn_fn(q, cache, layer):
        if attn_impl == "pallas":
            return paged_prefill_attention_pallas(
                q, cache, layer, meta, block_size, scale
            )
        return paged_prefill_attention(q, cache, layer, meta, block_size, scale)

    write_fn = None
    if page_aligned_kv:
        from lightvllm_tpu.ops.kv_cache import write_kv_pages

        def write_fn(state, layer_idx, k, v):
            return write_kv_pages(state, layer_idx, k, v, meta.slot_mapping)

    return _decoder_stack(
        params, spec, token_ids, positions, cache, meta.slot_mapping, attn_fn,
        write_fn=write_fn, tp_axis=tp_axis,
    )


def forward_prefill(
    params: dict,
    spec: ModelSpec,
    token_ids: jnp.ndarray,
    meta: PrefillMeta,
    cache: KVCache,
    block_size: int,
    attn_impl: str = "jnp",  # "jnp" | "pallas"
    page_aligned_kv: bool = False,
    tp_axis: str | None = None,
    gather_logits: bool = True,
) -> tuple[jnp.ndarray, KVCache]:
    """Returns (last-token logits (B, V), updated cache)."""
    h, cache = hidden_states_prefill(
        params, spec, token_ids, meta, cache, block_size, attn_impl,
        page_aligned_kv=page_aligned_kv, tp_axis=tp_axis,
    )
    T = token_ids.shape[0]
    h_last = h[jnp.clip(meta.last_flat_idx, 0, T - 1)]  # (B, E)
    return (
        compute_logits(params, spec, h_last, tp_axis=tp_axis, gather=gather_logits),
        cache,
    )


def forward_decode(
    params: dict,
    spec: ModelSpec,
    token_ids: jnp.ndarray,  # (B,) last tokens
    meta: DecodeMeta,
    cache: KVCache,
    block_size: int,
    attn_impl: str = "jnp",  # "jnp" | "pallas"
    tp_axis: str | None = None,
    gather_logits: bool = True,
) -> tuple[jnp.ndarray, KVCache]:
    scale = spec.head_dim**-0.5
    B = token_ids.shape[0]
    # KV slots derive on device from (block_tables, positions); padding rows
    # carry negative positions and scatter to PAD (dropped).
    pos = meta.positions
    blk = jnp.take_along_axis(
        meta.block_tables, jnp.clip(pos[:, None] // block_size, 0, None), axis=1
    )[:, 0]
    slots = jnp.where(pos >= 0, blk * block_size + pos % block_size, PAD_SLOT)

    def attn_fn(q, cache, layer):
        if attn_impl == "pallas":
            return paged_decode_attention_pallas(
                q, cache, layer, meta, block_size, scale
            )
        return paged_decode_attention(q, cache, layer, meta, block_size, scale)

    h, cache = _decoder_stack(
        params, spec, token_ids, jnp.maximum(pos, 0), cache, slots, attn_fn,
        tp_axis=tp_axis,
    )
    return (
        compute_logits(params, spec, h, tp_axis=tp_axis, gather=gather_logits),
        cache,
    )


def forward_decode_staged(
    params: dict,
    spec: ModelSpec,
    token_ids: jnp.ndarray,  # (B,) current tokens (position base_pos + step)
    meta: DecodeMeta,  # BASE window metadata (positions = step-0 positions)
    cache: KVCache,  # paged cache, READ-ONLY during the window
    staging: KVCache,  # per-layer (B, Hkv, W, D) dense window staging
    step: jnp.ndarray,  # scalar int32: index within the decode window
    block_size: int,
    attn_impl: str = "jnp",  # "jnp" | "pallas"
    tp_axis: str | None = None,
    gather_logits: bool = True,
) -> tuple[jnp.ndarray, KVCache]:
    """One step of the window-staged decode (VERDICT r1 missing#1).

    The per-step KV write is a vectorized dynamic_update_slice into a dense
    staging buffer (the step index is the same for every sequence — no
    scatter), attention folds the staged tail over the paged context, and
    the runner flushes staging -> pages once per window
    (ops/pallas/kv_append.kv_flush_pallas). The paged cache is read-only
    here, which also removes the scatter/kernel-read copy hazards XLA had
    to work around.

    Page context excludes the window's base position row (the step-0 input
    token is already in pages from prefill, but is re-staged so the staged
    tail is self-contained; masking pos < base_pos avoids double counting).
    """
    scale = spec.head_dim**-0.5
    pos = meta.positions + step  # current token positions
    pages_ctx = meta.positions  # pages rows attended: 0 .. base_pos - 1
    # Attention reads the PRE-update staging (rows < step) plus this
    # step's K/V rows passed separately: the staging update's only
    # consumer is then the scan carry, so XLA performs the
    # dynamic_update_slice in place. Feeding the UPDATED buffer to the
    # attention kernel (an opaque custom call) forced a full-buffer copy
    # per layer per step — measured 8.2 us x72/step at 8B b64.
    stage_len = step
    stash: dict[int, tuple] = {}

    def write_fn(stage: KVCache, layer: int, k, v) -> KVCache:
        # k/v (B, Hkv, D) -> staging row `step` (same index for all seqs:
        # a vectorized dynamic_update_slice, not a scatter).
        stash[layer] = (stage.k[layer], stage.v[layer], k, v)
        st_dt = stage.k[layer].dtype
        nk, nv = list(stage.k), list(stage.v)
        nk[layer] = jax.lax.dynamic_update_slice_in_dim(
            nk[layer], k.astype(st_dt)[:, :, None, :], step, axis=2
        )
        nv[layer] = jax.lax.dynamic_update_slice_in_dim(
            nv[layer], v.astype(st_dt)[:, :, None, :], step, axis=2
        )
        return KVCache(k=tuple(nk), v=tuple(nv))

    def attn_fn(q, stage: KVCache, layer: int):
        old_k, old_v, k_row, v_row = stash.pop(layer)
        kw = dict(
            k_stage=old_k, v_stage=old_v,
            stage_len=stage_len, pages_ctx=pages_ctx,
            k_new=k_row, v_new=v_row,
        )
        if attn_impl == "pallas":
            return paged_decode_attention_pallas(
                q, cache, layer, meta, block_size, scale, **kw
            )
        return paged_decode_attention(
            q, cache, layer, meta, block_size, scale, **kw
        )

    h, staging = _decoder_stack(
        params, spec, token_ids, jnp.maximum(pos, 0), staging, None,
        attn_fn, write_fn=write_fn, tp_axis=tp_axis,
    )
    return (
        compute_logits(params, spec, h, tp_axis=tp_axis, gather=gather_logits),
        staging,
    )
