"""Engine configuration.

Parity: reference `lightvllm/config.py:7-55` (Config dataclass with engine
knobs + HF config merge). TPU-first additions: quantization modes, KV-cache
dtype, mesh shape (tensor/data parallel axes), decode-batch bucketing, and
explicit HBM budget handling instead of CUDA memory probing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Config:
    model: str = ""
    max_num_batched_tokens: int = 4096
    max_num_seqs: int = 256
    max_model_len: int = 4096
    hbm_memory_utilization: float = 0.9
    kvcache_block_size: int = 64
    num_kvcache_blocks: int = -1  # -1 = size from free HBM after weight load
    eos: int = -1
    # --- quantization ---
    quantization: str | None = None  # None | "int8" | "int4"
    quant_group_size: int = 128  # group size along in_features for int4
    quantized_checkpoint: str = ""  # .npz from tools/quantize_checkpoint.py
    # int4 serving payload layout: "offs" repacks the low nibble to
    # offset-binary at runner init so the fused kernel unpacks with one AND
    # + two converts (x-side fold; +11% at decode T=64, tools/
    # profile_unpack.py vfold2). "split" keeps the canonical checkpoint
    # packing (A/B fallback).
    int4_packing: str = "offs"
    kv_cache_dtype: str = "auto"  # "auto" (= model dtype) | "fp8" | "int8"
    # Quantize the LM head / tied-head contraction to int8 when weight
    # quantization is on: decode streams the full (E, V) head every step
    # (1.2 GB/step at 8B bf16) while int8 is ppl-neutral (QUALITY.md).
    quantize_lm_head: bool = True
    # Chunked prefill (serving QoS): cap the prompt tokens processed per
    # prefill step so one long prompt cannot monopolize a step and stall
    # every running decode (the reference prefills whole prompts only,
    # SURVEY.md §2.7). -1 (default) resolves to ~2048 tokens rounded to a
    # block multiple — the size measured on-chip at the 8B 1k-ctx north
    # star (artifacts/perf_r5_ctx1k.json: bounds the decode stall with no
    # measurable decode-throughput cost). 0 disables; otherwise a multiple
    # of kvcache_block_size (chunks stay page-aligned for whole-page KV
    # writes). A partially-prefilled prompt stays at the head of the
    # waiting queue and continues next prefill step.
    prefill_chunk_tokens: int = -1
    # --- parallelism ---
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # --- compilation ---
    enforce_eager: bool = False  # True disables jit (debugging only)
    # Fuse q/k/v and gate/up into single projection matmuls at runner init
    # (reference QKVParallelLinear / MergedColumnParallelLinear semantics;
    # kills per-invocation quant-matmul overhead on decode).
    fuse_projections: bool = True
    decode_window: int = 8  # decode steps fused per device dispatch
    # Pipelined decode (host/device overlap, VERDICT r2 next#8): while
    # window N runs on device, the engine speculatively schedules and
    # dispatches window N+1, feeding its first token from window N's
    # device-resident output (no host round-trip). Window N's tokens are
    # then fetched and postprocessed while N+1 computes. Safe by
    # construction: speculation only happens when the next step is
    # provably the same decode batch (no admissible prefill, no
    # max-tokens finish, blocks available without preemption); an
    # unpredictable EOS finish just wastes that sequence's slot for one
    # window (its tokens are discarded, its pages stay valid in device
    # order). Applies to dp=1; any other state falls back to the
    # synchronous path.
    async_decode: bool = True
    # How many speculated windows may be in flight beyond the one being
    # fetched (0 disables speculation — the synchronous A/B baseline).
    # Depth 1 hides host postprocess + input prep behind the device step;
    # depth 2 additionally takes the sampled-token D2H transfer latency
    # off the cycle critical path (measured ~50 ms/window over the PJRT
    # tunnel at b128 — the whole gap between device step time and engine
    # throughput). Each extra level costs at most one more discarded
    # garbage window per unpredicted EOS finish.
    async_decode_depth: int = 2
    # KV write strategy for decode: "staged" buffers the window's K/V in a
    # dense staging buffer (vectorized writes + one per-window Pallas flush);
    # "scatter" is the per-step XLA scatter (serial on TPU, ~3.5 ms/step at
    # b64 — kept for A/B and as a fallback).
    decode_kv_mode: str = "staged"
    # TP collective placement: "shard_map" runs prefill and the fused decode
    # window inside shard_map over the mesh "model" axis — manual
    # psum/all_gather placement AND Pallas attention kernels on per-rank
    # local views (requires dp=1, jit). "gspmd" lets XLA infer collectives
    # but can only run the partitionable jnp attention oracle under a mesh.
    # "auto" (default) picks shard_map whenever it is available.
    tp_mode: str = "auto"
    compilation_cache_dir: str = "~/.cache/lightvllm_tpu/xla"  # "" disables
    warmup_shapes: bool = True  # pre-compile decode (batch, window) shapes
    warmup_extended: bool = True  # also warm the top-k/top-p/seeded variants
    kv_size_probe: bool = True  # AOT-probe activation peak before KV sizing
    attention_impl: str = "auto"  # "auto" | "jnp" | "pallas"
    # int8-KV decode-attention dequant strategy (Pallas kernel):
    # "fold" folds per-page K scales into q (bf16 MXU dots); "s8" also
    # quantizes the folded q and p so both dots run s8 x s8 -> s32 with
    # the int8 pages feeding the MXU uncast.
    attn_dequant_mode: str = "fold"
    kernel_backend: str = "native"  # elementwise ops: "native" (XLA) | "pallas"
    decode_bucket_sizes: tuple[int, ...] = ()  # () = auto powers of two
    prefill_bucket_sizes: tuple[int, ...] = ()  # () = auto powers of two
    # --- model config (filled from HF config) ---
    hf_config: Any = None
    dtype: str = "bfloat16"

    def __post_init__(self):
        assert 1 <= self.kvcache_block_size
        assert self.kvcache_block_size % 16 == 0, (
            "TPU KV pages must be a multiple of 16 tokens (bf16 sublane tile)"
        )
        assert self.tensor_parallel_size >= 1
        assert self.data_parallel_size >= 1
        assert self.quantization in (None, "int8", "int4")
        assert self.int4_packing in ("split", "offs")
        assert self.kv_cache_dtype in ("auto", "fp8", "int8")
        assert self.attention_impl in ("auto", "jnp", "pallas")
        assert self.attn_dequant_mode in ("fold", "s8")
        assert self.kernel_backend in ("native", "pallas")
        assert self.decode_kv_mode in ("staged", "scatter")
        assert self.tp_mode in ("auto", "gspmd", "shard_map")
        if self.prefill_chunk_tokens < 0:  # -1 = auto (~2048, block-aligned)
            self.prefill_chunk_tokens = (
                max(1, 2048 // self.kvcache_block_size) * self.kvcache_block_size
            )
        assert self.prefill_chunk_tokens == 0 or (
            self.prefill_chunk_tokens >= self.kvcache_block_size
            and self.prefill_chunk_tokens % self.kvcache_block_size == 0
        ), "prefill_chunk_tokens must be a positive multiple of the block size"
        if self.model:
            if self.hf_config is None:
                from transformers import AutoConfig

                self.hf_config = AutoConfig.from_pretrained(self.model)
            max_pos = getattr(self.hf_config, "max_position_embeddings", self.max_model_len)
            self.max_model_len = min(self.max_model_len, max_pos)
        # Reference asserts max_num_batched_tokens >= max_model_len
        # (config.py:55) so a single max-length prompt can always prefill.
        self.max_num_batched_tokens = max(self.max_num_batched_tokens, self.max_model_len)

    @property
    def max_blocks_per_seq(self) -> int:
        return (self.max_model_len + self.kvcache_block_size - 1) // self.kvcache_block_size

    @property
    def model_path(self) -> str:
        return os.path.expanduser(self.model)
