"""ModelRunner: prepares bucketed inputs and drives the jitted step.

Parity: reference `lightvllm/engine/model_runner.py` — weight load, KV-cache
sizing/alloc (:201-254), prefill/decode input prep (:271-418), CUDA-graph
capture/replay (:436-461,489-548), sampling. TPU-first replacements:
  - CUDA graphs -> jit shape buckets: every (tokens, seqs, kv-blocks) combo
    pads up to powers of two, so each bucket traces/compiles once and decode
    replays a cached executable (SURVEY.md §2.8 TPU analog).
  - No worker processes / SHM RPC: single-controller JAX dispatches to all
    local devices; sharding is data, not control flow (SURVEY.md §2.5).
  - KV-cache sizing probes device memory_stats() instead of torch.cuda
    mem_get_info after a warmup forward.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from lightvllm_tpu import native
from lightvllm_tpu.config import Config
from lightvllm_tpu.engine.sequence import Sequence

try:
    _NATIVE = native.available()
except Exception:  # pragma: no cover - toolchain failure
    _NATIVE = False
from lightvllm_tpu.models import qwen3
from lightvllm_tpu.ops.kv_cache import (
    KVCache,
    alloc_kv_cache,
    kv_cache_bytes_per_block,
)
from lightvllm_tpu.ops.sampling import sample
from lightvllm_tpu.utils.metadata import DecodeMeta, PrefillMeta

PAD_SLOT_NP = np.iinfo(np.int32).max


def bucket(n: int, minimum: int = 8, cap: int | None = None) -> int:
    b = minimum
    while b < n:
        b *= 2
    return min(b, cap) if cap is not None else b


class ModelRunner:
    def __init__(
        self,
        config: Config,
        spec: qwen3.ModelSpec,
        params: dict,
        rng_seed: int = 0,
        mesh=None,
    ):
        self.config = config
        self.spec = spec
        self.block_size = config.kvcache_block_size
        self.fp8_kv = config.kv_cache_dtype == "fp8"
        self._key = jax.random.PRNGKey(rng_seed)

        # Persistent XLA compilation cache: the unrolled-layer graphs are
        # compiled once per (batch, window) shape and reused across runs.
        # TPU only — CPU AOT artifacts are machine-feature-pinned and reload
        # with SIGILL-risk warnings on different hosts.
        if config.compilation_cache_dir and jax.default_backend() != "cpu":
            import os

            path = os.path.expanduser(config.compilation_cache_dir)
            os.makedirs(path, exist_ok=True)
            try:
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass  # older jax without the knob

        self.mesh = mesh
        if mesh is None and config.tensor_parallel_size * config.data_parallel_size > 1:
            from lightvllm_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(
                config.tensor_parallel_size, config.data_parallel_size
            )
        if self.mesh is not None:
            from lightvllm_tpu.parallel.sharding import shard_params

            tp = self.mesh.shape["model"]
            assert spec.num_kv_heads % tp == 0, (
                f"num_kv_heads {spec.num_kv_heads} not divisible by tp {tp}"
            )
            params = shard_params(params, self.mesh)
        self.params = params

        self.num_blocks = self._size_kv_cache()
        config.num_kvcache_blocks = self.num_blocks
        self.cache: KVCache = alloc_kv_cache(
            spec.num_layers,
            spec.num_kv_heads,
            self.num_blocks,
            self.block_size,
            spec.head_dim,
            spec.jnp_dtype,
            self.fp8_kv,
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from lightvllm_tpu.parallel.sharding import kv_cache_specs

            specs = kv_cache_specs()
            self.cache = KVCache(
                **{
                    f: jax.device_put(
                        getattr(self.cache, f), NamedSharding(self.mesh, specs[f])
                    )
                    for f in ("k", "v")
                }
            )

        if config.kernel_backend != "native":
            from lightvllm_tpu.ops.backend import set_kernel_backend

            set_kernel_backend(config.kernel_backend)

        bs = self.block_size
        attn_impl = config.attention_impl
        if attn_impl == "auto":
            # The Pallas kernels target real TPUs (the CPU test backend uses
            # the jnp oracle path) and need lane-aligned head_dim.
            kernel_ok = spec.head_dim % 128 == 0
            on_tpu = jax.devices()[0].platform != "cpu"
            attn_impl = "pallas" if (on_tpu and kernel_ok) else "jnp"
        self.attn_impl = attn_impl

        def prefill_fn(params, token_ids, meta, cache, key, extended):
            logits, cache = qwen3.forward_prefill(
                params, spec, token_ids, meta, cache, bs, attn_impl=attn_impl
            )
            tokens = sample(
                logits,
                meta.temperatures,
                key,
                top_ks=meta.top_ks if extended else None,
                top_ps=meta.top_ps if extended else None,
                seeds=meta.seeds if extended else None,
                positions=meta.ctx_lens if extended else None,
            )
            return tokens, cache

        def decode_fn(params, token_ids, meta, cache, key, window, extended):
            """Fused n-step decode: the sampled-token feedback loop stays on
            device for `window` steps (TPU analog of CUDA-graph replay,
            SURVEY.md §2.8, amortizing the host dispatch + tunnel RTT)."""

            def step(carry, s):
                tokens, cache = carry
                stepmeta = DecodeMeta(
                    positions=meta.positions + s,
                    ctx_lens=meta.ctx_lens + s,
                    block_tables=meta.block_tables,
                    temperatures=meta.temperatures,
                    top_ks=meta.top_ks,
                    top_ps=meta.top_ps,
                    seeds=meta.seeds,
                )
                logits, cache = qwen3.forward_decode(
                    params, spec, tokens, stepmeta, cache, bs, attn_impl=attn_impl
                )
                nxt = sample(
                    logits,
                    meta.temperatures,
                    jax.random.fold_in(key, s),
                    top_ks=meta.top_ks if extended else None,
                    top_ps=meta.top_ps if extended else None,
                    seeds=meta.seeds if extended else None,
                    positions=(meta.positions + s + 1) if extended else None,
                )
                return (nxt, cache), nxt

            (_, cache), toks = jax.lax.scan(
                step, (token_ids, cache), jnp.arange(window, dtype=jnp.int32)
            )
            return toks, cache  # (window, B)

        if config.enforce_eager:
            self._prefill = prefill_fn
            self._decode = decode_fn
        else:
            self._prefill = jax.jit(
                prefill_fn, donate_argnums=(3,), static_argnums=(5,)
            )
            self._decode = jax.jit(
                decode_fn, donate_argnums=(3,), static_argnums=(5, 6)
            )

        # Step statistics (SURVEY.md §5: structured per-step metrics).
        self.last_step_stats: dict = {}

        if config.warmup_shapes and not config.enforce_eager:
            self.warmup_decode_shapes()

    def warmup_decode_shapes(self) -> None:
        """Pre-compile every decode (batch-bucket, window) executable.

        Under memory pressure the scheduler shrinks the window, and as
        sequences finish the batch bucket shrinks — each new shape would
        otherwise compile (seconds) in the middle of serving (measured:
        3-4 s stalls per shape on the preemption path). Warm the full-batch
        row across windows and the full-window column across batch buckets;
        results land in the persistent compilation cache. Dummy tokens write
        garbage KV into page 0, which is safe: any sequence later allocating
        a page writes every slot it reads before attending over it.
        """
        if jax.default_backend() == "cpu":
            return  # CPU tests: compile times are trivial, skip the churn
        max_b = bucket(self.config.max_num_seqs, 8)
        b_buckets = []
        b = 8
        while b <= max_b:
            b_buckets.append(b)
            b *= 2
        windows = []
        w = 1
        while w <= self.config.decode_window:
            windows.append(w)
            w *= 2
        shapes = [(max_b, w) for w in windows] + [
            (b, windows[-1]) for b in b_buckets[:-1]
        ]
        key = jax.random.PRNGKey(0)
        for B, w in shapes:
            NB = self.config.max_blocks_per_seq
            meta = DecodeMeta(
                positions=jnp.zeros(B, jnp.int32),
                ctx_lens=jnp.ones(B, jnp.int32),
                block_tables=jnp.zeros((B, NB), jnp.int32),
                temperatures=jnp.zeros(B, jnp.float32),
                top_ks=jnp.zeros(B, jnp.int32),
                top_ps=jnp.ones(B, jnp.float32),
                seeds=jnp.full(B, -1, jnp.int32),
            )
            _, self.cache = self._decode(
                self.params,
                jnp.zeros(B, jnp.int32),
                meta,
                self.cache,
                key,
                w,
                False,
            )

    # ---------------- KV sizing ----------------

    def _size_kv_cache(self) -> int:
        cfg = self.config
        if cfg.num_kvcache_blocks > 0:
            return cfg.num_kvcache_blocks
        per_block = kv_cache_bytes_per_block(
            self.spec.num_layers,
            self.spec.num_kv_heads,
            self.block_size,
            self.spec.head_dim,
            self.spec.jnp_dtype,
            self.fp8_kv,
        )
        if self.mesh is not None:
            # Cache shards over KV heads: each device holds 1/tp of a block.
            per_block //= self.mesh.shape["model"]
        dev = jax.devices()[0]
        stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
        if stats and "bytes_limit" in stats:
            free = stats["bytes_limit"] * cfg.hbm_memory_utilization - stats.get(
                "bytes_in_use", 0
            )
            num = int(free // per_block)
        else:
            # CPU/test backend: enough blocks for max_num_seqs short seqs.
            num = 1024
        min_needed = cfg.max_blocks_per_seq + 1
        assert num >= min_needed, (
            f"KV cache pool too small: {num} blocks < {min_needed} needed for "
            f"one max_model_len sequence"
        )
        return num

    # ---------------- input prep (host, numpy) ----------------

    def prepare_prefill(self, seqs: list[Sequence]) -> tuple[np.ndarray, PrefillMeta]:
        bs = self.block_size
        B_real = len(seqs)
        lens = [len(s) - s.num_cached_tokens for s in seqs]
        T_real = sum(lens)
        T = bucket(T_real, minimum=16)
        B = bucket(B_real, minimum=1)
        Sq = bucket(max(lens), minimum=16)
        NB = bucket(
            max((len(s) + bs - 1) // bs for s in seqs),
            minimum=1,
            cap=self.config.max_blocks_per_seq,
        )

        token_ids = np.zeros(T, np.int32)
        slot_mapping = np.full(T, PAD_SLOT_NP, np.int32)
        token_seq = np.zeros(T, np.int32)
        token_rect_pos = np.zeros(T, np.int32)
        rect_index = np.full((B, Sq), T, np.int32)
        cached_lens = np.zeros(B, np.int32)
        ctx_lens = np.zeros(B, np.int32)
        block_tables = np.zeros((B, NB), np.int32)
        last_flat_idx = np.zeros(B, np.int32)
        temperatures = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        seeds = np.full(B, -1, np.int32)

        t = 0
        for b, seq in enumerate(seqs):
            nc = seq.num_cached_tokens
            n = len(seq) - nc
            ar = np.arange(n, dtype=np.int32)
            token_ids[t : t + n] = seq.token_ids[nc:]
            token_seq[t : t + n] = b
            token_rect_pos[t : t + n] = ar
            rect_index[b, :n] = t + ar
            bt_np = np.asarray(seq.block_table, np.int32)
            if _NATIVE:
                slot_mapping[t : t + n] = native.fill_slots(bt_np, bs, nc, n)
            else:
                pos = nc + ar
                slot_mapping[t : t + n] = bt_np[pos // bs] * bs + pos % bs
            cached_lens[b] = nc
            ctx_lens[b] = len(seq)
            block_tables[b, : len(bt_np)] = bt_np
            last_flat_idx[b] = t + n - 1
            temperatures[b] = seq.temperature
            top_ks[b] = seq.top_k
            top_ps[b] = seq.top_p
            seeds[b] = -1 if seq.seed is None else seq.seed
            t += n

        meta = PrefillMeta(
            slot_mapping=jnp.asarray(slot_mapping),
            token_seq=jnp.asarray(token_seq),
            token_rect_pos=jnp.asarray(token_rect_pos),
            rect_index=jnp.asarray(rect_index),
            cached_lens=jnp.asarray(cached_lens),
            ctx_lens=jnp.asarray(ctx_lens),
            block_tables=jnp.asarray(block_tables),
            last_flat_idx=jnp.asarray(last_flat_idx),
            temperatures=jnp.asarray(temperatures),
            top_ks=jnp.asarray(top_ks),
            top_ps=jnp.asarray(top_ps),
            seeds=jnp.asarray(seeds),
        )
        return jnp.asarray(token_ids), meta

    def prepare_decode(self, seqs: list[Sequence]) -> tuple[np.ndarray, DecodeMeta]:
        B = bucket(len(seqs), minimum=8, cap=bucket(self.config.max_num_seqs, 8))
        # Fixed table width: the decode kernel skips chunks past each ctx, so
        # padding to max_blocks_per_seq costs ~nothing on device but pins ONE
        # compiled decode shape per (B, window) — a growing NB bucket would
        # recompile the whole unrolled-layer graph mid-serving.
        NB = self.config.max_blocks_per_seq
        token_ids = np.zeros(B, np.int32)
        # Padding rows keep strongly negative positions across any window.
        positions = np.full(B, -(1 << 30), np.int32)
        ctx_lens = np.zeros(B, np.int32)
        block_tables = np.zeros((B, NB), np.int32)
        temperatures = np.zeros(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        top_ps = np.ones(B, np.float32)
        seeds = np.full(B, -1, np.int32)
        for b, seq in enumerate(seqs):
            token_ids[b] = seq.last_token
            positions[b] = len(seq) - 1
            ctx_lens[b] = len(seq)
            block_tables[b, : len(seq.block_table)] = seq.block_table
            temperatures[b] = seq.temperature
            top_ks[b] = seq.top_k
            top_ps[b] = seq.top_p
            seeds[b] = -1 if seq.seed is None else seq.seed
        meta = DecodeMeta(
            positions=jnp.asarray(positions),
            ctx_lens=jnp.asarray(ctx_lens),
            block_tables=jnp.asarray(block_tables),
            temperatures=jnp.asarray(temperatures),
            top_ks=jnp.asarray(top_ks),
            top_ps=jnp.asarray(top_ps),
            seeds=jnp.asarray(seeds),
        )
        return jnp.asarray(token_ids), meta

    # ---------------- step ----------------

    def run(self, seqs: list[Sequence], is_prefill: bool, window: int = 1):
        """Prefill: returns (B,) sampled tokens. Decode: returns
        (window, B) sampled tokens (list of lists)."""
        t0 = time.perf_counter()
        self._key, step_key = jax.random.split(self._key)
        # Trace-time flag: batches without top-k/top-p/seeds never pay the
        # (B, V) argsort or per-row PRNG (separate compiled executable).
        extended = any(
            s.top_k > 0 or s.top_p < 1.0 or s.seed is not None for s in seqs
        )
        if is_prefill:
            token_ids, meta = self.prepare_prefill(seqs)
            tokens, self.cache = self._prefill(
                self.params, token_ids, meta, self.cache, step_key, extended
            )
            out = np.asarray(tokens)[: len(seqs)].tolist()
        else:
            token_ids, meta = self.prepare_decode(seqs)
            tokens, self.cache = self._decode(
                self.params, token_ids, meta, self.cache, step_key, window, extended
            )
            out = np.asarray(tokens)[:, : len(seqs)].tolist()
        self.last_step_stats = {
            "is_prefill": is_prefill,
            "num_seqs": len(seqs),
            "window": 1 if is_prefill else window,
            "padded_shape": tuple(token_ids.shape),
            "step_time_s": time.perf_counter() - t0,
        }
        return out
