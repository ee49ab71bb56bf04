#!/usr/bin/env python
"""On-TPU smoke gate (<5 min): the Pallas kernels compiled by REAL Mosaic
(interpret=False) vs their jnp oracles, plus an end-to-end engine
greedy-token check pallas-vs-oracle.

The pytest suite runs the kernels in interpret mode on CPU — which
provably missed Mosaic-only bug classes in r2 (uninitialized VMEM, layout
legalization). This gate runs every round on the chip (VERDICT r3 weak#5):

    python tools/tpu_smoke.py        # exits nonzero on any mismatch

Covers: flash-decode (bf16, int8 in-page scales + staged tail), varlen
flash-prefill, the staged-window int8 KV flush, the fused dequant+matmul
(int4 + int8), and a 2-layer engine run with attention_impl pallas vs jnp.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []
T0 = time.time()


def check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want))
    tol = atol + rtol * np.max(np.abs(want))
    ok = np.isfinite(got).all() and err <= tol
    print(f"[{time.time()-T0:5.1f}s] {'PASS' if ok else 'FAIL'} {name}: "
          f"maxerr {err:.3e} (tol {tol:.3e})", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    dev = jax.devices()[0]
    assert dev.platform != "cpu", "run this on the TPU (unset JAX_PLATFORMS)"
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from lightvllm_tpu.ops.attention import (
        paged_decode_attention,
        paged_prefill_attention,
    )
    from lightvllm_tpu.ops.kv_cache import (
        KVCache,
        decode_page_scales,
        encode_page_scales,
        truncate_scale,
    )
    from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode
    from lightvllm_tpu.ops.pallas.prefill_attention import paged_flash_prefill
    from lightvllm_tpu.utils.metadata import DecodeMeta, PrefillMeta

    # ---- decode attention: bf16 pages, real shape --------------------
    B, Hq, Hkv, D, BSZ = 8, 32, 8, 128, 64
    NBtot = 64
    ctx = jnp.asarray([300, 128, 65, 64, 1, 511, 200, 320], jnp.int32)
    NB = 8
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    kp = jax.random.normal(jax.random.fold_in(key, 1), (NBtot, Hkv, BSZ, D), jnp.bfloat16)
    vp = jax.random.normal(jax.random.fold_in(key, 2), (NBtot, Hkv, BSZ, D), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(NBtot)[: B * NB].reshape(B, NB), jnp.int32)
    scale = D**-0.5

    def dec_oracle(q, cache, ctx_, stage=None):
        meta = DecodeMeta(
            positions=ctx_ - 1, ctx_lens=ctx_, block_tables=bt,
            temperatures=jnp.zeros(B, jnp.float32),
            top_ks=jnp.zeros(B, jnp.int32), top_ps=jnp.ones(B, jnp.float32),
            seeds=jnp.full(B, -1, jnp.int32),
        )
        kw = {}
        if stage is not None:
            kw = dict(k_stage=stage[0], v_stage=stage[1],
                      stage_len=stage[2], pages_ctx=ctx_)
        return paged_decode_attention(q, cache, 0, meta, BSZ, scale, **kw)

    want = dec_oracle(q, KVCache(k=(kp,), v=(vp,)), ctx)
    got = paged_flash_decode(q, kp, vp, bt, ctx, block_size=BSZ, scale=scale)
    check("decode bf16", got, want, 2e-2, 2e-2)

    # ---- decode attention: int8 in-page scales + staged tail ---------
    kp8 = jnp.asarray(rng.integers(-127, 128, (NBtot, Hkv, BSZ, D)), jnp.int8)
    vp8 = jnp.asarray(rng.integers(-127, 128, (NBtot, Hkv, BSZ, D)), jnp.int8)
    sck = truncate_scale(jnp.abs(jax.random.normal(
        jax.random.fold_in(key, 3), (NBtot, Hkv, D))) * 0.01 + 0.02)
    scv = truncate_scale(jnp.abs(jax.random.normal(
        jax.random.fold_in(key, 4), (NBtot, Hkv, D))) * 0.01 + 0.02)
    kp8s = jnp.concatenate([kp8, encode_page_scales(sck, scv, BSZ)], axis=1)
    W = 8
    ks = jax.random.normal(jax.random.fold_in(key, 5), (B, Hkv, W, D), jnp.bfloat16)
    vs = jax.random.normal(jax.random.fold_in(key, 6), (B, Hkv, W, D), jnp.bfloat16)
    stage_len = jnp.int32(5)
    kd = kp8.astype(jnp.float32) * sck[:, :, None, :]
    vd = vp8.astype(jnp.float32) * scv[:, :, None, :]
    want = dec_oracle(
        q, KVCache(k=(kd,), v=(vd,)), ctx, stage=(ks, vs, stage_len)
    )
    got = paged_flash_decode(
        q, kp8s, vp8, bt, ctx, ks, vs, stage_len, sc_shards=1,
        block_size=BSZ, scale=scale,
    )
    check("decode int8 in-page + staged tail", got, want, 2e-2, 2e-2)

    # ---- prefill attention -------------------------------------------
    lens = [130, 70]
    Bp = len(lens)
    Sq = 256
    T = sum(-(-n // BSZ) * BSZ for n in lens)
    qp = jax.random.normal(jax.random.fold_in(key, 7), (Bp, Sq, Hq, D), jnp.bfloat16)
    btp = jnp.asarray(rng.permutation(NBtot)[: Bp * NB].reshape(Bp, NB), jnp.int32)
    ctxp = jnp.asarray(lens, jnp.int32)
    cached = jnp.zeros(Bp, jnp.int32)
    got = paged_flash_prefill(
        qp, kp, vp, btp, ctxp, cached, block_size=BSZ, scale=scale
    )
    # Oracle via ops.attention on the flat layout.
    rect_index = np.full((Bp, Sq), T, np.int32)
    token_seq = np.zeros(T, np.int32)
    token_rect_pos = np.zeros(T, np.int32)
    t = 0
    for b, n in enumerate(lens):
        npad = -(-n // BSZ) * BSZ
        token_seq[t : t + npad] = b
        token_rect_pos[t : t + npad] = np.arange(npad)
        rect_index[b, :npad] = t + np.arange(npad)
        t += npad
    meta = PrefillMeta(
        slot_mapping=jnp.zeros(T, jnp.int32),
        token_seq=jnp.asarray(token_seq),
        token_rect_pos=jnp.asarray(token_rect_pos),
        rect_index=jnp.asarray(rect_index),
        cached_lens=cached, ctx_lens=ctxp, block_tables=btp,
        last_flat_idx=jnp.zeros(Bp, jnp.int32),
        temperatures=jnp.zeros(Bp, jnp.float32),
        top_ks=jnp.zeros(Bp, jnp.int32), top_ps=jnp.ones(Bp, jnp.float32),
        seeds=jnp.full(Bp, -1, jnp.int32),
    )
    q_flat = qp[jnp.asarray(token_seq), jnp.asarray(token_rect_pos)]
    want_flat = paged_prefill_attention(
        q_flat, KVCache(k=(kp,), v=(vp,)), 0, meta, BSZ, scale
    )
    got_flat = got[jnp.asarray(token_seq), jnp.asarray(token_rect_pos)]
    # Compare only real (in-context) rows.
    pos = jnp.asarray(token_rect_pos)
    real = np.asarray(pos < ctxp[jnp.asarray(token_seq)])
    check("prefill bf16 varlen", np.asarray(got_flat)[real],
          np.asarray(want_flat)[real], 2e-2, 2e-2)

    # ---- staged-window int8 KV flush ----------------------------------
    from lightvllm_tpu.ops.pallas.kv_append import kv_flush_pallas

    # Mid-page appends (start_pos 3 and 127) REUSE the page's existing
    # in-page scale by design — in production such a page always has one
    # (its earlier rows were written by prefill or a previous flush). Seed
    # every page with a valid encoded scale to construct that reachable
    # state; pages whose row 0 is written here get a fresh scale anyway.
    sh_f = kp8s.shape[1] - Hkv
    sc0 = truncate_scale(jnp.full((16, Hkv, D), 0.05, jnp.float32))
    kpages = jnp.concatenate(
        [
            jnp.zeros((16, Hkv, BSZ, D), jnp.int8),
            encode_page_scales(sc0, sc0, BSZ),
        ],
        axis=1,
    )
    vpages = jnp.zeros((16, Hkv, BSZ, D), jnp.int8)
    start_pos = jnp.asarray([3, 64, 127, 0], jnp.int32)
    btf = jnp.asarray(rng.permutation(16)[:16].reshape(4, 4), jnp.int32)
    ksf = jax.random.normal(jax.random.fold_in(key, 8), (4, Hkv, W, D), jnp.bfloat16)
    vsf = jax.random.normal(jax.random.fold_in(key, 9), (4, Hkv, W, D), jnp.bfloat16)
    ko, vo = kv_flush_pallas(
        kpages, vpages, ksf, vsf, start_pos, btf, sc_shards=1,
        block_size=BSZ, window=W,
    )
    # Round-trip: dequantized flushed rows must approximate the staging.
    sckf, scvf = decode_page_scales(ko[:, Hkv:], Hkv)
    kqd = ko[:, :Hkv].astype(jnp.float32) * sckf[:, :, None, :]
    vqd = vo.astype(jnp.float32) * scvf[:, :, None, :]
    errs = []
    for b in range(4):
        for w in range(W):
            pos = int(start_pos[b]) + w
            page = int(btf[b, pos // BSZ])
            row = pos % BSZ
            errs.append(np.max(np.abs(
                np.asarray(kqd[page, :, row], np.float32)
                - np.asarray(ksf[b, :, w], np.float32))))
            errs.append(np.max(np.abs(
                np.asarray(vqd[page, :, row], np.float32)
                - np.asarray(vsf[b, :, w], np.float32))))
    err = max(errs)
    print(f"[{time.time()-T0:5.1f}s] {'PASS' if err < 0.15 else 'FAIL'} "
          f"staged int8 flush round-trip: maxerr {err:.3e}", flush=True)
    if err >= 0.15:
        FAILURES.append("staged int8 flush")

    # ---- fused dequant+matmul -----------------------------------------
    from lightvllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
    from lightvllm_tpu.ops.quantization import quantize_weight, quantized_matmul

    wq = jax.random.normal(jax.random.fold_in(key, 10), (4096, 6144), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.fold_in(key, 11), (64, 4096), jnp.bfloat16)
    for bits, gs in ((4, 128), (8, None)):
        qt = quantize_weight(wq, bits, gs)
        want = quantized_matmul(x, qt)
        got = quant_matmul_pallas(x, qt.data, qt.scale, bits=bits)
        check(f"quant_matmul int{bits}", got, want, 2e-2, 2e-2)

    # ---- end-to-end: engine greedy pallas vs jnp oracle ----------------
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=256, num_q_heads=4, num_kv_heads=2,
        head_dim=128, intermediate_size=512, vocab_size=512,
        rope_theta=1e4, rms_eps=1e-6, tie_word_embeddings=True,
        dtype="bfloat16",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    prompts = [[1, 5, 9, 2, 7], [3, 1, 4]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def run(impl):
        eng = LLMEngine(
            spec=spec, params=params, kvcache_block_size=64,
            num_kvcache_blocks=32, max_model_len=256, max_num_seqs=4,
            eos=-1, attention_impl=impl, warmup_shapes=False,
            kv_size_probe=False,
        )
        return [r["token_ids"] for r in eng.generate(prompts, sp, use_tqdm=False)]

    tok_p = run("pallas")
    tok_j = run("jnp")
    ok = tok_p == tok_j
    print(f"[{time.time()-T0:5.1f}s] {'PASS' if ok else 'FAIL'} "
          f"engine e2e pallas-vs-oracle greedy tokens", flush=True)
    if not ok:
        FAILURES.append(f"engine e2e: {tok_p} vs {tok_j}")

    # ---- shard_map x Pallas under real Mosaic (VERDICT r4 next#3) ------
    # The multi-chip serving path runs pallas_calls INSIDE shard_map
    # bodies; a ("model", 1) 1-device mesh exercises exactly that
    # combination on one chip. Token-exact vs the mesh-free Pallas run.
    def run_sm(quant=None, kv="auto"):
        import jax.random as jrandom

        p = (
            params
            if quant is None
            else qwen3.init_params(spec, jrandom.PRNGKey(0), quantization=quant)
        )
        eng = LLMEngine(
            spec=spec, params=p, kvcache_block_size=64,
            num_kvcache_blocks=32, max_model_len=256, max_num_seqs=4,
            eos=-1, attention_impl="pallas", warmup_shapes=False,
            kv_size_probe=False, tensor_parallel_size=1,
            tp_mode="shard_map", quantization=quant, kv_cache_dtype=kv,
        )
        assert eng.model_runner.tp_mode == "shard_map"
        assert eng.model_runner.mesh is not None
        return [r["token_ids"] for r in eng.generate(prompts, sp, use_tqdm=False)]

    tok_sm = run_sm()
    ok = tok_sm == tok_p
    print(f"[{time.time()-T0:5.1f}s] {'PASS' if ok else 'FAIL'} "
          f"shard_map(1-dev mesh) x Pallas under Mosaic: greedy tokens "
          f"match mesh-free", flush=True)
    if not ok:
        FAILURES.append(f"shard_map e2e: {tok_sm} vs {tok_p}")

    # Same combination with the quantized serving config (int4 + int8 KV):
    # shard_map bodies then also run the fused dequant+matmul and the
    # int8 in-page-scale attention/flush kernels under Mosaic.
    tok_smq = run_sm(quant="int4", kv="int8")
    ok = all(len(t) == sp.max_tokens for t in tok_smq)
    print(f"[{time.time()-T0:5.1f}s] {'PASS' if ok else 'FAIL'} "
          f"shard_map(1-dev mesh) x Pallas int4+int8KV: decoded "
          f"{[len(t) for t in tok_smq]} tokens", flush=True)
    if not ok:
        FAILURES.append("shard_map int4+int8kv e2e")

    print(f"\n{'SMOKE GATE PASS' if not FAILURES else 'SMOKE GATE FAIL'} "
          f"({time.time()-T0:.0f}s)", flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
