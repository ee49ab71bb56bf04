#!/usr/bin/env python
"""TPU validation for the r2 staged-KV decode + redesigned quant kernel.

Checks, on the real chip (no interpret mode):
  1. quant_matmul_pallas int8/int4 vs the jnp oracle at decode + prefill shapes
  2. kv_flush_pallas vs the scatter oracle (bf16 + fp8 pages)
  3. staged-tail paged_flash_decode vs the jnp oracle
  4. end-to-end: staged engine tokens == scatter engine tokens (bf16, tiny model)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

from lightvllm_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
from lightvllm_tpu.ops.quantization import quantize_weight, quantized_matmul

# ---- 1. quant matmul ----
rng = np.random.default_rng(0)
for bits in (8, 4):
    for T, In, Out in ((32, 1024, 3072), (64, 1024, 1024), (256, 2048, 4096),
                       (8, 512, 1536)):
        x = jnp.asarray(rng.standard_normal((T, In)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((In, Out)) * 0.02, jnp.bfloat16)
        qt = quantize_weight(w, bits=bits, group_size=128)
        want = np.asarray(quantized_matmul(x, qt), np.float32)
        got = np.asarray(
            quant_matmul_pallas(x, qt.data, qt.scale, bits=bits), np.float32
        )
        err = np.abs(got - want).max()
        rel = err / (np.abs(want).max() + 1e-9)
        status = "OK" if rel < 2e-2 else "FAIL"
        print(f"qmm bits={bits} T={T} In={In} Out={Out}: maxabs={err:.4g} "
              f"rel={rel:.3g} {status}", flush=True)
        assert rel < 2e-2, (bits, T, In, Out)

# ---- 2. flush kernel (compiled) ----
from lightvllm_tpu.ops.pallas.kv_append import kv_flush_pallas

for dtype, name in ((jnp.bfloat16, "bf16"),):
    NB, Hkv, BSZ, D = 16, 4, 16, 128
    B, W = 5, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = jax.random.normal(ks[0], (NB, Hkv, BSZ, D), dtype)
    vp = jax.random.normal(ks[1], (NB, Hkv, BSZ, D), dtype)
    k_stage = jax.random.normal(ks[2], (B, Hkv, W, D), dtype)
    v_stage = jax.random.normal(ks[3], (B, Hkv, W, D), dtype)
    tables = np.arange(B * 3, dtype=np.int32).reshape(B, 3)
    start = np.asarray([0, 7, BSZ - 1, BSZ, -(1 << 30)], np.int32)[:B]
    want_k, want_v = kp, vp
    for b in range(B):
        if start[b] < 0:
            continue
        for j in range(W):
            pos = int(start[b]) + j
            page = tables[b, pos // BSZ]
            row = pos % BSZ
            want_k = want_k.at[page, :, row].set(k_stage[b, :, j])
            want_v = want_v.at[page, :, row].set(v_stage[b, :, j])
    got_k, got_v = kv_flush_pallas(
        kp, vp, k_stage, v_stage, jnp.asarray(start), jnp.asarray(tables),
        block_size=BSZ, window=W)
    ek = np.abs(np.asarray(got_k, np.float32) - np.asarray(want_k, np.float32)).max()
    ev = np.abs(np.asarray(got_v, np.float32) - np.asarray(want_v, np.float32)).max()
    print(f"flush {name}: k_err={ek} v_err={ev} "
          f"{'OK' if ek == 0 and ev == 0 else 'FAIL'}", flush=True)
    assert ek == 0 and ev == 0

# ---- 3. staged-tail flash decode vs jnp oracle ----
from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode

B, Hq, Hkv, D, BSZ, NB_per, W = 8, 8, 4, 128, 16, 8, 8
NBtot = B * NB_per
ks = jax.random.split(jax.random.PRNGKey(1), 6)
q = jax.random.normal(ks[0], (B, Hq, D), jnp.bfloat16)
kpg = jax.random.normal(ks[1], (NBtot, Hkv, BSZ, D), jnp.bfloat16)
vpg = jax.random.normal(ks[2], (NBtot, Hkv, BSZ, D), jnp.bfloat16)
kst = jax.random.normal(ks[3], (B, Hkv, W, D), jnp.bfloat16)
vst = jax.random.normal(ks[4], (B, Hkv, W, D), jnp.bfloat16)
tables = jnp.asarray(
    np.arange(NBtot, dtype=np.int32).reshape(B, NB_per))
ctx = jnp.asarray(rng.integers(0, NB_per * BSZ, B), jnp.int32)
ctx = ctx.at[0].set(0)  # row whose only tokens are the staged tail
stage_len = jnp.int32(5)
scale = D ** -0.5

got = paged_flash_decode(q, kpg, vpg, tables, ctx, kst, vst, stage_len,
                         block_size=BSZ, scale=scale)

# oracle
qf = np.asarray(q, np.float32)
out_ref = np.zeros((B, Hq, D), np.float32)
G = Hq // Hkv
for b in range(B):
    rows = []
    for pos in range(int(ctx[b])):
        pg = int(tables[b, pos // BSZ])
        rows.append(np.asarray(kpg[pg, :, pos % BSZ], np.float32))
    kk = np.stack(rows, 0) if rows else np.zeros((0, Hkv, D), np.float32)
    vrows = []
    for pos in range(int(ctx[b])):
        pg = int(tables[b, pos // BSZ])
        vrows.append(np.asarray(vpg[pg, :, pos % BSZ], np.float32))
    vv = np.stack(vrows, 0) if vrows else np.zeros((0, Hkv, D), np.float32)
    kk = np.concatenate([kk, np.asarray(kst[b], np.float32).transpose(1, 0, 2)[:int(stage_len)]], 0)
    vv = np.concatenate([vv, np.asarray(vst[b], np.float32).transpose(1, 0, 2)[:int(stage_len)]], 0)
    for h in range(Hq):
        hk = h // G
        s = (kk[:, hk] @ qf[b, h]) * scale
        p = np.exp(s - s.max())
        p /= p.sum()
        out_ref[b, h] = p @ vv[:, hk]
err = np.abs(np.asarray(got, np.float32) - out_ref).max()
print(f"staged flash decode: err={err:.4g} {'OK' if err < 3e-2 else 'FAIL'}",
      flush=True)
assert err < 3e-2

# ---- 4. end-to-end staged vs scatter on TPU (bf16 tiny model) ----
from lightvllm_tpu import SamplingParams
from lightvllm_tpu.engine.llm_engine import LLMEngine
from lightvllm_tpu.models import qwen3

spec = qwen3.ModelSpec(
    num_layers=2, hidden_size=256, num_q_heads=8, num_kv_heads=4,
    head_dim=128, intermediate_size=512, vocab_size=512, rope_theta=1e4,
    rms_eps=1e-6, tie_word_embeddings=True, dtype="bfloat16",
)
params = qwen3.init_params(spec, jax.random.PRNGKey(0))
kw = dict(
    spec=spec, params=params, kvcache_block_size=16, num_kvcache_blocks=128,
    max_model_len=256, max_num_seqs=4, eos=511, decode_window=8,
    warmup_shapes=False, kv_size_probe=False,
)
prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11] * 15, [3]]
sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
out_sc = LLMEngine(decode_kv_mode="scatter", **kw).generate(
    prompts, sp, use_tqdm=False)
out_st = LLMEngine(decode_kv_mode="staged", **kw).generate(
    prompts, sp, use_tqdm=False)
n_match = sum(a["token_ids"] == b["token_ids"] for a, b in zip(out_sc, out_st))
print(f"e2e staged vs scatter: {n_match}/{len(prompts)} sequences identical",
      flush=True)
for a, b in zip(out_sc, out_st):
    if a["token_ids"] != b["token_ids"]:
        print("  scatter:", a["token_ids"][:16])
        print("  staged :", b["token_ids"][:16])
print("ALL TPU VALIDATION DONE", flush=True)


def validate_int8_kv():
    """INT8 KV on the real chip: flush kernel + decode kernel + prefill
    kernel vs the jnp oracles, and e2e engine int8 vs exact cache."""
    from lightvllm_tpu.ops.kv_cache import (
        alloc_kv_cache, gather_kv_for_seqs, write_kv_layer, PAD_SLOT,
        _layer_scales,
    )
    from lightvllm_tpu.ops.pallas.kv_append import kv_flush_pallas
    from lightvllm_tpu.ops.pallas.decode_attention import paged_flash_decode

    rng = np.random.default_rng(7)
    NB, Hkv, BSZ, D = 16, 4, 16, 128
    B, W = 4, 8

    # --- flush kernel int8 (compiled) vs window-scatter oracle ---
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    pre_k, pre_v = mk(12, Hkv, D), mk(12, Hkv, D)

    def fresh():
        c = alloc_kv_cache(1, Hkv, NB, BSZ, D, jnp.bfloat16, fp8=False, int8=True)
        return write_kv_layer(c, 0, pre_k, pre_v, jnp.arange(12, dtype=jnp.int32))

    k_st = mk(B, Hkv, W, D).astype(jnp.bfloat16)
    v_st = mk(B, Hkv, W, D).astype(jnp.bfloat16)
    tables = jnp.asarray([[0, 1], [2, 3], [4, 5], [6, 7]], jnp.int32)
    start = np.asarray([12, 0, BSZ - 3, -(1 << 30)], np.int32)

    oracle = fresh()
    pos = start[:, None] + np.arange(W)
    blk = np.take_along_axis(np.asarray(tables), np.clip(pos // BSZ, 0, 1), axis=1)
    slots = np.where(pos >= 0, blk * BSZ + pos % BSZ, PAD_SLOT)
    kw = k_st.transpose(0, 2, 1, 3).reshape(B * W, Hkv, D)
    vw = v_st.transpose(0, 2, 1, 3).reshape(B * W, Hkv, D)
    oracle = write_kv_layer(oracle, 0, kw, vw, jnp.asarray(slots.reshape(-1), jnp.int32))

    got = fresh()
    gk, gv = kv_flush_pallas(
        got.k[0], got.v[0], k_st, v_st, jnp.asarray(start), tables,
        sc_shards=1, block_size=BSZ, window=W)

    def pg_scales(c):  # decoded in-page scales, (NB, 2, Hkv, D)
        ks, vs = _layer_scales(c, 0)
        return np.stack([np.asarray(ks), np.asarray(vs)], 1)

    got_c = type(got)(k=(gk,), v=(gv,), sc_shards=1)
    es = np.abs(pg_scales(got_c) - pg_scales(oracle)).max()
    ek = np.abs(np.asarray(gk, np.int32) - np.asarray(oracle.k[0], np.int32)).max()
    ev = np.abs(np.asarray(gv, np.int32) - np.asarray(oracle.v[0], np.int32)).max()
    print(f"int8 flush: scale_err={es:.3g} k_err={ek} v_err={ev} "
          f"{'OK' if es < 1e-5 and ek <= 1 and ev <= 1 else 'FAIL'}", flush=True)
    assert es < 1e-5 and ek <= 1 and ev <= 1  # <=1: f32 vs bf16 rounding edge

    # --- decode kernel int8 vs jnp oracle (uses written cache) ---
    cache = oracle
    q = jnp.asarray(rng.standard_normal((B, 8, D)), jnp.bfloat16)
    ctx = jnp.asarray([20, 8, BSZ + 5, 1], jnp.int32)
    scale = D ** -0.5
    got_o = paged_flash_decode(
        q, cache.k[0], cache.v[0], tables, ctx, sc_shards=1,
        block_size=BSZ, scale=scale)
    kf, vf = gather_kv_for_seqs(cache, 0, tables, BSZ, jnp.float32)
    out_ref = np.zeros((B, 8, D), np.float32)
    qf = np.asarray(q, np.float32)
    G = 8 // Hkv
    for b in range(B):
        kk = np.asarray(kf)[b][: int(ctx[b])]
        vv = np.asarray(vf)[b][: int(ctx[b])]
        for h in range(8):
            s = (kk[:, h // G] @ qf[b, h]) * scale
            p = np.exp(s - s.max()); p /= p.sum()
            out_ref[b, h] = p @ vv[:, h // G]
    err = np.abs(np.asarray(got_o, np.float32) - out_ref).max()
    print(f"int8 flash decode: err={err:.4g} {'OK' if err < 3e-2 else 'FAIL'}",
          flush=True)
    assert err < 3e-2

    # --- e2e engine: int8 KV tokens track the exact cache ---
    from lightvllm_tpu import SamplingParams
    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3

    spec = qwen3.ModelSpec(
        num_layers=2, hidden_size=256, num_q_heads=8, num_kv_heads=4,
        head_dim=128, intermediate_size=512, vocab_size=512, rope_theta=1e4,
        rms_eps=1e-6, tie_word_embeddings=True, dtype="bfloat16",
    )
    params = qwen3.init_params(spec, jax.random.PRNGKey(0))
    kw2 = dict(spec=spec, params=params, kvcache_block_size=16,
               num_kvcache_blocks=128, max_model_len=256, max_num_seqs=4,
               eos=511, decode_window=8, warmup_shapes=False,
               kv_size_probe=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11] * 15, [3]]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    ref = LLMEngine(**kw2).generate(prompts, sp, use_tqdm=False)
    got8 = LLMEngine(kv_cache_dtype="int8", **kw2).generate(
        prompts, sp, use_tqdm=False)
    n = sum(a["token_ids"] == b["token_ids"] for a, b in zip(ref, got8))
    print(f"int8 e2e: {n}/{len(prompts)} sequences identical to exact-cache",
          flush=True)
    assert n >= 3
    print("INT8 KV VALIDATION DONE", flush=True)


if __name__ == "__main__" and os.environ.get("VALIDATE_INT8"):
    validate_int8_kv()
