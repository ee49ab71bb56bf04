#!/usr/bin/env python
"""Quantization quality gate on a REAL trained checkpoint (BASELINE.md:
ppl delta <= 0.1 for INT8, <= 0.5 for INT4 vs BF16).

This environment has zero network egress, so no public pretrained
checkpoint can be downloaded. Instead this tool TRAINS a byte-level Qwen3
(same architecture family the engine serves: GQA + qk-norm + SwiGLU +
tied embeddings, head_dim 128 so the Pallas serving kernels apply) on the
Python source available on this machine — real, structured natural data —
until it is a genuinely predictive model (~1.3 bits/byte), then measures
perplexity through the engine's own serving forward (lightvllm_tpu.evals)
for every quantization configuration. The deltas are real measurements of
the serving stack's numerics on a trained model; only the model's SCALE
(12M params) differs from the north-star Qwen3-8B target.

Stages (idempotent, artifacts under .quality/):
  corpus   build train/eval byte streams from local .py files
  train    train on TPU (lax.scan'd steps, adamw), save .npz via save_params
  gate     run bf16 / int8 / int4 x kv {auto,fp8} x attn {jnp,pallas}
           through evals.evaluate_ppl; print JSON lines

Usage: python tools/quality_gate.py [corpus|train|gate|all] [--attn jnp]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

QDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".quality")

SEQ = 512
BATCH = 32
LR = 1e-3
EVAL_TOKENS = 65536

# Model scales (VERDICT r2 next#6: the 12M gate cannot probe the outlier
# channels that break int4 at 8B scale; a ~90M train on the same corpus
# probes them much harder). Same serving-relevant architecture family at
# every size: GQA + qk-norm + SwiGLU + tied embeddings + head_dim 128.
SIZES = {
    "12m": dict(
        steps=4000, corpus_mib=24,
        spec=dict(num_layers=6, hidden_size=384, num_q_heads=4,
                  num_kv_heads=2, intermediate_size=1152),
    ),
    "90m": dict(
        steps=8000, corpus_mib=160,
        spec=dict(num_layers=12, hidden_size=768, num_q_heads=8,
                  num_kv_heads=4, intermediate_size=2304),
    ),
}
SIZE = os.environ.get("QGATE_SIZE", "12m")


def _tag():
    # The original 12M artifacts predate the size flag; keep their names.
    return "" if SIZE == "12m" else f"_{SIZE}"


def _ckpt_path():
    return os.path.join(QDIR, f"tiny_pylm_f32{_tag()}.npz")


def _corpus_path(kind):
    return os.path.join(QDIR, f"corpus_{kind}{_tag()}.npy")


def spec_kwargs():
    return dict(
        head_dim=128, vocab_size=256, rope_theta=1e4, rms_eps=1e-6,
        tie_word_embeddings=True, **SIZES[SIZE]["spec"],
    )


def build_corpus() -> None:
    os.makedirs(QDIR, exist_ok=True)
    cap = SIZES[SIZE]["corpus_mib"] * 2**20
    roots = [
        os.path.join(os.path.dirname(QDIR)),  # this repo
        os.path.dirname(np.__file__),  # numpy source
    ]
    try:
        import jax as _jax

        roots.append(os.path.dirname(_jax.__file__))
    except Exception:
        pass
    # Larger scales need more unique bytes than numpy+jax hold; walk the
    # whole site-packages tree (torch, scipy, transformers, ... — all real
    # structured source) until the cap is met.
    roots.append(os.path.dirname(os.path.dirname(np.__file__)))
    chunks = []
    total = 0
    seen = set()
    for root in roots:
        for dirpath, _, files in os.walk(root):
            if ".git" in dirpath or ".quality" in dirpath:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                path = os.path.realpath(os.path.join(dirpath, f))
                if path in seen:
                    continue
                seen.add(path)
                try:
                    with open(path, "rb") as fh:
                        b = fh.read()
                except OSError:
                    continue
                if b:
                    chunks.append(np.frombuffer(b, np.uint8))
                    total += len(b)
            if total > cap:
                break
        if total > cap:
            break
    data = np.concatenate(chunks)
    # Held-out split: the stream's tail (different files than the head).
    n_eval = EVAL_TOKENS + 1
    train, evl = data[:-n_eval], data[-n_eval:]
    np.save(_corpus_path("train"), train)
    np.save(_corpus_path("eval"), evl)
    print(f"corpus: {len(train)/2**20:.1f} MiB train, {len(evl)} eval bytes")


def dense_forward(params, spec, tokens, positions):
    """Training-time dense causal forward over (B, S) token batches.

    Same math as the serving stack (models/qwen3.py _decoder_stack) minus
    the paged cache: rms_norm / apply_rope / swiglu are the serving ops,
    the GQA pattern and tied lm_head match compute_logits. f32 throughout.
    """
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.ops.activations import swiglu
    from lightvllm_tpu.ops.norms import rms_norm
    from lightvllm_tpu.ops.rope import apply_rope

    B, S = tokens.shape
    E, D = spec.hidden_size, spec.head_dim
    Hq, Hkv = spec.num_q_heads, spec.num_kv_heads
    G = Hq // Hkv
    h = jnp.take(params["embed"], tokens, axis=0)  # (B, S, E)
    causal = jnp.tril(jnp.ones((S, S), bool))
    lp_all = params["layers"]
    for l in range(spec.num_layers):
        lp = {k: (None if v is None else v[l]) for k, v in lp_all.items()}
        normed = rms_norm(h, lp["input_ln"], spec.rms_eps)
        q = (normed @ lp["wq"]).reshape(B, S, Hq, D)
        k = (normed @ lp["wk"]).reshape(B, S, Hkv, D)
        v = (normed @ lp["wv"]).reshape(B, S, Hkv, D)
        if spec.qk_norm:
            q = rms_norm(q, lp["q_norm"], spec.rms_eps)
            k = rms_norm(k, lp["k_norm"], spec.rms_eps)
        q, k = jax.vmap(
            lambda qq, kk: apply_rope(qq, kk, positions, spec.rope_theta,
                                      spec.rope_scaling)
        )(q, k)
        kx = jnp.repeat(k, G, axis=2)  # (B, S, Hq, D)
        vx = jnp.repeat(v, G, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q, kx) * (D ** -0.5)
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", p, vx).reshape(B, S, Hq * D)
        h = h + attn @ lp["wo"]
        normed2 = rms_norm(h, lp["post_ln"], spec.rms_eps)
        h = h + swiglu(normed2 @ lp["w_gate"], normed2 @ lp["w_up"]) @ lp["w_down"]
    h = rms_norm(h, params["final_ln"], spec.rms_eps)
    return h @ params["embed"].T  # tied head (B, S, V)


def train() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.utils.loader import save_params

    spec = qwen3.ModelSpec(dtype="float32", **spec_kwargs())
    params = qwen3.init_params(spec, jax.random.PRNGKey(42))
    n_par = sum(x.size for x in jax.tree.leaves(params))
    steps = SIZES[SIZE]["steps"]
    print(f"training {n_par/1e6:.1f}M params, {steps} steps "
          f"batch {BATCH}x{SEQ}", flush=True)

    corpus = np.load(_corpus_path("train"))
    corpus_dev = jnp.asarray(corpus)  # few MiB of uint8 on device
    max_start = len(corpus) - SEQ - 1

    sched = optax.warmup_cosine_decay_schedule(0.0, LR, 200, steps, LR * 0.05)
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)
    positions = jnp.arange(SEQ, dtype=jnp.int32)

    def loss_fn(p, batch):
        x, y = batch[:, :-1], batch[:, 1:]
        logits = dense_forward(p, spec, x, positions)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)
        return jnp.mean(nll)

    def one_step(carry, step):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        starts = jax.random.randint(sub, (BATCH,), 0, max_start)
        batch = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(corpus_dev, s, SEQ + 1)
        )(starts).astype(jnp.int32)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    CHUNK = 100  # steps per device dispatch (amortize tunnel RTT)

    @jax.jit
    def run_chunk(carry, base):
        return jax.lax.scan(one_step, carry, base + jnp.arange(CHUNK))

    carry = (params, opt_state, jax.random.PRNGKey(0))
    t0 = time.time()
    for c in range(steps // CHUNK):
        carry, losses = run_chunk(carry, jnp.int32(c * CHUNK))
        lo = np.asarray(losses)
        print(f"step {(c+1)*CHUNK}: loss {lo[-10:].mean():.4f} "
              f"({lo[-10:].mean()/np.log(2):.3f} bits/byte) "
              f"[{time.time()-t0:.0f}s]", flush=True)
    params = carry[0]
    save_params(params, _ckpt_path())
    print("saved", _ckpt_path())


def _quantize_stacked(params, bits: int, group_size: int = 128):
    """Per-layer quantization of the stacked projection weights, mirroring
    utils/loader.py stack_quant (quantize one layer at a time, restack)."""
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.ops.quantization import quantize_weight

    out = {k: v for k, v in params.items()}
    lay = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        # Per-layer tuple leaves (see models/qwen3.py init_params).
        lay[name] = tuple(
            quantize_weight(jnp.asarray(wi, jnp.bfloat16), bits, group_size)
            for wi in lay[name]
        )
    out["layers"] = lay
    return out


def quant_error_stats() -> None:
    """Per-layer, per-projection quantization error of the trained weights
    (VERDICT r2 next#6: surface the outlier channels that break int4).

    For every projection weight W and bits in {8, 4}: relative Frobenius
    reconstruction error of dequant(quant(W)), worst per-group error, and a
    channel-outlier ratio (max / median of per-out-channel absmax) — the
    statistic that predicts int4 breakdown. Writes
    .quality/quant_error{tag}.json with per-layer rows plus a histogram of
    per-group relative errors."""
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.ops.quantization import dequantize, quantize_weight
    from lightvllm_tpu.utils.loader import load_saved_params

    spec_f32 = qwen3.ModelSpec(dtype="float32", **spec_kwargs())
    params = load_saved_params(_ckpt_path(), spec_f32)
    rows = []
    hist_bins = np.linspace(0.0, 0.2, 41)
    hists = {8: np.zeros(40, np.int64), 4: np.zeros(40, np.int64)}
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        for l, wl in enumerate(params["layers"][name]):
            w = jnp.asarray(wl, jnp.float32)
            absmax_c = np.asarray(jnp.max(jnp.abs(w), axis=0))  # per out-chan
            outlier = float(absmax_c.max() / (np.median(absmax_c) + 1e-30))
            row = {"layer": l, "proj": name, "outlier_ratio": round(outlier, 2)}
            for bits in (8, 4):
                # group 128 matches _quantize_stacked's gate path.
                qt = quantize_weight(w.astype(jnp.bfloat16), bits, 128)
                deq = dequantize(qt, jnp.float32)
                err = deq - w
                rel = float(jnp.linalg.norm(err) / (jnp.linalg.norm(w) + 1e-30))
                # Per-(group, out) relative error against the group absmax.
                wg = np.asarray(w).reshape(qt.scale.shape[0], -1, w.shape[1])
                eg = np.asarray(err).reshape(wg.shape)
                gnorm = np.sqrt((wg ** 2).sum(1)) + 1e-30
                grel = np.sqrt((eg ** 2).sum(1)) / gnorm
                hists[bits] += np.histogram(grel, bins=hist_bins)[0]
                row[f"rel_err_int{bits}"] = round(rel, 5)
                row[f"worst_group_rel_err_int{bits}"] = round(float(grel.max()), 5)
            rows.append(row)
    worst = sorted(rows, key=lambda r: -r["rel_err_int4"])[:8]
    out = {
        "size": SIZE,
        "hist_bins": hist_bins.tolist(),
        "hist_group_rel_err": {str(b): h.tolist() for b, h in hists.items()},
        "per_layer": rows,
        "worst_int4": worst,
    }
    path = os.path.join(QDIR, f"quant_error{_tag()}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"quant_error_stats": path,
                      "max_outlier_ratio": max(r["outlier_ratio"] for r in rows),
                      "worst_int4_rel_err": worst[0]["rel_err_int4"]}), flush=True)


def outlier_probe() -> None:
    """Synthetic outlier-channel injection (VERDICT r3 next#8): real-LLM
    activation/weight channel outliers interact with absmax int4 grouping
    in ways a clean byte-LM census cannot probe. Inject them
    FUNCTION-PRESERVINGLY into the trained checkpoint, so every variant's
    bf16 ppl is identical and any delta is purely quantization numerics:

      - weight IN-ROW outliers (the absmax-grouping failure mode): for
        channel c, w_up[:, c] /= s and w_down[c, :] *= s. SwiGLU is
        elementwise-linear in up, so the function is exactly preserved;
        w_down gains s-times rows that share int4 quant groups with normal
        rows, crushing their precision under plain absmax.
      - K-CHANNEL outliers (int8-KV page-scale path): k_norm[c] *= s,
        q_norm[c] /= s. q.k scores are exactly preserved; the KV cache now
        stores a s-times K channel, probing the per-(page, head, channel)
        in-page scales (expected robust — scales are per-channel).

    Measures ppl for bf16 / int4 / int4+clip-search / int4+int8-KV at
    s in {10, 100} on 4 channels per layer; writes
    .quality/outlier_probe{tag}.json and appends a QUALITY.md-ready table.
    """
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.evals import evaluate_ppl
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.utils.loader import load_saved_params

    spec_f32 = qwen3.ModelSpec(dtype="float32", **spec_kwargs())
    spec = qwen3.ModelSpec(dtype="bfloat16", **spec_kwargs())
    tokens = np.load(_corpus_path("eval")).astype(np.int32)[:EVAL_TOKENS // 2]
    rng = np.random.default_rng(7)

    def inject(params, s: float, n_chan: int = 4):
        lay = dict(params["layers"])
        I = lay["w_up"][0].shape[1]
        D = lay["k_norm"][0].shape[0]
        w_up, w_down = list(lay["w_up"]), list(lay["w_down"])
        q_norm, k_norm = list(lay["q_norm"]), list(lay["k_norm"])
        for l in range(len(w_up)):
            chans = rng.choice(I, size=n_chan, replace=False)
            # np.asarray on a jax.Array is a READ-ONLY view; copy.
            up = np.array(w_up[l], np.float32)
            down = np.array(w_down[l], np.float32)
            up[:, chans] /= s
            down[chans, :] *= s
            w_up[l] = jnp.asarray(up, w_up[l].dtype if w_up[l].dtype != jnp.float32 else jnp.float32)
            w_down[l] = jnp.asarray(down)
            kchan = rng.choice(D, size=2, replace=False)
            knl = np.array(k_norm[l], np.float32)
            qnl = np.array(q_norm[l], np.float32)
            knl[kchan] *= s
            qnl[kchan] /= s
            k_norm[l] = jnp.asarray(knl)
            q_norm[l] = jnp.asarray(qnl)
        lay["w_up"], lay["w_down"] = tuple(w_up), tuple(w_down)
        lay["q_norm"], lay["k_norm"] = tuple(q_norm), tuple(k_norm)
        return {**params, "layers": lay}

    def q4(params, clip):
        from lightvllm_tpu.ops.quantization import quantize_weight

        lay = dict(params["layers"])
        for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            lay[name] = tuple(
                quantize_weight(jnp.asarray(wi, jnp.bfloat16), 4, 128,
                                clip_search=clip)
                for wi in lay[name]
            )
        return {**params, "layers": lay}

    results = []
    for s in (1.0, 10.0, 100.0):
        base = load_saved_params(_ckpt_path(), spec_f32)
        p = inject(base, s) if s > 1 else base
        p_bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 1 else x, p
        )
        row = {"outlier_scale": s}
        row["bf16"] = evaluate_ppl(p_bf16, spec, tokens, window=1024)["ppl"]
        row["int4"] = evaluate_ppl(q4(p, False), spec, tokens, window=1024)["ppl"]
        row["int4_clip"] = evaluate_ppl(q4(p, True), spec, tokens, window=1024)["ppl"]
        row["int4_int8kv"] = evaluate_ppl(
            q4(p, False), spec, tokens, window=1024, kv_cache_dtype="int8"
        )["ppl"]
        for k in ("int4", "int4_clip", "int4_int8kv"):
            row[f"{k}_delta"] = round(row[k] - row["bf16"], 4)
        results.append(row)
        print(json.dumps(row), flush=True)
    path = os.path.join(QDIR, f"outlier_probe{_tag()}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"outlier_probe": path}), flush=True)


def gate(attn_impls=("jnp",)) -> None:
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.evals import evaluate_ppl
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.utils.loader import load_saved_params

    spec_f32 = qwen3.ModelSpec(dtype="float32", **spec_kwargs())
    spec = qwen3.ModelSpec(dtype="bfloat16", **spec_kwargs())
    params_f32 = load_saved_params(_ckpt_path(), spec_f32)
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 1 else x,
        params_f32,
    )
    tokens = np.load(_corpus_path("eval")).astype(np.int32)

    results = []
    for attn in attn_impls:
        base = None
        for quant, kv in ((None, "auto"), ("int8", "auto"), ("int4", "auto"),
                          (None, "int8"), ("int8", "int8"), ("int4", "int8"),
                          ("int8", "fp8"), ("int4", "fp8")):
            if quant is None:
                p = params_bf16
            else:
                p = _quantize_stacked(params_f32, 8 if quant == "int8" else 4)
            r = evaluate_ppl(p, spec, tokens, window=1024,
                             attn_impl=attn, kv_cache_dtype=kv)
            r.update(quant=quant or "bf16", kv=kv, attn=attn)
            if quant is None:
                base = r["ppl"]
            else:
                r["ppl_delta_vs_bf16"] = r["ppl"] - base
            results.append(r)
            print(json.dumps(r), flush=True)
    with open(os.path.join(QDIR, f"gate_results{_tag()}.json"), "w") as f:
        json.dump(results, f, indent=1)


def decode_agree() -> None:
    """Decode-path quality of the attention dequant modes (the ppl gate is
    teacher-forced PREFILL; the decode kernel's fold/s8 variants never run
    there). Greedy-generate through the real engine decode path with
    int8 KV x {fold, s8} and bf16 KV as the reference; report per-config
    token agreement vs the bf16-KV generation. s8 adds ~0.4% q-rounding +
    ~0.8% p-rounding on top of int8-KV noise — this measures whether that
    moves sampled tokens on a trained model."""
    import jax
    import jax.numpy as jnp

    from lightvllm_tpu.engine.llm_engine import LLMEngine
    from lightvllm_tpu.models import qwen3
    from lightvllm_tpu.sampling_params import SamplingParams
    from lightvllm_tpu.utils.loader import load_saved_params

    spec = qwen3.ModelSpec(dtype="bfloat16", **spec_kwargs())
    eval_tokens = np.load(_corpus_path("eval")).astype(np.int32)
    rng = np.random.default_rng(11)
    prompts = []
    for _ in range(8):
        st = int(rng.integers(0, len(eval_tokens) - 128))
        prompts.append(eval_tokens[st : st + 64].tolist())
    sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)

    def gen(kv, dq):
        params = load_saved_params(_ckpt_path(), spec)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 1
            else x,
            params,
        )
        eng = LLMEngine(
            spec=spec, params=params, kvcache_block_size=64,
            num_kvcache_blocks=128, max_model_len=256, max_num_seqs=8,
            eos=-1, attention_impl="pallas", kv_cache_dtype=kv,
            attn_dequant_mode=dq, warmup_shapes=False, kv_size_probe=False,
            decode_window=8,
        )
        return [
            r["token_ids"]
            for r in eng.generate(prompts, sp, use_tqdm=False)
        ]

    ref = gen("auto", "fold")  # bf16 KV reference
    rows = []
    for dq in ("fold", "s8"):
        got = gen("int8", dq)
        agree = [
            sum(a == b for a, b in zip(g, r)) / len(r)
            for g, r in zip(got, ref)
        ]
        # Prefix agreement: tokens until first divergence (greedy decode
        # compounds any flip, so the tail is not independent evidence).
        prefix = []
        for g, r in zip(got, ref):
            n = 0
            for a, b in zip(g, r):
                if a != b:
                    break
                n += 1
            prefix.append(n / len(r))
        row = {
            "kv": "int8", "attn_dequant": dq,
            "mean_token_agreement_vs_bf16kv": round(float(np.mean(agree)), 4),
            "mean_prefix_agreement_vs_bf16kv": round(float(np.mean(prefix)), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(QDIR, f"decode_agree{_tag()}.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", nargs="?", default="all",
                    choices=["corpus", "train", "gate", "errstats",
                             "outliers", "decode_agree", "all"])
    ap.add_argument("--attn", default="jnp",
                    help="comma list: jnp,pallas (pallas needs the TPU)")
    args = ap.parse_args()
    if args.stage in ("corpus", "all") and not os.path.exists(
        _corpus_path("train")
    ):
        build_corpus()
    if args.stage in ("train", "all") and not os.path.exists(
        _ckpt_path()
    ):
        train()
    if args.stage in ("errstats", "all"):
        quant_error_stats()
    if args.stage in ("outliers", "all"):
        outlier_probe()
    if args.stage in ("decode_agree", "all"):
        decode_agree()
    if args.stage in ("gate", "all"):
        gate(tuple(args.attn.split(",")))
