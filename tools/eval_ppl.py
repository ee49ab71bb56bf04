#!/usr/bin/env python
"""Perplexity gate: BF16 vs quantized serving paths on the same token stream.

Usage:
  python tools/eval_ppl.py --model <hf_dir> --text <file.txt> [--window 1024]
      [--quant int8|int4] [--compare]
  python tools/eval_ppl.py --model <hf_dir> --tokens <file.npy> ...

With --compare, evaluates BF16 first and prints the delta (the BASELINE.md
gate: <= 0.1 for INT8, <= 0.5 for INT4).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text")
    ap.add_argument("--tokens")
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--quant", choices=["int8", "int4"])
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--max-tokens", type=int, default=0)
    ap.add_argument("--kv", choices=["auto", "fp8", "int8"], default="auto",
                    help="KV cache dtype for the quantized run")
    ap.add_argument("--attn", choices=["jnp", "pallas"], default="jnp",
                    help="attention implementation (pallas = serving kernels)")
    args = ap.parse_args()

    from transformers import AutoConfig, AutoTokenizer

    from lightvllm_tpu.evals import evaluate_ppl
    from lightvllm_tpu.models import get_model_module, qwen3

    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int32)
    else:
        assert args.text, "need --text or --tokens"
        tok = AutoTokenizer.from_pretrained(args.model)
        with open(args.text) as f:
            tokens = np.asarray(tok.encode(f.read()), np.int32)
    if args.max_tokens:
        tokens = tokens[: args.max_tokens]

    hf_config = AutoConfig.from_pretrained(args.model)
    mod = get_model_module(hf_config)
    spec = mod.ModelSpec.from_hf_config(hf_config)

    def run(quant, kv="auto"):
        params = mod.load_params(args.model, spec, quant, args.group_size)
        r = evaluate_ppl(
            params, spec, tokens, window=args.window,
            attn_impl=args.attn, kv_cache_dtype=kv,
        )
        r["quant"] = quant or "bf16"
        r["kv"] = kv
        r["attn"] = args.attn
        return r

    results = []
    if args.compare and (args.quant or args.kv != "auto"):
        results.append(run(None))
    results.append(run(args.quant, args.kv))
    if len(results) == 2:
        results[1]["ppl_delta_vs_bf16"] = results[1]["ppl"] - results[0]["ppl"]
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
