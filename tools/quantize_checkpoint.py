#!/usr/bin/env python
"""Offline weight quantizer (SURVEY.md §7 step 4).

Reads an HF safetensors checkpoint, quantizes the projections (INT8 or
INT4, grouped scales), and writes a single .npz the engine loads directly —
no load-time quantization, and the bf16 tree never has to fit in HBM.

  python tools/quantize_checkpoint.py --model <hf_dir> --quant int4 \
      --out qwen3-int4.npz
  ...
  LLM(<hf_dir>, quantized_checkpoint="qwen3-int4.npz")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--quant", choices=["int8", "int4"], required=True)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from transformers import AutoConfig

    from lightvllm_tpu.models import get_model_module
    from lightvllm_tpu.utils.loader import save_params

    hf_config = AutoConfig.from_pretrained(args.model)
    mod = get_model_module(hf_config)
    spec = mod.ModelSpec.from_hf_config(hf_config)
    params = mod.load_params(args.model, spec, args.quant, args.group_size)
    save_params(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
