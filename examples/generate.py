#!/usr/bin/env python
"""End-to-end generation demo.

Parity: reference `scheduler_example.py:12-50` (Qwen3 chat template, batched
prompts through generate). Point --model at a local HF Qwen3 checkpoint.

  python examples/generate.py --model ~/models/Qwen3-0.6B \
      --quant int8 --kv fp8 --max-tokens 128
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--quant", choices=["int8", "int4"], default=None)
    ap.add_argument("--kv", choices=["auto", "fp8", "int8"], default="auto")
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--decode-window", type=int, default=8)
    ap.add_argument("--no-chat-template", action="store_true")
    ap.add_argument("prompts", nargs="*", default=None)
    args = ap.parse_args()

    from lightvllm_tpu import LLM, SamplingParams

    llm = LLM(
        args.model,
        quantization=args.quant,
        kv_cache_dtype=args.kv,
        decode_window=args.decode_window,
    )
    prompts = args.prompts or [
        "Explain paged attention in two sentences.",
        "Write a haiku about systolic arrays.",
        "What is 17 * 23?",
    ]
    if not args.no_chat_template and llm.tokenizer is not None and getattr(
        llm.tokenizer, "chat_template", None
    ):
        prompts = [
            llm.tokenizer.apply_chat_template(
                [{"role": "user", "content": p}],
                tokenize=False,
                add_generation_prompt=True,
            )
            for p in prompts
        ]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=args.temperature, max_tokens=args.max_tokens),
    )
    for p, o in zip(prompts, outs):
        print(f"\n=== prompt: {p[:80]!r}\n{o['text']}")
    print("\nthroughput:", llm.throughput)


if __name__ == "__main__":
    main()
