"""Process a text corpus through the engine in batches (reference:
scripts/batch_process.py — file corpus -> token stats)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="text file, one prompt per line")
    ap.add_argument("--output", default="-")
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    import deeppowers_tpu as dp
    from deeppowers_tpu.config import RuntimeConfig

    with open(args.input) as f:
        prompts = [ln.rstrip("\n") for ln in f if ln.strip()]

    model = dp.load_model(args.model)
    model.runtime = RuntimeConfig(max_batch_size=args.batch_size)
    model._reset_engine()
    gen = dp.GenerationConfig(max_tokens=args.max_tokens, temperature=0.0,
                              do_sample=False)

    out = open(args.output, "w") if args.output != "-" else sys.stdout
    t0 = time.perf_counter()
    total_tokens = 0
    prompt_lens = []
    for i in range(0, len(prompts), args.batch_size):
        chunk = prompts[i:i + args.batch_size]
        outs = model.generate_batch(chunk, gen)
        for p, o in zip(chunk, outs):
            ids = model.tokenizer.encode(p)
            prompt_lens.append(len(ids))
            total_tokens += args.max_tokens
            out.write(json.dumps({"prompt": p, "completion": o}) + "\n")
    dt = time.perf_counter() - t0
    print(f"\n{len(prompts)} prompts, {total_tokens} tokens, "
          f"{total_tokens / dt:.1f} tok/s; prompt len "
          f"avg {np.mean(prompt_lens):.1f} p95 "
          f"{np.percentile(prompt_lens, 95):.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
