"""Batched generation with batch-vs-sequential speedup measurement
(reference: examples/batch_generation.cpp:59-74)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import deeppowers_tpu as dp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--max-tokens", type=int, default=32)
    args = ap.parse_args()

    prompts = [
        "The weather today is",
        "Artificial intelligence will",
        "In the beginning",
        "The best way to learn is",
    ]
    model = dp.load_model(args.model)
    gen = dp.GenerationConfig(max_tokens=args.max_tokens, temperature=0.0,
                              do_sample=False)

    # warmup (compilation)
    model.generate(prompts[0], gen)

    t0 = time.perf_counter()
    outs = model.generate_batch(prompts, gen)
    batch_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    for p in prompts:
        model.generate(p, gen)
    seq_time = time.perf_counter() - t0

    for p, o in zip(prompts, outs):
        print(f"> {p!r} -> {o[:60]!r}")
    print(f"\nbatch: {batch_time:.2f}s  sequential: {seq_time:.2f}s  "
          f"speedup: {seq_time / batch_time:.2f}x")


if __name__ == "__main__":
    main()
