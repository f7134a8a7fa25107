"""Basic generation (reference: examples/basic_generation.cpp).

Loads a model (HF checkpoint dir, native checkpoint, or preset name) and
generates a completion.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import deeppowers_tpu as dp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2",
                    help="checkpoint dir or preset name")
    ap.add_argument("--prompt", default="Hello, world")
    ap.add_argument("--max-tokens", type=int, default=50)
    ap.add_argument("--temperature", type=float, default=0.7)
    args = ap.parse_args()

    model = dp.load_model(args.model)
    print(f"model: {args.model}  params: {model.nbytes / 1e6:.1f} MB  "
          f"tpu: {dp.is_tpu_available()}")
    out = model.generate(args.prompt, max_tokens=args.max_tokens,
                         temperature=args.temperature)
    print(f"\n{args.prompt}{out}")


if __name__ == "__main__":
    main()
