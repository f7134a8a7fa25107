"""Streaming generation with Ctrl-C cancel and tokens/s reporting
(reference: examples/stream_generation.cpp:42-62)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import signal
import sys
import time

import deeppowers_tpu as dp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--max-tokens", type=int, default=100)
    args = ap.parse_args()

    model = dp.load_model(args.model)
    cancelled = {"flag": False}
    signal.signal(signal.SIGINT,
                  lambda *a: cancelled.__setitem__("flag", True))

    count = {"n": 0}
    t0 = time.perf_counter()

    def on_chunk(delta: str) -> bool:
        sys.stdout.write(delta)
        sys.stdout.flush()
        count["n"] += 1
        return not cancelled["flag"]

    print(args.prompt, end="", flush=True)
    model.generate_stream(args.prompt, on_chunk,
                          max_tokens=args.max_tokens, temperature=0.8)
    dt = time.perf_counter() - t0
    print(f"\n\n[{count['n']} chunks in {dt:.2f}s, "
          f"{count['n'] / dt:.1f} chunks/s"
          f"{' — cancelled' if cancelled['flag'] else ''}]")


if __name__ == "__main__":
    main()
