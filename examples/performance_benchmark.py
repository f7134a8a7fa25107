"""Latency percentile grid: batch {1,2,4,8,16} x seq {32,64,128,256}
(reference: examples/performance_benchmark.cpp:15-34 — p90/p95/p99)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

import deeppowers_tpu as dp
from deeppowers_tpu.config import GenerationConfig, RuntimeConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2")
    ap.add_argument("--quantize", choices=["none", "int8", "int4"],
                    default="int8")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    model = dp.load_model(args.model)
    if args.quantize != "none":
        dp.quantize_model(model, args.quantize)

    print(f"{'batch':>5} {'seq':>5} {'avg_ms':>8} {'p90':>8} {'p95':>8} "
          f"{'p99':>8} {'tok/s':>8}")
    rng = np.random.default_rng(0)
    for batch in (1, 2, 4, 8, 16):
        model.runtime = RuntimeConfig(max_batch_size=max(batch, 1))
        model._reset_engine()
        for seq in (32, 64, 128, 256):
            gen = GenerationConfig(max_tokens=seq, temperature=0.0,
                                   do_sample=False)
            prompts = [rng.integers(0, model.cfg.vocab_size,
                                    size=16).tolist()
                       for _ in range(batch)]
            model.engine.generate_batch(prompts, gen)  # warmup
            lat = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                model.engine.generate_batch(prompts, gen)
                lat.append((time.perf_counter() - t0) * 1e3)
            lat = np.asarray(lat)
            tokps = batch * seq / (lat.mean() / 1e3)
            print(f"{batch:>5} {seq:>5} {lat.mean():>8.1f} "
                  f"{np.percentile(lat, 90):>8.1f} "
                  f"{np.percentile(lat, 95):>8.1f} "
                  f"{np.percentile(lat, 99):>8.1f} {tokps:>8.1f}")


if __name__ == "__main__":
    main()
