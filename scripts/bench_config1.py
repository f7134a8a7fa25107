"""BASELINE.md benchmark config 1: GPT-2 124M, INT8 weight-only, greedy,
batch=1, CPU backend (XLA:CPU — the Pallas kernels are TPU-only, so this
exercises the XLA dequant path; reference expectation is "quantized latency
< fp32" from tests/test_quantization.cpp:97-130, defined there for a GPU
path).

Prints int8 + bf16 decode tokens/s and the ratio.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import bench
    from deeppowers_tpu.config import QuantMode

    kw = dict(batch=1, max_seq=256, steps=50, reps=3, cfg_name="gpt2")
    int8 = bench.measure(QuantMode.INT8, **kw)
    bf16 = bench.measure(None, **kw)
    print(f"gpt2-124M int8 w-only, greedy bs=1, CPU: {int8:.1f} tok/s")
    print(f"gpt2-124M bf16 dense,  greedy bs=1, CPU: {bf16:.1f} tok/s")
    print(f"int8/bf16: {int8 / bf16:.3f}x")


if __name__ == "__main__":
    main()
