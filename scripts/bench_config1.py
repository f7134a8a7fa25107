"""BASELINE.md benchmark config 1: GPT-2 124M, INT8 weight-only, greedy,
batch=1, CPU backend (XLA:CPU — the Pallas kernels are TPU-only, so this
exercises the XLA dequant path; reference expectation is "quantized latency
< fp32" from tests/test_quantization.cpp:97-130, defined there for a GPU
path).

Prints int8 + bf16 decode tokens/s, the ratio, and one JSON line for
bench.py's tracked `config1_cpu_int8_tok_s` field.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    import bench
    from deeppowers_tpu.config import QuantMode

    quick = "--quick" in sys.argv
    kw = dict(batch=1, max_seq=256, steps=25 if quick else 50,
              reps=2 if quick else 3, cfg_name="gpt2")
    int8, _, _ = bench.measure(QuantMode.INT8, **kw)
    bf16, _, _ = bench.measure(None, **kw)
    print(f"gpt2-124M int8 w-only, greedy bs=1, CPU: {int8:.1f} tok/s",
          file=sys.stderr)
    print(f"gpt2-124M bf16 dense,  greedy bs=1, CPU: {bf16:.1f} tok/s",
          file=sys.stderr)
    print(json.dumps({"int8_tok_s": round(int8, 1),
                      "bf16_tok_s": round(bf16, 1),
                      "vs_bf16": round(int8 / bf16, 3)}))


if __name__ == "__main__":
    main()
