"""Measure speculative-decoding acceptance across workload classes.

VERDICT round 1 item 8: round-1 speedups were quoted on favorable workloads
("repetitive text", "perfect draft upper bound"); this harness measures the
acceptance-length DISTRIBUTION per workload so the serving-relevant speedup
is known — and documents the auto-disable policy's break-even.

Usage: python scripts/bench_speculative.py [K]

Note: presets are random-init here, so acceptance reflects the drafting
mechanism against the model's own (greedy/sampled) continuations, not
real-text language statistics; the workload classes bound the realistic
range (repetitive >> natural-ish > adversarial-random).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an explicit
# platform request (DPT_PLATFORM=cpu) via the config knob it does respect
import os as _os
if _os.environ.get("DPT_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["DPT_PLATFORM"])
import jax.numpy as jnp

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4

NATURAL = (
    "It was the best of times, it was the worst of times, it was the age "
    "of wisdom, it was the age of foolishness, it was the epoch of belief, "
    "it was the epoch of incredulity, it was the season of Light, it was "
    "the season of Darkness, it was the spring of hope, it was the winter "
    "of despair.")

CODE = (
    "def fib(n):\n    if n < 2:\n        return n\n    return fib(n-1) + "
    "fib(n-2)\n\nfor i in range(10):\n    print(fib(i))\n")


def run(name, prompt_ids, temperature, max_tokens=96):
    cfg = tiny_llama_config(vocab_size=512, max_seq_len=1024)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=1, max_seq_len=1024,
                       prefill_buckets=(128, 256),
                       speculative_tokens=K, speculative_ngram=3)
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=max_tokens, temperature=temperature,
                           do_sample=temperature > 0, seed=0)
    eng.generate(prompt_ids, gen)
    hist = eng.spec_accept_hist
    total = max(int(hist.sum()), 1)
    dist = " ".join(f"{i}:{100*int(c)/total:.0f}%"
                    for i, c in enumerate(hist) if c)
    print(f"{name:<26} windows={total:>4}  mean={eng.spec_window_mean:.2f}  "
          f"dist[{dist}]")
    return eng.spec_window_mean


def text_ids(s, vocab=512):
    return [2 + (b % (vocab - 4)) for b in s.encode()][:200]


def main():
    print(f"prompt-lookup speculation, K={K} "
          f"(backend {jax.default_backend()})")
    run("repetitive/greedy", [5, 6, 7] * 10, 0.0)
    run("natural-prose/greedy", text_ids(NATURAL), 0.0)
    run("natural-prose/t0.8", text_ids(NATURAL), 0.8)
    run("code/greedy", text_ids(CODE), 0.0)
    run("adversarial-random/t1.5", list(range(1, 40)), 1.5)
    print("\npolicy: RuntimeConfig(speculative_min_accepted=1.2) disables "
          "speculation on workloads whose window mean stays below "
          "break-even (~1.2 for prompt-lookup: one verify forward + "
          "~10-20% window overhead per step).")


if __name__ == "__main__":
    main()
