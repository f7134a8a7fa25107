"""Engine-level A/B for the 7B int4 decode config: int4 in-block scaling
mode x block_k, measured as end-to-end decode tokens/s (the microbench in
bench_kernels.py can mislead — VMEM residency, isolated-shape effects).

One TPU claim, all variants in-process: the mode rides the static jit key
(resolved at trace time from the module default this script flips), and
block sizes are installed per shape via set_dqmm_blocks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DPT_PLATFORM"])


# llama2-7b kernel weight shapes (K, N) seen by dequant_matmul under the
# fused decode path: qkv, attn_out, w_in (gate|up columns), w_out (glu,
# ragged K), lm_head
SHAPES_7B = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096),
             (4096, 32000)]


def main():
    import bench
    from deeppowers_tpu.config import QuantMode
    from deeppowers_tpu.ops.pallas import dequant_matmul as dq

    kw = dict(batch=8, max_seq=512, steps=50, cfg_name="llama2-7b",
              group_size=128, kv_cache_dtype="int4", direct_quant=True)

    # microbench (>VMEM sweep, docs/benchmarks.md) says: bk2048 always,
    # grouped ~= scale for bf16 acts, W4A8 well ahead (635/440 vs 456/353
    # GB/s). Confirm at the engine level: the new bk2048 default with each
    # mode, plus W4A8.
    results = {}
    for label, mode, act_bits in (("grouped", "grouped", 0),
                                  ("scale", "scale", 0),
                                  ("w4a8", "grouped", 8)):
        dq._DQMM_BLOCKS.clear()
        dq._DQMM_INT4_MODE.clear()
        dq._INT4_PRE_MODE = mode
        tps = bench.measure(QuantMode.INT4, act_bits=act_bits, **kw)
        results[label] = tps
        print(f"7b int4 g128 + int4 KV, bs=8, {label}: {tps:.1f} tok/s",
              flush=True)

    best = max(results, key=results.get)
    print(f"BEST: {best} -> {results[best]:.1f} tok/s")


if __name__ == "__main__":
    main()
