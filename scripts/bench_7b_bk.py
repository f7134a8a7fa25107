"""Engine-level block_k check for the 7B int4 config: the microbench says
bk2048 wins in isolation (456 vs 397 GB/s), but the full decode step runs
the fused kernels under scan with attention in between — VMEM pressure and
DMA overlap differ. Forces bk1024 via per-shape tuned entries (which win
over the int4 bk2048 default in _resolve_blocks)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DPT_PLATFORM"])

SHAPES_7B = [(4096, 12288), (4096, 4096), (4096, 22016), (11008, 4096),
             (4096, 32000)]


def main():
    import bench
    from deeppowers_tpu.config import QuantMode
    from deeppowers_tpu.ops.pallas import dequant_matmul as dq

    kw = dict(batch=8, max_seq=512, steps=50, cfg_name="llama2-7b",
              group_size=128, kv_cache_dtype="int4", direct_quant=True)

    results = {}
    for label, bk, act_bits in (("bk1024", 1024, 0), ("bk2048", 2048, 0),
                                ("bk1024-w4a8", 1024, 8),
                                ("bk2048-w4a8", 2048, 8)):
        dq._DQMM_BLOCKS.clear()
        for k, n in SHAPES_7B:
            dq.set_dqmm_blocks(k, n, 4, 1024, bk)
        tps = bench.measure(QuantMode.INT4, act_bits=act_bits, **kw)
        results[label] = tps
        print(f"7b int4 g128 + int4 KV, bs=8, {label}: {tps:.1f} tok/s",
              flush=True)
    best = max(results, key=results.get)
    print(f"BEST: {best} -> {results[best]:.1f} tok/s")


if __name__ == "__main__":
    main()
