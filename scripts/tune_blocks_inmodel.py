"""IN-MODEL validation of per-shape dequant-matmul block tunings.

Round-5 resolution of the tuner-vs-in-model discrepancy (VERDICT r4 item 7):
the bench_blocks_model harness measures each matmul in isolation with
streamed distinct weights, but its winners can still LOSE inside the real
decode step — the step's other kernels change VMEM pressure and pipeline
overlap. Measured on the 7B W4A8+k8v4 decode (tok/s, reps>=3, spreads <2%):

    entry                 harness pick   in-model vs default
    o        (4096,4096)  (2048,1024)    +1.6%   KEEP
    gate_up  (4096,22016) (512,1024)     -1.6%   REJECT -> (2048,1024) +0.4%
    down     (11008,4096) (4096,1024)    +2.9%   KEEP
    lm_head  (4096,32000) (4096,2048)    +2.2%   KEEP
    combined keep-set                    1158 -> 1223-1252 tok/s

The harness remains the CANDIDATE GENERATOR; this script is the judge: it
replays each persisted dqmm tuning through the full compiled decode step
(bench.measure slope methodology) and rewrites the cache with only entries
that beat the all-default baseline by more than the measured spread.

Usage:
    python scripts/tune_blocks_inmodel.py --config llama2-7b \
        [--apply]            # rewrite ~/.deeppowers_tpu/autotune.json

Configs map to the tracked bench workloads (bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


CONFIGS = {
    "llama2-7b": dict(batch=8, max_seq=512, steps=50,
                      cfg_name="llama2-7b", group_size=128,
                      kv_cache_dtype="k8v4", direct_quant=True, act_bits=8),
    "tinyllama-1.1b": dict(batch=8, max_seq=1024, steps=200,
                           kv_cache_dtype="int8"),
    "mixtral-mini": dict(batch=8, max_seq=512, steps=50,
                         cfg_name="mixtral-mini", group_size=128,
                         kv_cache_dtype="int8", direct_quant=True,
                         act_bits=8, sample_temp=0.8),
}
MODES = {"llama2-7b": "INT4", "tinyllama-1.1b": "INT8",
         "mixtral-mini": "INT4"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="llama2-7b", choices=CONFIGS)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--apply", action="store_true")
    args = ap.parse_args()

    import bench
    from deeppowers_tpu.config import QuantMode
    from deeppowers_tpu.ops.pallas import dequant_matmul as dq
    from deeppowers_tpu.runtime.autotuner import (_cache_key, _load_cache,
                                                  _save_cache)

    kw = dict(CONFIGS[args.config], reps=args.reps)
    mode = getattr(QuantMode, MODES[args.config])
    cache = _load_cache()
    prefix = _cache_key("dqmm_")
    entries = {k: v for k, v in cache.items()
               if k.startswith(prefix) and isinstance(v, dict)
               and v.get("params")}

    base, sp, _ = bench.measure(mode, **kw)
    print(f"all-default baseline: {base:.1f} tok/s (spread {sp:.1%})")

    verdicts = {}
    for key, entry in sorted(entries.items()):
        # dqmm_{bits}b_g{gs}_{m}x{k}x{n}[_mX]
        parts = key[len(_cache_key("")):].split("_")
        bits = int(parts[1][:-1])
        m, k, n = (int(x) for x in parts[3].split("x"))
        p = entry["params"]
        dq.set_dqmm_blocks(k, n, bits, p["block_n"], p["block_k"])
        t, sp2, _ = bench.measure(mode, **kw)
        dq._DQMM_BLOCKS.pop((k, n, bits), None)
        margin = max(sp, sp2) * base
        win = t - base > margin
        verdicts[key] = win
        print(f"{key.split('::')[-1]} ({p['block_n']},{p['block_k']}): "
              f"{t:.1f} tok/s ({t - base:+.1f}, margin {margin:.1f}) -> "
              f"{'KEEP' if win else 'REJECT'}")

    if args.apply:
        for key, win in verdicts.items():
            if win:
                cache[key]["inmodel"] = f"validated vs {base:.0f} base"
            else:
                del cache[key]
        _save_cache(cache)
        print("cache rewritten:", sum(verdicts.values()), "kept,",
              len(verdicts) - sum(verdicts.values()), "removed")


if __name__ == "__main__":
    main()
