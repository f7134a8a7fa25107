"""Microbenchmark the dequant-matmul kernels (slope methodology).

Usage: python scripts/bench_kernels.py [int8|int4|int4a8|all]

Reports effective weight-stream bandwidth GB/s for the 7B decode shapes
(BASELINE.md: per-chip dequant-matmul >= 90% of roofline). Uses
utils/timing.device_time — two-point slope over on-device fori_loops, so
tunnel dispatch cost cancels (see utils/timing.py hazards 1-5)."""

import sys

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an explicit
# platform request (DPT_PLATFORM=cpu) via the config knob it does respect
import os as _os
if _os.environ.get("DPT_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["DPT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul
from deeppowers_tpu.quant.quantize import quantize
from deeppowers_tpu.utils.timing import device_time


def bench(bits: int, m: int, k: int, n: int, group: int, act_bits: int = 0,
          iters: int = 200, mode: str = None, block_k: int = 1024) -> float:
    # weights are drawn ON DEVICE: host randn + tunnel upload of a
    # VMEM-exceeding weight (1.4 GB f32 at the 8x-N sweep shape) costs
    # minutes per variant through the axon tunnel
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n),
                          dtype=jnp.float32) * 0.02
    qw = quantize(w, bits=bits, group_size=group)
    qw = jax.tree_util.tree_map(jax.block_until_ready, qw)
    del w
    if act_bits:
        import dataclasses
        qw = dataclasses.replace(qw, act_bits=act_bits)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(jnp.bfloat16)

    def step(x, i, qw):
        out = dequant_matmul(x + i.astype(jnp.bfloat16) * 0, qw,
                             int4_mode=mode, block_k=block_k)
        return out[:, :k]

    # step returns (m, n) -> feed back needs (m, k); slice works iff n >= k
    if n < k:
        def step(x, i, qw):  # noqa: F811
            out = dequant_matmul(x + i.astype(jnp.bfloat16) * 0, qw,
                                 int4_mode=mode, block_k=block_k)
            pad = jnp.zeros((m, k - n), jnp.bfloat16)
            return jnp.concatenate([out, pad], axis=1)

    # qw rides as a jit argument (consts=), NOT a closure: the tunnel ships
    # closure constants by value in the compile request and a >128 MB weight
    # overflows its body limit (HTTP 413)
    t = device_time(step, x0, iters=iters, consts=(qw,))
    w_bytes = k * n * (1 if bits == 8 else 0.5)
    gbs = w_bytes / t / 1e9
    # int4 with the default block_k is silently upgraded to bk2048 by
    # _resolve_blocks — label it as such
    bk_eff = 2048 if (bits == 4 and block_k == 1024) else block_k
    tag = f"int{bits}" + (f" g{group}" if group else " per-ch") + \
        (" W_A8" if act_bits else "") + \
        (f" {mode}" if mode else "") + f" bk{bk_eff}"
    print(f"{tag} ({m}x{k}x{n}): {t*1e6:.1f} us = {gbs:.0f} GB/s weight stream",
          flush=True)
    return gbs


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    shapes = [(32, 4096, 11008), (32, 11008, 4096), (32, 4096, 4096)]
    if which in ("int8", "all"):
        for m, k, n in shapes[:1]:
            bench(8, m, k, n, 0)
    if which in ("int4", "all"):
        for m, k, n in shapes:
            bench(4, m, k, n, 128)
    if which in ("int4a8", "all"):
        for m, k, n in shapes[:1]:
            bench(4, m, k, n, 128, act_bits=8)
    if which == "sweep":
        # decide the round-2 int4 default: mode x block_k x act_bits,
        # all in ONE process (mode is a static jit arg now).
        #
        # VMEM-RESIDENCY HAZARD (measured): at the raw 7B shape the int4
        # weight block is 22.5 MB and int8 45 MB — small enough that XLA
        # parks it in v5e VMEM (128 MiB) across fori_loop iterations, and
        # the "weight stream" reads back VMEM, not HBM (int8 measured 1389
        # GB/s, 1.7x the 819 GB/s HBM spec; an elementwise-stream probe
        # confirms real HBM tops out ~643-707 GB/s here). The real decode
        # loop streams DIFFERENT weights each layer, so nothing stays
        # resident. Scale N by 8 so every variant's weights exceed VMEM
        # and the loop genuinely streams from HBM.
        m, k, n = 32, 4096, 11008 * 8
        bench(8, m, k, n, 0, iters=100)                        # reference
        bench(4, m, k, n, 0, block_k=2048, iters=100)          # per-ch best
        for bk in (1024, 2048):
            for mode in ("grouped", "scale"):
                bench(4, m, k, n, 128, mode=mode, block_k=bk, iters=100)
            bench(4, m, k, n, 128, act_bits=8, mode="grouped", block_k=bk,
                  iters=100)
        # the transposed 7B shape (ragged K) for the winner candidates
        m, k, n = 32, 11008, 4096 * 8
        for mode in ("grouped", "scale"):
            bench(4, m, k, n, 128, mode=mode, block_k=2048, iters=100)
        bench(4, m, k, n, 128, act_bits=8, block_k=2048, mode="grouped",
              iters=100)


if __name__ == "__main__":
    main()
