"""Honest per-shape dequant-matmul block tuning at MODEL conditions.

The >VMEM sweep in bench_kernels.py widens N by 8x to defeat VMEM
residency — but that changes the kernel's grid/pipeline structure (a real
down-proj has N=4096 => 2-4 N-blocks; the widened shape has 16-32), so its
winner can LOSE in the model (measured round 4: whole-plane bk on the 7B
w_out was +46% in the widened sweep and -2.6% end-to-end). This tuner keeps
the REAL (M, K, N) and defeats residency the way the model does: L DISTINCT
stacked weights scanned per timed iteration (the decode loop streams 32
different layers' weights), with the matmul's in-model fusion flavor
(rms / glu+residual / plain).

Winners are persisted into the standard autotune cache
(~/.deeppowers_tpu/autotune.json), which bench.py / engine startup installs
via runtime.autotuner.install_cached().

Usage:
  python scripts/bench_blocks_model.py llama2-7b --bits 4 --group 128 --a8
  python scripts/bench_blocks_model.py tinyllama-1.1b --bits 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DPT_PLATFORM"):   # axon ignores JAX_PLATFORMS; honor ours
    jax.config.update("jax_platforms", os.environ["DPT_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return -(-x // m) * m


def honest_time(k, n, bits, group, act_bits, bn, bk, *, m=8, flavor="plain",
                stream_mb=512, iters=30):
    """Seconds per full L-weight sweep; L sized so the streamed bytes
    exceed VMEM several times over."""
    from deeppowers_tpu.ops.pallas.dequant_matmul import (dequant_matmul,
                                                          dequant_matmul_fused)
    from deeppowers_tpu.quant.qtypes import QuantizedTensor
    from deeppowers_tpu.utils.timing import device_time

    rows = k // 2 if bits == 4 else k
    w_bytes = rows * n
    L = max(4, int(stream_mb * 1e6 / w_bytes))
    srows = (k // group) if group else 1
    # L SEPARATE weight arrays (an unrolled chain, like the model's layer
    # stack) — NOT a stacked (L, rows, n) array scanned over: lax.scan's xs
    # slicing materializes a full copy of each 100+ MB slice before the
    # kernel reads it (measured 203 vs 465 GB/s on the same shape), which
    # would charge the kernel for traffic it never causes.
    qws = tuple(
        QuantizedTensor(
            data=jax.random.randint(jax.random.PRNGKey(i), (rows, n),
                                    -127, 128, dtype=jnp.int8),
            scales=jnp.full((srows, n), 0.02 / (7 if bits == 4 else 127),
                            jnp.float32),
            zero_points=None, bits=bits, group_size=group,
            act_bits=act_bits)
        for i in range(L))
    xw = 2 * k if flavor == "glu" else k
    x0 = jnp.asarray(np.random.RandomState(0).randn(m, xw).astype(np.float32)
                     ).astype(jnp.bfloat16)
    g_rms = jnp.ones((k,), jnp.bfloat16)
    res0 = jnp.zeros((m, n), jnp.bfloat16)

    def one(x, qw):
        if flavor == "glu":
            return dequant_matmul_fused(x, qw, glu=True, residual=res0,
                                        block_n=bn, block_k=bk)
        if flavor == "rms":
            return dequant_matmul_fused(x, qw, rms_weight=g_rms,
                                        block_n=bn, block_k=bk)
        return dequant_matmul(x, qw, block_n=bn, block_k=bk)

    def step(x, i, qws):
        x = x + i.astype(jnp.bfloat16) * 0
        for qw in qws:
            out = one(x, qw)
            # serialize the chain (and defeat DCE) with a tiny feedback
            fb = out[:, :1].astype(jnp.bfloat16) * 1e-9
            x = x + jnp.pad(fb, ((0, 0), (0, x.shape[1] - 1)))
        return x

    t = device_time(step, x0, iters=iters, consts=(qws,))
    return t, L * w_bytes


def tune_shape(k, n, bits, group, act_bits, *, m=8, flavor="plain",
               save=True, verbose=True):
    keff = k // 2 if bits == 4 else k
    n_pad = _round_up(n, 128)
    cand = []
    for bn in (512, 1024, 2048, 4096):
        if bn > n_pad:
            continue
        bks = {1024, 2048}
        if keff % 2048 != 0 and keff % 128 == 0:
            bks.add(keff)            # whole-plane (zero pad DMA/compute)
        for bk in bks:
            if bk > keff and bk != keff:
                continue
            if min(bk, keff) * bn > 12 * 2 ** 20:
                continue             # scoped-VMEM budget (64 MiB incl temps)
            cand.append((bn, bk))
    best, best_t = None, float("inf")
    rows = []
    for bn, bk in sorted(cand):
        try:
            t, swept = honest_time(k, n, bits, group, act_bits, bn, bk,
                                   m=m, flavor=flavor)
        except Exception as e:  # noqa: BLE001 — invalid configs just skip
            if verbose:
                print(f"  bn{bn} bk{bk}: skip ({str(e)[:80]})", flush=True)
            continue
        gbs = swept / t / 1e9
        rows.append((bn, bk, gbs))
        if verbose:
            print(f"  bn{bn} bk{bk}: {gbs:6.0f} GB/s", flush=True)
        if gbs > 850:
            # above the v5e HBM spec (819 GB/s): VMEM residency leaked
            # through (XLA can still park small weight sets); a contaminated
            # reading must not pick the winner (one such pick cost the
            # 1.1B headline ~1% before this guard)
            if verbose:
                print("  ^ >HBM-spec: contaminated, excluded", flush=True)
            continue
        if t < best_t:
            best, best_t = (bn, bk), t
    if best is None:
        raise RuntimeError("no candidate ran")
    from deeppowers_tpu.ops.pallas import dequant_matmul as dqmm_mod
    from deeppowers_tpu.runtime import autotuner as at
    dqmm_mod.set_dqmm_blocks(k, n, bits, best[0], best[1])
    if save:
        cache = at._load_cache()
        name = f"dqmm_{bits}b_g{group}_{m}x{k}x{n}" + \
            ("_m2" if (bits == 4 and group) else "")
        cache[at._cache_key(name)] = {
            "params": {"block_n": best[0], "block_k": best[1]},
            "score": best_t, "honest": True}
        at._save_cache(cache)
    return best, rows


def model_shapes(cfg, include_head=True):
    """(k, n, flavor) for the engine's fused decode matmuls."""
    h = cfg.hidden_size
    shapes = [(h, cfg.q_size + 2 * cfg.kv_size, "rms"),   # fused qkv
              (cfg.q_size, h, "plain")]                   # o-proj (+resid)
    if cfg.glu:
        shapes.append((h, 2 * cfg.ffn_size, "rms"))       # fused gate|up
    else:
        shapes.append((h, cfg.ffn_size, "rms"))
    shapes.append((cfg.ffn_size, h, "glu" if cfg.glu else "plain"))
    if include_head and not cfg.tie_embeddings:
        shapes.append((h, cfg.vocab_size, "plain"))
    return shapes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--a8", action="store_true")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args()

    from deeppowers_tpu.models.presets import PRESETS
    cfg = PRESETS[args.config]
    act_bits = 8 if args.a8 else 0
    print(f"backend: {jax.default_backend()}; tuning {args.config} "
          f"int{args.bits} g{args.group} a{act_bits} m={args.m}")
    for k, n, flavor in model_shapes(cfg):
        g = args.group if (args.group and k % args.group == 0) else 0
        print(f"shape ({k}, {n}) [{flavor}]:", flush=True)
        best, _ = tune_shape(k, n, args.bits, g, act_bits, m=args.m,
                             flavor=flavor, save=not args.no_save)
        print(f"  -> best bn{best[0]} bk{best[1]}")


if __name__ == "__main__":
    main()
