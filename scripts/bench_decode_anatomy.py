"""Attribute the decode step's time: layers vs lm_head vs sampling/state.

VERDICT r2 item 4: the 1.1B int8 headline runs ~575 GB/s effective vs the
~690 GB/s kernel rate — attribute the gap with on-chip ablations (the
jax.profiler path is unreliable through the remote tunnel, so each
component is timed as its own compiled fori_loop at the bench's exact
shapes).

Usage: python scripts/bench_decode_anatomy.py [--steps 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") and x.size < 1e6
        else None, out if isinstance(out, tuple) else (out,))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # fence on a small data-dependent fetch
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf if leaf.size < 4096 else leaf.ravel()[:16])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--config", default="tinyllama-1.1b")
    ap.add_argument("--quant", default="int8", choices=["int8", "int4"])
    ap.add_argument("--group-size", type=int, default=0)
    ap.add_argument("--act-bits", type=int, default=0)
    ap.add_argument("--kv", default="bf16")
    ap.add_argument("--max-seq", type=int, default=1024)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import importlib
    bench = importlib.import_module("bench")

    from deeppowers_tpu.config import QuantMode
    from deeppowers_tpu.models.transformer import forward_decode
    from deeppowers_tpu.ops.sampling import SamplingParams, sample
    from deeppowers_tpu.runtime.engine import _decode_core

    steps, B = args.steps, args.batch
    qm = QuantMode.INT8 if args.quant == "int8" else QuantMode.INT4
    cfg, params, caches, state = bench.build(
        qm, B, args.max_seq, cfg_name=args.config,
        group_size=args.group_size, kv_cache_dtype=args.kv,
        direct_quant=(args.config != "tinyllama-1.1b"),
        act_bits=args.act_bits)
    V = cfg.vocab_size

    # A: full decode step (the headline path)
    @jax.jit
    def full(params, caches, state):
        def body(_, carry):
            caches, state = carry
            caches, state, _ = _decode_core(params, cfg, caches, state,
                                            jnp.bfloat16)
            return (caches, state)
        return jax.lax.fori_loop(0, steps, body, (caches, state))

    t_full = timeit(lambda: full(params, caches, state)) / steps

    # B: forward only (layers + lm_head + cache append), no sampling/state
    @jax.jit
    def fwd_only(params, caches, state):
        def body(i, carry):
            caches, tok = carry
            logits, caches = forward_decode(params, cfg, tok, caches,
                                            state.lengths + i,
                                            dtype=jnp.bfloat16)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (caches, tok)
        return jax.lax.fori_loop(0, steps, body, (caches, state.tokens))

    t_fwd = timeit(lambda: fwd_only(params, caches, state)) / steps

    # C: lm_head alone (the fixed (B, H) x (H, V) projection)
    from deeppowers_tpu.models.transformer import _logits as lm_head
    x = jnp.ones((B, 1, cfg.hidden_size), jnp.bfloat16)

    @jax.jit
    def head_only(params, x):
        def body(i, acc):
            out = lm_head(params, cfg, x + acc[0, 0, 0].astype(x.dtype) * 0,
                          None)
            return acc + out[:, :1, :1] * 1e-9
        return jax.lax.fori_loop(0, steps, body,
                                 jnp.zeros((B, 1, 1), jnp.float32))

    t_head = timeit(lambda: head_only(params, x)) / steps

    # D: sampling/state tail alone (greedy chain on fixed logits)
    logits0 = jnp.ones((B, V), jnp.float32)
    sp = state.sampling

    @jax.jit
    def tail_only(logits0, state):
        def body(i, carry):
            state, acc = carry
            lg = logits0 + acc[:, None] * 0
            tok = sample(lg, sp, jax.random.fold_in(state.rng, i),
                         generated_counts=state.generated)
            state = state._replace(
                lengths=state.lengths + 1, generated=state.generated + 1,
                tokens=tok)
            return (state, acc + tok.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(
            0, steps, body, (state, jnp.zeros((B,), jnp.float32)))

    t_tail = timeit(lambda: tail_only(logits0, state)) / steps

    w_bytes = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "nbytes"):
            w_bytes += leaf.nbytes
    print(f"config: {args.config} {args.quant} g{args.group_size} a{args.act_bits} kv={args.kv}, bs={B}, {steps}-step loops")
    print(f"full step        : {t_full * 1e3:7.3f} ms "
          f"({B / t_full:6.0f} tok/s, {w_bytes / t_full / 1e9:5.0f} GB/s eff)")
    print(f"forward only     : {t_fwd * 1e3:7.3f} ms "
          f"({w_bytes / t_fwd / 1e9:5.0f} GB/s eff)")
    print(f"lm_head only     : {t_head * 1e3:7.3f} ms")
    print(f"sampling/state   : {t_tail * 1e3:7.3f} ms")
    print(f"residual (full - fwd) = {(t_full - t_fwd) * 1e3:.3f} ms; "
          f"layers+cache ~= {(t_fwd - t_head) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
