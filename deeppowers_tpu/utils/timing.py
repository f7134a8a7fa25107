"""Honest device timing on remote-tunneled TPU runtimes.

Hazards this utility neutralizes (all observed on the axon-tunneled v5e):
  1. ~5-30ms fixed cost per jit invocation -> amortize with an on-device
     lax.fori_loop over the op AND difference two iteration counts (the
     slope removes the fixed cost entirely; a single loop at N iters still
     over-reports by fixed/N — this inflated early kernel-bandwidth numbers
     here by 2-4x).
  2. The runtime caches identical (executable, args) executions -> every
     timed run must use distinct inputs.
  3. jax.block_until_ready can return before remote execution completes ->
     fence on a host fetch of a value that data-depends on the computation.
  4. The first 1-2 executions after compile carry an extra ~25ms upload
     penalty -> warm up twice with distinct inputs, report min over reps.
  5. XLA optimizes across the measurement harness: a loop-invariant body is
     HOISTED out of fori_loop (one execution measured as N), and consuming
     only one output element lets DCE shrink the op itself (a (M,K)x(K,N)
     dot collapses to one dot-product row). The loop must carry a data
     dependency through the op's FULL output (sum -> fed back into x).
     Pallas kernels are opaque to XLA so 5 can't bite them, but XLA-path
     baselines measured without this were pure fantasy (0.4us for a 90
     MFLOP dot).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _loop_time(
    step: Callable,
    x0: jnp.ndarray,
    iters: int,
    reps: int,
    warmup: int,
    consts: tuple = (),
) -> float:
    """Wall seconds for `iters` chained on-device executions of step.

    consts: large operands (weights) threaded through as jit ARGUMENTS.
    Closing over them instead works functionally but ships them by value in
    the remote-compile payload on tunneled runtimes — a VMEM-exceeding
    weight tensor blows the tunnel's request-size limit (HTTP 413).
    step is called as step(x, i, *consts) when consts are given.
    """

    @jax.jit
    def run(x, salt, *cs):
        def body(i, x):
            out = step(x, i, *cs)
            # full-output reduction folded back into the carry: defeats both
            # loop-invariant code motion and dead-code elimination (hazard 5)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(jnp.asarray(leaf, dtype=jnp.float32))
            return x + (s * 1e-24).astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x + salt * 1e-6)

    # warmups with distinct salts (hazards 2 & 4)
    for w in range(max(warmup, 1)):
        float(run(x0, jnp.float32(w + 1), *consts).ravel()[0])  # fence (3)
    best = float("inf")
    for r in range(reps):
        salt = jnp.float32(100 + r)
        t0 = time.perf_counter()
        float(run(x0, jnp.float32(salt), *consts).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def device_time(
    step: Callable,
    x0: jnp.ndarray,
    *,
    iters: int = 400,
    reps: int = 4,
    warmup: int = 2,
    consts: tuple = (),
) -> float:
    """Seconds per call of `step(x, i) -> pytree` via the two-point slope
    (T(iters) - T(iters/4)) / (3/4 * iters) — fixed dispatch cost cancels
    (hazard 1). step's full output is consumed and fed back into the carry
    so XLA cannot hoist or shrink it (hazard 5). Pass large operands via
    consts (step then receives them as trailing args) — see _loop_time."""
    lo = max(iters // 4, 1)
    t_lo = _loop_time(step, x0, lo, reps, warmup, consts=consts)
    t_hi = _loop_time(step, x0, iters, reps, warmup, consts=consts)
    if iters == lo:
        return t_hi / iters
    return max(t_hi - t_lo, 1e-12) / (iters - lo)


def fetch_fence(tree) -> None:
    """Force completion of a pytree's computation via host fetches of one
    element per leaf (block_until_ready substitute; hazard 3)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(jax.device_get(jax.numpy.ravel(leaf)[:1]))
