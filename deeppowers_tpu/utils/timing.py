"""Honest device timing on remote-tunneled TPU runtimes.

Hazards this utility neutralizes (all observed on the axon-tunneled v5e):
  1. ~30ms fixed cost per jit invocation -> amortize with an on-device
     lax.fori_loop over the op.
  2. The runtime caches identical (executable, args) executions -> every
     timed run must use distinct inputs.
  3. jax.block_until_ready can return before remote execution completes ->
     fence on a host fetch of a value that data-depends on the computation.
  4. The first 1-2 executions after compile carry an extra ~25ms upload
     penalty -> warm up twice with distinct inputs, report min over reps.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def device_time(
    step: Callable,
    x0: jnp.ndarray,
    *,
    iters: int = 100,
    reps: int = 4,
    warmup: int = 2,
) -> float:
    """Seconds per call of `step(x, i) -> array-like` amortized over an
    on-device loop. step must return something reducible to a scalar that
    depends on its computation; its result is folded into a carried f32.
    """

    @jax.jit
    def run(x, salt):
        def body(i, acc):
            out = step(x + salt * 1e-6, i)
            return acc + jnp.sum(jnp.asarray(out, dtype=jnp.float32).ravel()[:1])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    # warmups with distinct salts (hazards 2 & 4)
    for w in range(max(warmup, 1)):
        float(run(x0, jnp.float32(w + 1)))
    best = float("inf")
    for r in range(reps):
        salt = jnp.float32(100 + r)
        t0 = time.perf_counter()
        float(run(x0, salt))                   # fetch fences (hazard 3)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def fetch_fence(tree) -> None:
    """Force completion of a pytree's computation via host fetches of one
    element per leaf (block_until_ready substitute; hazard 3)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(jax.device_get(jax.numpy.ravel(leaf)[:1]))
