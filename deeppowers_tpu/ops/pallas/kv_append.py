"""In-place KV-cache row append as a Pallas kernel (flat cache layout).

Why a kernel for a one-row-per-slot write: the jnp scatter
(`cache.at[slots, positions].set(rows)`) makes XLA's layout assignment pick
an S-minor layout for the cache while-loop carry, and every OTHER consumer
of the cache (the decode-attention kernel, whose custom call pins row-major
operands) then pays a full-cache relayout copy — measured ~950us/step on the
1.1B decode loop (2 copies x 2 tensors x 22 layers of a 4.2MB cache). This
kernel updates the touched rows in place via `input_output_aliases`, and —
because a Pallas custom call pins the default row-major layout on its
operands — anchors the cache carry to the layout every other consumer wants.
Reference analogue: the reference updates its KV cache in place with a CUDA
kernel for the same reason (src/core/execution/models/gpt_model.cpp:362-430).

Caches are FLAT: (B, S, F) values / (B, S, K) scales (runtime/kvcache.py) —
minor dims (S, F) tile (8, 128) compactly, where the earlier (B, S, K, D)
shape was stored T(4,128)-padded by XLA (2x the HBM bytes for K*D=256-class
models) and relayout-copied at every kernel boundary.

Each grid step (one per slot) reads the 8-row tile group containing the
slot's write position, replaces one row, and writes the group back — an
aligned (8, F) read-modify-write, 4KB of traffic per slot. Steps touch
different slots, so the pipelined block DMAs never overlap. Out-of-range
positions are dropped (matching the JAX scatter semantics the engine relies
on near the cache end): the select keeps all old rows.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel_dma(pos_ref, *refs, n_arrays: int, seq_len: int, nb: int):
    """Single grid step: all B row writes issued as concurrent HBM->HBM
    DMAs (rows and caches both live in ANY/HBM space; nothing round-trips
    through VMEM). refs = row inputs, cache inputs (aliased, unread),
    cache outputs, then one DMA semaphore per (array, slot) copy."""
    rows = refs[:n_arrays]
    outs = refs[2 * n_arrays:3 * n_arrays]
    sems = refs[3 * n_arrays:]
    for i in range(n_arrays):
        for b in range(nb):
            pos = pos_ref[b]

            @pl.when((pos >= 0) & (pos < seq_len))
            def _(i=i, b=b, pos=pos):
                pltpu.make_async_copy(
                    rows[i].at[b],
                    outs[i].at[b, pl.ds(pos, 1)],
                    sems[i].at[b],
                ).start()
    for i in range(n_arrays):
        for b in range(nb):
            pos = pos_ref[b]

            @pl.when((pos >= 0) & (pos < seq_len))
            def _(i=i, b=b, pos=pos):
                pltpu.make_async_copy(
                    rows[i].at[b],
                    outs[i].at[b, pl.ds(pos, 1)],
                    sems[i].at[b],
                ).wait()


def _scatter_one_dma(arrays, rows, positions):
    """rows[i]: (B, 1, F_i); positions: (B,). One token per slot, one grid
    step, 2*n_arrays*B concurrent DMA descriptors."""
    b, s = arrays[0].shape[0], arrays[0].shape[1]
    n = len(arrays)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[any_spec] * (2 * n),
        out_specs=[any_spec] * n,
        scratch_shapes=[pltpu.SemaphoreType.DMA((b,))] * n,
    )
    aliases = {1 + n + i: i for i in range(n)}
    return pl.pallas_call(
        functools.partial(_kernel_dma, n_arrays=n, seq_len=s, nb=b),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(positions.astype(jnp.int32), *rows, *arrays)


def _kernel(pos_ref, *refs, n_arrays: int, seq_len: int):
    """Grid (B,). refs = old 8-row groups, new rows, out groups."""
    b = pl.program_id(0)
    old = refs[:n_arrays]
    new = refs[n_arrays:2 * n_arrays]
    out = refs[2 * n_arrays:]
    pos = pos_ref[b]
    valid = (pos >= 0) & (pos < seq_len)
    sub = pos % 8
    for o, ni, oi in zip(out, new, old):
        grp = oi[0]                                           # (8, F)
        row = ni[0, 0].astype(o.dtype)                        # (1, F)
        sel = (jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == sub)
        o[0] = jnp.where(sel & valid, row, grp)


def _scatter_one(arrays, rows, positions):
    """rows[i]: (B, 1, F_i); positions: (B,). One token per slot."""
    b, s = arrays[0].shape[0], arrays[0].shape[1]

    def grp_idx(bb, pos):
        return (bb, jnp.clip(pos[bb], 0, s - 1) // 8, 0)

    def row_idx(bb, pos):
        return (bb, 0, 0)

    in_specs = (
        [pl.BlockSpec((1, 8, a.shape[2]), grp_idx) for a in arrays]
        + [pl.BlockSpec((1, 1, a.shape[2]), row_idx) for a in arrays])
    out_specs = [pl.BlockSpec((1, 8, a.shape[2]), grp_idx) for a in arrays]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    # alias each cache input (after the scalar-prefetch operand) to its output
    aliases = {1 + i: i for i in range(len(arrays))}
    return pl.pallas_call(
        functools.partial(_kernel, n_arrays=len(arrays), seq_len=s),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(positions.astype(jnp.int32), *arrays, *rows)


def scatter_rows(
    arrays: Sequence[jnp.ndarray],        # each (B, S, F_i), S % 8 == 0
    rows: Sequence[jnp.ndarray],          # each (B, [T,] F_i) new rows
    positions: jnp.ndarray,               # (B,) or (B, T) int32
) -> tuple:
    """Write rows[i][b, t] into arrays[i][b, positions[b, t]] in place.

    All arrays are flat (B, S, F); S must be a multiple of 8 (the tile
    group). Returns the updated arrays (aliased in place, not copied).
    Multi-token writes run one kernel per t: consecutive positions share
    8-row groups, and sequential launches are what keeps read-modify-write
    of a shared group race-free.
    """
    if positions.ndim == 1:
        positions = positions[:, None]
        rows = [r[:, None] for r in rows]
    rows = [r.astype(a.dtype) for r, a in zip(rows, arrays)]
    out = tuple(arrays)
    for t in range(positions.shape[1]):
        out = _scatter_one(out, [r[:, t:t + 1] for r in rows],
                           positions[:, t])
    return out


def _kernel_stacked(sc_ref, *refs, n_arrays: int, seq_len: int):
    """Grid (B,). sc = [layer, pos_0..pos_{B-1}]. Same body as _kernel."""
    b = pl.program_id(0)
    old = refs[:n_arrays]
    new = refs[n_arrays:2 * n_arrays]
    out = refs[2 * n_arrays:]
    pos = sc_ref[1 + b]
    valid = (pos >= 0) & (pos < seq_len)
    sub = pos % 8
    for o, ni, oi in zip(out, new, old):
        grp = oi[0, 0]                                        # (8, F)
        row = ni[0, 0].astype(o.dtype)                        # (1, F)
        sel = (jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == sub)
        o[0, 0] = jnp.where(sel & valid, row, grp)


def _scatter_one_stacked(arrays, rows, layer, positions):
    """arrays[i]: (L, B, S, F_i); rows[i]: (B, 1, F_i); layer scalar."""
    _, b, s = arrays[0].shape[0], arrays[0].shape[1], arrays[0].shape[2]
    sc = jnp.concatenate([layer.reshape(1).astype(jnp.int32),
                          positions.astype(jnp.int32)])

    def grp_idx(bb, sc):
        return (sc[0], bb, jnp.clip(sc[1 + bb], 0, s - 1) // 8, 0)

    def row_idx(bb, sc):
        return (bb, 0, 0)

    in_specs = (
        [pl.BlockSpec((1, 1, 8, a.shape[3]), grp_idx) for a in arrays]
        + [pl.BlockSpec((1, 1, r.shape[2]), row_idx) for r in rows])
    out_specs = [pl.BlockSpec((1, 1, 8, a.shape[3]), grp_idx)
                 for a in arrays]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    aliases = {1 + i: i for i in range(len(arrays))}
    return pl.pallas_call(
        functools.partial(_kernel_stacked, n_arrays=len(arrays), seq_len=s),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(sc, *arrays, *rows)


def scatter_rows_stacked(
    arrays: Sequence[jnp.ndarray],        # each (L, B, S, F_i), S % 8 == 0
    rows: Sequence[jnp.ndarray],          # each (B, [T,] F_i)
    layer: jnp.ndarray,                   # scalar int32 (traced)
    positions: jnp.ndarray,               # (B,) or (B, T) int32
) -> tuple:
    """scatter_rows for the stacked all-layers cache: write rows[i][b, t]
    into arrays[i][layer, b, positions[b, t]] in place — `layer` is a traced
    scalar (the lax.scan induction index)."""
    if positions.ndim == 1:
        positions = positions[:, None]
        rows = [r[:, None] for r in rows]
    rows = [r.astype(a.dtype) for r, a in zip(rows, arrays)]
    out = tuple(arrays)
    for t in range(positions.shape[1]):
        out = _scatter_one_stacked(out, [r[:, t:t + 1] for r in rows],
                                   jnp.asarray(layer), positions[:, t])
    return out
