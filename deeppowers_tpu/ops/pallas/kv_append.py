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


def _kernel(pos_ref, *refs, n_vals: int, n_scales: int, seq_len: int,
            lane_grp: int):
    """Grid (B,). refs = old blocks, new rows, out blocks. Values RMW an
    8-row tile group of the flat (B, S, F) cache; head-major (B, K, S)
    scales RMW a 128-lane column group with a lane mask."""
    b = pl.program_id(0)
    n = n_vals + n_scales
    old = refs[:n]
    new = refs[n:2 * n]
    out = refs[2 * n:]
    pos = pos_ref[b]
    valid = (pos >= 0) & (pos < seq_len)
    sub = pos % 8
    for i in range(n_vals):
        grp = old[i][0]                                       # (8, F)
        row = new[i][0, 0].astype(out[i].dtype)               # (1, F)
        sel = (jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == sub)
        out[i][0] = jnp.where(sel & valid, row, grp)
    off = pos % lane_grp
    for i in range(n_vals, n):
        pg = old[i][0]                                        # (K, lane_grp)
        r = new[i][0].astype(out[i].dtype)                    # (1, K)
        sel = (jax.lax.broadcasted_iota(jnp.int32, pg.shape, 1) == off)
        out[i][0] = jnp.where(sel & valid, r.T, pg)


def _scatter_one(vals, val_rows, scales, scale_rows, positions):
    """vals[i]: (B, S, F), rows (B, 1, F); scales[i]: (B, K, S) head-major,
    rows (B, 1, K); positions: (B,). One token per slot."""
    b, s = vals[0].shape[0], vals[0].shape[1]
    lane_grp = min(128, s)
    n = len(vals) + len(scales)

    def grp_idx(bb, pos):
        return (bb, jnp.clip(pos[bb], 0, s - 1) // 8, 0)

    def col_idx(bb, pos):
        return (bb, 0, jnp.clip(pos[bb], 0, s - 1) // lane_grp)

    def row_idx(bb, pos):
        return (bb, 0, 0)

    in_specs = (
        [pl.BlockSpec((1, 8, a.shape[2]), grp_idx) for a in vals]
        + [pl.BlockSpec((1, sc.shape[1], lane_grp), col_idx)
           for sc in scales]
        + [pl.BlockSpec((1, 1, r.shape[2]), row_idx)
           for r in list(val_rows) + list(scale_rows)])
    out_specs = ([pl.BlockSpec((1, 8, a.shape[2]), grp_idx) for a in vals]
                 + [pl.BlockSpec((1, sc.shape[1], lane_grp), col_idx)
                    for sc in scales])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    # alias each cache input (after the scalar-prefetch operand) to its output
    aliases = {1 + i: i for i in range(n)}
    arrays = list(vals) + list(scales)
    return pl.pallas_call(
        functools.partial(_kernel, n_vals=len(vals), n_scales=len(scales),
                          seq_len=s, lane_grp=lane_grp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(positions.astype(jnp.int32), *arrays, *val_rows, *scale_rows)


def scatter_rows(
    vals: Sequence[jnp.ndarray],          # each (B, S, F_i), S % 8 == 0
    val_rows: Sequence[jnp.ndarray],      # each (B, [T,] F_i) new rows
    positions: jnp.ndarray,               # (B,) or (B, T) int32
    scales: Sequence[jnp.ndarray] = (),   # each (B, K, S) head-major
    scale_rows: Sequence[jnp.ndarray] = (),   # each (B, [T,] K)
) -> tuple:
    """Write val_rows[i][b, t] into vals[i][b, positions[b, t]] and
    scale_rows[i][b, t] into scales[i][b, :, positions[b, t]], in place.

    Values are flat (B, S, F) with S a multiple of 8 (the tile group);
    scales are head-major (B, K, S). Returns the updated arrays (aliased
    in place, not copied), values first. Multi-token writes run one kernel
    per t: consecutive positions share tile groups, and sequential launches
    are what keeps read-modify-write of a shared group race-free."""
    if positions.ndim == 1:
        positions = positions[:, None]
        val_rows = [r[:, None] for r in val_rows]
        scale_rows = [r[:, None] for r in scale_rows]
    val_rows = [r.astype(a.dtype) for r, a in zip(val_rows, vals)]
    scale_rows = [r.astype(a.dtype) for r, a in zip(scale_rows, scales)]
    out_v, out_s = tuple(vals), tuple(scales)
    for t in range(positions.shape[1]):
        outs = _scatter_one(out_v, [r[:, t:t + 1] for r in val_rows],
                            out_s, [r[:, t:t + 1] for r in scale_rows],
                            positions[:, t])
        out_v, out_s = outs[:len(vals)], outs[len(vals):]
    return out_v + out_s


def _kernel_pool(row_ref, val_ref, *refs, n_vals: int, n_scales: int,
                 page: int):
    """Grid (B,). Row scatter into pools: values via the flat (P*page, F)
    view (8-row tile-group RMW), scales via whole-(Kh, page) page RMW with a
    lane mask (scale pools are head-major so page slices stay lane-aligned).
    row_ref holds absolute row indices, val_ref 0/1 validity. Invalid writes
    put the old content back — content-preserving, so redirected slots
    racing on the scratch page's tile groups are benign."""
    b = pl.program_id(0)
    n = n_vals + n_scales
    old = refs[:n]
    new = refs[n:2 * n]
    out = refs[2 * n:]
    row = row_ref[b]
    valid = val_ref[b] != 0
    sub = row % 8
    off = row % page
    for i in range(n_vals):
        grp = old[i][:]                                       # (8, F)
        r = new[i][0].astype(out[i].dtype)                    # (1, F)
        sel = (jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == sub)
        out[i][:] = jnp.where(sel & valid, r, grp)
    for i in range(n_vals, n):
        pg = old[i][0]                                        # (Kh, page)
        r = new[i][0].astype(out[i].dtype)                    # (1, Kh)
        sel = (jax.lax.broadcasted_iota(jnp.int32, pg.shape, 1) == off)
        out[i][0] = jnp.where(sel & valid, r.T, pg)


def _scatter_pool_one(vals, val_rows, scales, scale_rows, row_idx, valid):
    """vals[i]: (P, ps, F), rows (B, 1, F); scales[i]: (P, Kh, ps), rows
    (B, 1, Kh); row_idx/valid: (B,)."""
    ps = vals[0].shape[1]
    flats = [a.reshape(a.shape[0] * a.shape[1], a.shape[2]) for a in vals]
    n = len(vals) + len(scales)

    def grp_idx(bb, rowp, valp):
        return (rowp[bb] // 8, 0)

    def page_idx(bb, rowp, valp):
        return (rowp[bb] // ps, 0, 0)

    def row_spec_idx(bb, rowp, valp):
        return (bb, 0, 0)

    in_specs = ([pl.BlockSpec((8, fl.shape[1]), grp_idx) for fl in flats]
                + [pl.BlockSpec((1,) + sc.shape[1:], page_idx)
                   for sc in scales]
                + [pl.BlockSpec((1, 1, r.shape[2]), row_spec_idx)
                   for r in list(val_rows) + list(scale_rows)])
    out_specs = ([pl.BlockSpec((8, fl.shape[1]), grp_idx) for fl in flats]
                 + [pl.BlockSpec((1,) + sc.shape[1:], page_idx)
                    for sc in scales])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(row_idx.shape[0],),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    aliases = {2 + i: i for i in range(n)}
    outs = pl.pallas_call(
        functools.partial(_kernel_pool, n_vals=len(vals),
                          n_scales=len(scales), page=ps),
        grid_spec=grid_spec,
        out_shape=([jax.ShapeDtypeStruct(fl.shape, fl.dtype)
                    for fl in flats]
                   + [jax.ShapeDtypeStruct(sc.shape, sc.dtype)
                      for sc in scales]),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row_idx.astype(jnp.int32), valid.astype(jnp.int32), *flats, *scales,
      *val_rows, *scale_rows)
    return (tuple(o.reshape(a.shape) for o, a in zip(outs, vals))
            + tuple(outs[len(vals):]))


def scatter_pool_rows(
    vals: Sequence[jnp.ndarray],          # each (P, ps, F_i), ps % 8 == 0
    val_rows: Sequence[jnp.ndarray],      # each (B, [T,] F_i)
    scales: Sequence[jnp.ndarray],        # each (P, Kh, ps) head-major
    scale_rows: Sequence[jnp.ndarray],    # each (B, [T,] Kh)
    row_idx: jnp.ndarray,                 # (B,) or (B, T) absolute rows
    valid: jnp.ndarray,                   # (B,) or (B, T) bool
) -> tuple:
    """scatter_rows for the paged pool layout: write val_rows[i][b, t] into
    flat row `row_idx[b, t]` of the (P*ps, F) pool view and
    scale_rows[i][b, t] into column row_idx%ps of page row_idx//ps, in
    place. Invalid entries rewrite the old content (drop semantics)."""
    if row_idx.ndim == 1:
        row_idx, valid = row_idx[:, None], valid[:, None]
        val_rows = [r[:, None] for r in val_rows]
        scale_rows = [r[:, None] for r in scale_rows]
    val_rows = [r.astype(a.dtype) for r, a in zip(val_rows, vals)]
    scale_rows = [r.astype(a.dtype) for r, a in zip(scale_rows, scales)]
    out_v, out_s = tuple(vals), tuple(scales)
    for t in range(row_idx.shape[1]):
        outs = _scatter_pool_one(out_v, [r[:, t:t + 1] for r in val_rows],
                                 out_s, [r[:, t:t + 1] for r in scale_rows],
                                 row_idx[:, t], valid[:, t])
        out_v, out_s = outs[:len(vals)], outs[len(vals):]
    return out_v + out_s


def _kernel_stacked(sc_ref, *refs, n_vals: int, n_scales: int,
                    seq_len: int, lane_grp: int):
    """Grid (B,). sc = [layer, pos_0..pos_{B-1}]. Same bodies as _kernel,
    with an extra leading layer dim on every cache block."""
    b = pl.program_id(0)
    n = n_vals + n_scales
    old = refs[:n]
    new = refs[n:2 * n]
    out = refs[2 * n:]
    pos = sc_ref[1 + b]
    valid = (pos >= 0) & (pos < seq_len)
    sub = pos % 8
    for i in range(n_vals):
        grp = old[i][0, 0]                                    # (8, F)
        row = new[i][0, 0].astype(out[i].dtype)               # (1, F)
        sel = (jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0) == sub)
        out[i][0, 0] = jnp.where(sel & valid, row, grp)
    off = pos % lane_grp
    for i in range(n_vals, n):
        pg = old[i][0, 0]                                     # (K, lane_grp)
        r = new[i][0].astype(out[i].dtype)                    # (1, K)
        sel = (jax.lax.broadcasted_iota(jnp.int32, pg.shape, 1) == off)
        out[i][0, 0] = jnp.where(sel & valid, r.T, pg)


def _scatter_one_stacked(vals, val_rows, scales, scale_rows, layer,
                         positions):
    """vals[i]: (L, B, S, F); scales[i]: (L, B, K, S) head-major; rows
    (B, 1, F)/(B, 1, K); layer scalar."""
    b, s = vals[0].shape[1], vals[0].shape[2]
    lane_grp = min(128, s)
    n = len(vals) + len(scales)
    sc = jnp.concatenate([layer.reshape(1).astype(jnp.int32),
                          positions.astype(jnp.int32)])

    def grp_idx(bb, sc):
        return (sc[0], bb, jnp.clip(sc[1 + bb], 0, s - 1) // 8, 0)

    def col_idx(bb, sc):
        return (sc[0], bb, 0, jnp.clip(sc[1 + bb], 0, s - 1) // lane_grp)

    def row_idx(bb, sc):
        return (bb, 0, 0)

    in_specs = (
        [pl.BlockSpec((1, 1, 8, a.shape[3]), grp_idx) for a in vals]
        + [pl.BlockSpec((1, 1, a.shape[2], lane_grp), col_idx)
           for a in scales]
        + [pl.BlockSpec((1, 1, r.shape[2]), row_idx)
           for r in list(val_rows) + list(scale_rows)])
    out_specs = ([pl.BlockSpec((1, 1, 8, a.shape[3]), grp_idx)
                  for a in vals]
                 + [pl.BlockSpec((1, 1, a.shape[2], lane_grp), col_idx)
                    for a in scales])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    aliases = {1 + i: i for i in range(n)}
    arrays = list(vals) + list(scales)
    return pl.pallas_call(
        functools.partial(_kernel_stacked, n_vals=len(vals),
                          n_scales=len(scales), seq_len=s,
                          lane_grp=lane_grp),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(sc, *arrays, *val_rows, *scale_rows)


def scatter_rows_stacked(
    vals: Sequence[jnp.ndarray],          # each (L, B, S, F_i), S % 8 == 0
    val_rows: Sequence[jnp.ndarray],      # each (B, [T,] F_i)
    layer: jnp.ndarray,                   # scalar int32 (traced)
    positions: jnp.ndarray,               # (B,) or (B, T) int32
    scales: Sequence[jnp.ndarray] = (),   # each (L, B, K, S) head-major
    scale_rows: Sequence[jnp.ndarray] = (),   # each (B, [T,] K)
) -> tuple:
    """scatter_rows for the stacked all-layers cache: write rows into
    [layer, b, positions[b, t]] in place — `layer` is a traced scalar (the
    lax.scan induction index). Returns values then scales."""
    if positions.ndim == 1:
        positions = positions[:, None]
        val_rows = [r[:, None] for r in val_rows]
        scale_rows = [r[:, None] for r in scale_rows]
    val_rows = [r.astype(a.dtype) for r, a in zip(val_rows, vals)]
    scale_rows = [r.astype(a.dtype) for r, a in zip(scale_rows, scales)]
    out_v, out_s = tuple(vals), tuple(scales)
    for t in range(positions.shape[1]):
        outs = _scatter_one_stacked(
            out_v, [r[:, t:t + 1] for r in val_rows],
            out_s, [r[:, t:t + 1] for r in scale_rows],
            jnp.asarray(layer), positions[:, t])
        out_v, out_s = outs[:len(vals)], outs[len(vals):]
    return out_v + out_s
