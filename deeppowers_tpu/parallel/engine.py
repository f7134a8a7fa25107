"""shard_map step builders: the multi-device execution path.

Wraps the engine's step cores (runtime/engine.py _prefill_core/_decode_core)
in shard_map over a (data, model, expert) mesh. One compiled program per step;
XLA lowers the psum/all_gather collectives onto ICI and overlaps them with
compute. This replaces the reference's DistributedExecutor worker threads +
explicit NCCL send/recv (reference: src/core/distributed/
distributed_executor.cpp:195-315).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..models.transformer import TransformerConfig
from ..runtime.engine import (DecodeState, _decode_multi_core, _prefill_core,
                              _prefill_cp_core)
from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS
from .sharding import (
    local_config,
    param_spec_tree,
    state_pspec,
)

try:  # JAX >= 0.5 public API
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _cache_spec_tree(caches) -> Any:
    from .sharding import cache_spec_tree
    return cache_spec_tree(caches)


def build_decode_step(mesh: Mesh, cfg: TransformerConfig, params, caches,
                      state: DecodeState, dtype, window=None,
                      num_steps: int = 1, top_k_out: int = 0,
                      guide_tables=None) -> Callable:
    """jit(shard_map(decode_multi_core)) with donated caches/state.

    guide_tables: optional stacked structured-output (allow, next) tables —
    replicated across the mesh (read-only (R, V) lookups; the per-slot DFA
    row lives in the data-sharded decode state)."""
    lcfg = local_config(cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    cspecs = _cache_spec_tree(caches)
    sspecs = state_pspec(state)

    def core(p, c, s, *g):
        return _decode_multi_core(
            p, lcfg, c, s, dtype,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
            data_axis=DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None,
            window=window, num_steps=num_steps, top_k_out=top_k_out,
            guide_tables=g if g else None,
        )

    in_specs = (pspecs, cspecs, sspecs)
    if guide_tables is not None:
        in_specs = in_specs + (P(), P())
    out_specs = (cspecs, sspecs, P(None, DATA_AXIS), P(None, DATA_AXIS))
    if top_k_out:
        out_specs = out_specs + (
            (P(None, DATA_AXIS, None), P(None, DATA_AXIS, None)),)
    mapped = shard_map(
        core, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    fn = jax.jit(mapped, donate_argnums=(1, 2))
    if guide_tables is None:
        return fn
    ga, gn = guide_tables
    return lambda p, c, s: fn(p, c, s, ga, gn)


def build_prefill_step(mesh: Mesh, cfg: TransformerConfig, params, caches,
                       dtype) -> Callable:
    """jit(shard_map(prefill_core)); one (padded) request into a global slot."""
    lcfg = local_config(cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    cspecs = _cache_spec_tree(caches)

    def core(p, c, input_ids, length, slot):
        return _prefill_core(
            p, lcfg, c, input_ids, length, slot, dtype,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
            data_axis=DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None,
        )

    mapped = shard_map(
        core, mesh=mesh,
        in_specs=(pspecs, cspecs, P(), P(), P()),
        out_specs=(cspecs, P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def build_prefill_chunk_step(mesh: Mesh, cfg: TransformerConfig, params,
                             caches, dtype, window=None) -> Callable:
    """jit(shard_map(chunked-prefill step)) — one chunk of one request under
    the mesh (Sarathi-style interleaving for long prompts on sharded
    serving; VERDICT round 1 item 2). The owning data shard writes its
    cache row/pages and contributes the chunk logits."""
    from ..runtime.engine import _prefill_chunk_core
    lcfg = local_config(cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    cspecs = _cache_spec_tree(caches)

    def core(p, c, input_ids, slot, start):
        return _prefill_chunk_core(
            p, lcfg, c, input_ids, slot, start, dtype, window=window,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
            data_axis=DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None,
        )

    mapped = shard_map(
        core, mesh=mesh,
        in_specs=(pspecs, cspecs, P(), P(), P()),
        out_specs=(cspecs, P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def build_spec_step(mesh: Mesh, cfg: TransformerConfig, params, caches,
                    state: DecodeState, history, dtype, *, k_draft: int,
                    ngram: int, window=None, num_steps: int = 1,
                    top_k_out: int = 0, guide_tables=None) -> Callable:
    """jit(shard_map(speculative multi-step)) — prompt-lookup speculation
    over a TP/DP/EP mesh. The token-history buffer is slot-major and shards
    over the data axis with the decode state; drafting, verification and
    acceptance all run per-shard (verification logits are all-gathered over
    the model axis inside the forward, like normal decode). Structured-output
    guide tables are replicated (read-only lookups; the per-slot DFA row is
    in the data-sharded state)."""
    from ..runtime.speculative import spec_decode_multi_core
    lcfg = local_config(cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    cspecs = _cache_spec_tree(caches)
    sspecs = state_pspec(state)
    hspec = P(DATA_AXIS, None)

    def core(p, c, s, hist, *g):
        return spec_decode_multi_core(
            p, lcfg, c, s, hist, dtype, k_draft=k_draft, ngram=ngram,
            window=window, num_steps=num_steps, top_k_out=top_k_out,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
            data_axis=DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None,
            guide_tables=g if g else None,
        )

    in_specs = (pspecs, cspecs, sspecs, hspec)
    if guide_tables is not None:
        in_specs = in_specs + (P(), P())
    out_specs = (cspecs, sspecs, hspec, P(None, DATA_AXIS, None),
                 P(None, DATA_AXIS, None))
    if top_k_out:
        out_specs = out_specs + (
            (P(None, DATA_AXIS, None, None), P(None, DATA_AXIS, None, None)),)
    mapped = shard_map(
        core, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    fn = jax.jit(mapped, donate_argnums=(1, 2, 3))
    if guide_tables is None:
        return fn
    ga, gn = guide_tables
    return lambda p, c, s, h: fn(p, c, s, h, ga, gn)


def build_spec_draft_step(mesh: Mesh, cfg: TransformerConfig,
                          draft_cfg: TransformerConfig, params, draft_params,
                          caches, draft_caches, state: DecodeState, dtype, *,
                          k_draft: int, window=None, num_steps: int = 1,
                          top_k_out: int = 0, guide_tables=None) -> Callable:
    """jit(shard_map(draft-model speculative multi-step)) over the mesh —
    the draft model shards with the same layout rules as the target."""
    from ..runtime.speculative import spec_decode_draft_multi_core
    lcfg = local_config(cfg, mesh)
    ldcfg = local_config(draft_cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    dpspecs = param_spec_tree(draft_cfg, draft_params, tp)
    cspecs = _cache_spec_tree(caches)
    dcspecs = _cache_spec_tree(draft_caches)
    sspecs = state_pspec(state)

    def core(p, dp, c, dc, s, *g):
        return spec_decode_draft_multi_core(
            p, dp, lcfg, ldcfg, c, dc, s, dtype, k_draft=k_draft,
            window=window, num_steps=num_steps, top_k_out=top_k_out,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
            data_axis=DATA_AXIS if mesh.shape[DATA_AXIS] > 1 else None,
            guide_tables=g if g else None,
        )

    in_specs = (pspecs, dpspecs, cspecs, dcspecs, sspecs)
    if guide_tables is not None:
        in_specs = in_specs + (P(), P())
    out_specs = (cspecs, dcspecs, sspecs, P(None, DATA_AXIS, None),
                 P(None, DATA_AXIS, None))
    if top_k_out:
        out_specs = out_specs + (
            (P(None, DATA_AXIS, None, None), P(None, DATA_AXIS, None, None)),)
    mapped = shard_map(
        core, mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    fn = jax.jit(mapped, donate_argnums=(2, 3, 4))
    if guide_tables is None:
        return fn
    ga, gn = guide_tables
    return lambda p, dp, c, dc, s: fn(p, dp, c, dc, s, ga, gn)


def build_prefill_cp_step(mesh: Mesh, cfg: TransformerConfig, params, caches,
                          dtype) -> Callable:
    """jit(shard_map(context-parallel prefill)): the prompt's sequence is
    sharded over the DATA axis and attention runs as a ppermute ring
    (ops/ring_attention.py) — prefill compute and activation memory split
    across the ring. Composes with TP on the model axis."""
    lcfg = local_config(cfg, mesh)
    tp = mesh.shape[MODEL_AXIS]
    pspecs = param_spec_tree(cfg, params, tp)
    cspecs = _cache_spec_tree(caches)

    def core(p, c, input_ids, length, slot):
        return _prefill_cp_core(
            p, lcfg, c, input_ids, length, slot, dtype,
            seq_axis=DATA_AXIS,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            ep_axis=EXPERT_AXIS if mesh.shape[EXPERT_AXIS] > 1 else None,
        )

    mapped = shard_map(
        core, mesh=mesh,
        in_specs=(pspecs, cspecs, P(DATA_AXIS), P(), P()),
        out_specs=(cspecs, P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))
