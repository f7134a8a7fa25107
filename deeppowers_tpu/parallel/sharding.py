"""Parameter / cache / state sharding rules and the shard_map step builders.

This is the TPU-native answer to the reference's DistributedExecutor
(reference: src/core/distributed/distributed_executor.cpp:56-156 — micro-batch
DP splitting, pipeline send/recv buffers; compute TODOs at :278,304). Instead
of explicit send/recv between stages, every weight matrix carries a
PartitionSpec over the (data, model, expert) mesh and the whole decode step
runs inside one shard_map — XLA compiles the psums/all_gathers onto ICI and
overlaps them with compute (the `overlap_comm` the reference never built,
distributed_executor.hpp:19).

Sharding layout (Megatron-style TP for inference):
  wq/wk/wv, w_in/w_gate : columns over "model"  (head / ffn parallel)
  wo, w_out             : rows over "model"     (psum after)
  lm_head               : vocab columns over "model" (all_gather logits)
  MoE experts           : leading expert axis over "expert"
  KV cache              : kv-head axis over "model", slots over "data"
  embeddings, norms     : replicated
  decode state          : slots over "data"
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.transformer import TransformerConfig
from ..quant.qtypes import QuantizedTensor
from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# PartitionSpecs for the params pytree
# ---------------------------------------------------------------------------

def _prepend_none(spec_tree):
    """Stacked layers add a leading L axis to every leaf: P(a, b) -> P(None, a, b)."""
    if isinstance(spec_tree, dict):
        return {k: _prepend_none(v) for k, v in spec_tree.items()}
    if isinstance(spec_tree, list):
        return [_prepend_none(v) for v in spec_tree]
    return P(None, *spec_tree)


def param_specs(cfg: TransformerConfig, params: Params) -> Params:
    """PartitionSpec pytree matching `params` structure (handles both the
    unrolled layer list and scan-over-layers stacked params, where every
    layer leaf gains a leading L axis)."""
    col = P(None, MODEL_AXIS)     # column-parallel (K, N/model)
    row = P(MODEL_AXIS, None)     # row-parallel   (K/model, N)
    rep2 = P(None, None)
    rep1 = P(None)

    def norm_spec(p):
        return {k: rep1 for k in p}

    def dense_like(p, spec):
        out = {"w": spec}
        if "b" in p:
            out["b"] = P(spec[-1]) if spec[-1] else rep1
        return out

    specs: Params = {
        "embedding": rep2,
        "final_norm": norm_spec(params["final_norm"]),
        "layers": [],
    }
    if "pos_embedding" in params:
        specs["pos_embedding"] = rep2
    if "lm_head" in params:
        specs["lm_head"] = dense_like(params["lm_head"], col)

    stacked = not isinstance(params["layers"], list)
    layer_list = [params["layers"]] if stacked else params["layers"]
    for layer in layer_list:
        attn = layer["attn"]
        if "wqkv" in attn:   # fused projection (fuse_params, shard-interleaved)
            aspec = {"wqkv": dense_like(attn["wqkv"], col),
                     "wo": dense_like(attn["wo"], row)}
        else:
            aspec = {"wq": dense_like(attn["wq"], col),
                     "wk": dense_like(attn["wk"], col),
                     "wv": dense_like(attn["wv"], col),
                     "wo": dense_like(attn["wo"], row)}
        lspec: Params = {
            "ln1": norm_spec(layer["ln1"]),
            "ln2": norm_spec(layer["ln2"]),
            "attn": aspec,
        }
        # row-parallel bias is replicated and must not be double-counted
        # after psum — handled by _scale_row_biases at shard time.
        if "wo" in lspec["attn"] and "b" in lspec["attn"]["wo"]:
            lspec["attn"]["wo"]["b"] = rep1
        if "moe" in layer and "experts_cat" in layer["moe"]:
            # cat-fused experts (fuse_params fuse_moe): expert-major column/
            # row order makes EP a contiguous block slice of the 2-D cat
            cat_spec = {
                "w_gu": {"w": P(None, EXPERT_AXIS)},
                "w_out": {"w": P(EXPERT_AXIS, None)},
            }
            if "w_out_scales_stacked" in layer["moe"]["experts_cat"]:
                cat_spec["w_out_scales_stacked"] = P(EXPERT_AXIS, None, None)
            lspec["moe"] = {
                "router": dense_like(layer["moe"]["router"], rep2),
                "experts_cat": cat_spec,
            }
        elif "moe" in layer:
            ex = P(EXPERT_AXIS, None, None)
            lspec["moe"] = {
                "router": dense_like(layer["moe"]["router"], rep2),
                "experts": {
                    "w_in": {"w": ex},
                    "w_gate": {"w": ex},
                    "w_out": {"w": ex},
                },
            }
        else:
            mlp = layer["mlp"]
            if "w_gu" in mlp:
                mspec = {"w_gu": dense_like(mlp["w_gu"], col),
                         "w_out": dense_like(mlp["w_out"], row)}
            else:
                mspec = {"w_in": dense_like(mlp["w_in"], col),
                         "w_out": dense_like(mlp["w_out"], row)}
                if "w_gate" in mlp:
                    mspec["w_gate"] = dense_like(mlp["w_gate"], col)
            if "b" in mlp["w_out"]:
                mspec["w_out"]["b"] = rep1
            lspec["mlp"] = mspec
        specs["layers"].append(lspec)
    if stacked:
        specs["layers"] = _prepend_none(specs["layers"][0])
    return specs


def _scales_spec(leaf: QuantizedTensor, spec: P, tp: int) -> P:
    """Scales follow the matrix spec, except a per-channel (G=1) K axis
    cannot be row-sharded — replicate it instead (it is tiny). The matrix K
    axis is spec[-2] (works for 2D, stacked-layer 3D and stacked-MoE 4D)."""
    if len(spec) >= 2 and spec[-2] is not None and \
            leaf.scales.shape[-2] % max(tp, 1) != 0:
        return P(*spec[:-2], None, spec[-1])
    return spec


def _map_with_specs(fn, params, specs):
    """Map fn(leaf, spec) over params/specs trees where QuantizedTensor is a
    leaf-with-parts (data+scales share the matrix spec)."""

    def walk(p, s):
        if isinstance(p, QuantizedTensor):
            return fn(p, s)
        if isinstance(p, dict):
            return {k: walk(p[k], s[k]) for k in p}
        if isinstance(p, list):
            return [walk(a, b) for a, b in zip(p, s)]
        return fn(p, s)

    return walk(params, specs)


def repack_int4_row_sharded(leaf, spec: P, tp: int):
    """Make an int4 half-split packing row-shardable.

    pack_int4 pairs weight row r with row r + K/2 in one byte, so a plain
    row-slice of the packed (K/2, N) data hands each TP shard nibbles from
    the WRONG rows (shard 0 of tp=2 would get weight rows [0, K/4) and
    [K/2, 3K/4) instead of [0, K/2)) — decoded garbage. Caught by the 70B
    structure composition test (round 4); int8 is unaffected (1 row/byte).

    Fix: unpack to row order, re-pack each shard's contiguous K/tp row
    block locally, concatenate shard-major — now a contiguous row-slice IS
    a valid local half-split packing. Scales stay in original row order
    (group rows slice contiguously already). One-time setup cost."""
    import dataclasses

    from ..quant.qtypes import pack_int4, unpack_int4
    if (tp <= 1 or getattr(leaf, "bits", 0) != 4
            or len(spec) < 2 or spec[-2] != MODEL_AXIS):
        return leaf

    def rep(d2):
        vals = unpack_int4(d2)
        kl = vals.shape[0] // tp
        if kl % 2:
            raise ValueError(f"int4 TP row shard needs even K/tp, got {kl}")
        return jnp.concatenate(
            [pack_int4(vals[s * kl:(s + 1) * kl]) for s in range(tp)],
            axis=0)

    d = leaf.data
    if d.ndim == 2:
        data = rep(d)
    else:                       # stacked layers/experts: map leading dims
        lead = d.shape[:-2]
        flat = d.reshape((-1,) + d.shape[-2:])
        data = jax.vmap(rep)(flat).reshape(lead + d.shape[-2:])
    return dataclasses.replace(leaf, data=data)


def repack_params_for_tp(params: Params, specs: Params, tp: int) -> Params:
    """Apply repack_int4_row_sharded to every row-sharded quantized leaf
    (specs from param_spec_tree — data field holds the matrix spec)."""
    if tp <= 1:
        return params

    def fix(leaf, spec):
        if isinstance(leaf, QuantizedTensor):
            d = leaf.data
            sh = getattr(d, "sharding", None)
            if (sh is not None and getattr(sh, "is_fully_replicated", True)
                    is False and len(sh.device_set) > 1):
                # already model-sharded (checkpoint direct-to-sharding load
                # repacked on the way in) — repacking again would corrupt
                return leaf
            dspec = spec.data if isinstance(spec, QuantizedTensor) else spec
            return repack_int4_row_sharded(leaf, dspec, tp)
        return leaf

    return _map_with_specs(fix, params, specs)


def param_spec_tree(cfg: TransformerConfig, params: Params, tp: int) -> Params:
    """Spec pytree with the exact structure of `params` (QuantizedTensor
    nodes carry per-leaf specs) — consumable as shard_map in_specs."""
    specs = param_specs(cfg, params)

    def expand(leaf, spec):
        if isinstance(leaf, QuantizedTensor):
            sspec = _scales_spec(leaf, spec, tp)
            return QuantizedTensor(
                data=spec, scales=sspec,
                zero_points=None if leaf.zero_points is None else sspec,
                bits=leaf.bits, group_size=leaf.group_size,
                act_bits=leaf.act_bits)
        return spec

    return _map_with_specs(expand, params, specs)


def shard_params(params: Params, mesh: Mesh, cfg: TransformerConfig) -> Params:
    """device_put every weight with its NamedSharding. QuantizedTensor shards
    data and scales with the same (K, N) layout (scales' G axis follows K).
    Row-parallel replicated biases are pre-divided by the tp size so the
    post-matmul psum reconstructs them exactly once."""
    tp = mesh.shape[MODEL_AXIS]
    specs = param_specs(cfg, params)
    params = _scale_row_biases(params, tp)
    params = repack_params_for_tp(params, specs, tp)

    def put(leaf, spec):
        if isinstance(leaf, QuantizedTensor):
            sspec = _scales_spec(leaf, spec, tp)
            return QuantizedTensor(
                data=jax.device_put(leaf.data, NamedSharding(mesh, spec)),
                scales=jax.device_put(leaf.scales, NamedSharding(mesh, sspec)),
                zero_points=None if leaf.zero_points is None else
                jax.device_put(leaf.zero_points, NamedSharding(mesh, sspec)),
                bits=leaf.bits, group_size=leaf.group_size,
                act_bits=leaf.act_bits)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return _map_with_specs(put, params, specs)


def _scale_row_biases(params: Params, tp: int) -> Params:
    if tp <= 1:
        return params
    import copy
    out = copy.copy(params)
    stacked = not isinstance(params["layers"], list)
    layer_list = [params["layers"]] if stacked else params["layers"]
    out["layers"] = []
    for layer in layer_list:
        layer = dict(layer)
        attn = dict(layer["attn"])
        if "b" in attn["wo"]:
            wo = dict(attn["wo"])
            wo["b"] = wo["b"] / tp
            attn["wo"] = wo
        layer["attn"] = attn
        if "mlp" in layer and "b" in layer["mlp"]["w_out"]:
            mlp = dict(layer["mlp"])
            w_out = dict(mlp["w_out"])
            w_out["b"] = w_out["b"] / tp
            mlp["w_out"] = w_out
            layer["mlp"] = mlp
        out["layers"].append(layer)
    if stacked:
        out["layers"] = out["layers"][0]
    return out


def local_config(cfg: TransformerConfig, mesh: Mesh) -> TransformerConfig:
    """The per-shard view of the architecture inside shard_map: heads, kv
    heads, ffn width and experts divided by their mesh axes."""
    import dataclasses
    shape = dict(mesh.shape)
    tp = shape.get(MODEL_AXIS, 1)
    ep = shape.get(EXPERT_AXIS, 1)   # pipeline meshes have no expert axis
    if cfg.num_heads % tp or (cfg.kv_heads % tp):
        raise ValueError(
            f"heads {cfg.num_heads}/{cfg.kv_heads} not divisible by tp={tp}")
    if cfg.num_experts and cfg.num_experts % ep:
        raise ValueError(f"experts {cfg.num_experts} not divisible by ep={ep}")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.kv_heads // tp,
        head_dim=cfg.dim_head,
        intermediate_size=cfg.ffn_size // tp if not cfg.num_experts else cfg.ffn_size,
        # num_experts stays GLOBAL in the local config: the router produces
        # global routing; expert weight arrays are locally E/ep (leading axis).
    )


# ---------------------------------------------------------------------------
# Cache / decode-state shardings
# ---------------------------------------------------------------------------

def cache_pspec(stacked: bool = False) -> P:
    """LayerKVCache VALUE arrays are flat (B, S, K*D): slots over data, the
    head-major feature axis over model (splitting K*D over tp splits whole
    kv heads when K % tp == 0, matching the sharded QKV projections).
    StackedKVCache arrays add a leading (replicated) layer axis. Scales are
    head-major (B, K, S) — see cache_scale_pspec."""
    if stacked:
        return P(None, DATA_AXIS, None, MODEL_AXIS)
    return P(DATA_AXIS, None, MODEL_AXIS)


def cache_scale_pspec(stacked: bool = False) -> P:
    """Quantization scales are head-major (B, K, S): kv heads over model."""
    if stacked:
        return P(None, DATA_AXIS, MODEL_AXIS, None)
    return P(DATA_AXIS, MODEL_AXIS, None)


def _is_stacked_cache(caches) -> bool:
    from ..runtime.kvcache_stacked import StackedKVCache
    return isinstance(caches, StackedKVCache)


def _is_paged_cache(caches) -> bool:
    from ..runtime.kvcache_paged import PagedLayerKVCache
    return bool(caches) and isinstance(caches, tuple) and         isinstance(caches[0], PagedLayerKVCache)


def cache_spec_tree(caches):
    """Per-leaf PartitionSpec tree matching the cache pytree.

    Contiguous/stacked: one uniform spec. Paged: pool pages shard over
    "data" (one pool per data shard, shard-local page ids —
    kvcache_paged.ShardedPageAllocator) and the flat feature axis (Kh*D)
    over "model"; scale pools (P, Kh, page) shard kv heads over "model";
    page tables shard their slot rows over "data"."""
    if _is_paged_cache(caches):
        from ..runtime.kvcache_paged import PagedLayerKVCache
        pool = P(DATA_AXIS, None, MODEL_AXIS)    # flat (P, page, Kh*D)
        spool = P(DATA_AXIS, MODEL_AXIS, None)   # scales (P, Kh, page)
        return tuple(PagedLayerKVCache(
            k_pool=pool, v_pool=pool,
            k_scale=None if c.k_scale is None else spool,
            v_scale=None if c.v_scale is None else spool,
            table=P(DATA_AXIS, None),
            head_width=c.head_width, bits=c.bits, v_bits=c.v_bits)
            for c in caches)
    stacked = _is_stacked_cache(caches)
    vspec, sspec = cache_pspec(stacked), cache_scale_pspec(stacked)
    if stacked:
        from ..runtime.kvcache_stacked import StackedKVCache
        return StackedKVCache(
            k=vspec, v=vspec,
            k_scale=None if caches.k_scale is None else sspec,
            v_scale=None if caches.v_scale is None else sspec,
            bits=caches.bits, head_width=caches.head_width,
            v_bits=caches.v_bits)
    from ..runtime.kvcache import LayerKVCache
    # kt mirror (when present) is flat-feature like k with a trailing
    # 128-lane position dim: (B, C, Kh*D, 128) shards kv-heads on dim 2
    kt_spec = P(None, None, MODEL_AXIS, None)
    return tuple(LayerKVCache(
        k=vspec, v=vspec,
        k_scale=None if c.k_scale is None else sspec,
        v_scale=None if c.v_scale is None else sspec,
        bits=c.bits, head_width=c.head_width, v_bits=c.v_bits,
        kt=None if c.kt is None else kt_spec) for c in caches)


def shard_cache(caches, mesh: Mesh):
    specs = cache_spec_tree(caches)
    return jax.tree_util.tree_map(
        lambda arr, sp: jax.device_put(arr, NamedSharding(mesh, sp)),
        caches, specs)


def state_pspec(state) -> Any:
    """DecodeState arrays are slot-major: shard dim 0 over data; rng key
    replicated."""
    specs = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), state)
    return specs._replace(rng=P())


def shard_state(state, mesh: Mesh):
    specs = state_pspec(state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
