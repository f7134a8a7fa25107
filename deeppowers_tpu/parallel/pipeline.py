"""Inference pipeline parallelism: GPipe-style staged forward over a
(stage, model) mesh.

Reference analogue: DistributedExecutor's PIPELINE_PARALLEL mode — per-stage
layer assignment (floor division, remainder to early stages,
reference: src/core/distributed/distributed_context.cpp:282-303), FORWARD
tasks flowing activations stage-to-stage (distributed_executor.cpp:239-315;
its stage compute was a TODO and 1F1B was "TODO handle bubbles"). Here the
whole pipeline is ONE compiled shard_map program: each stage holds L/S
layers (stacked, stage-sharded), microbatches rotate via ppermute, and XLA
overlaps the activation handoff with the next tick's compute.

When to use PP vs TP (docs/parallelism.md for the full analysis): TP costs
2 all-reduces of the hidden state per LAYER per token; PP costs 1
point-to-point transfer per STAGE BOUNDARY per microbatch. Within one ICI
pod TP wins (collectives ride 4.5+ TB/s bisection); across DCN (multi-pod)
PP's S-1 transfers per token beat TP's 2L all-reduces by ~L/S x — but
inference at the 70B scale fits a single pod's TP+EP, so the serving engine
keeps TP/DP/EP as first-class and PP as this standalone throughput-oriented
batch-forward capability.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.transformer import TransformerConfig

try:  # JAX >= 0.5 public API
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

STAGE_AXIS = "stage"


def make_pipeline_mesh(stages: int) -> Mesh:
    """1-D pipeline mesh. Composable with TP by a 2-D (stage, model) mesh in
    a future extension; the capability demonstrated here is stage rotation."""
    devs = np.asarray(jax.devices()[:stages])
    return Mesh(devs.reshape(stages), (STAGE_AXIS,))


def stage_layers(params: Any, stages: int) -> Any:
    """Stack the unrolled layer list into stage-major stacked leaves
    (S * Lps, ...) so a P('stage', ...) in_spec gives each stage its own
    contiguous block of layers (floor-division assignment; L % S must be 0 —
    pad shallow models by choosing S | L)."""
    layers = params["layers"]
    n = len(layers)
    if n % stages:
        raise ValueError(f"num_layers {n} not divisible by stages {stages}")
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *layers)
    out = dict(params)
    out["layers"] = stacked
    return out


def _layer_specs(stacked_layers: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(STAGE_AXIS), stacked_layers)


def pipeline_forward(
    params: Any,
    cfg: TransformerConfig,
    input_ids: jnp.ndarray,          # (B, S_len) padded prompts
    lengths: jnp.ndarray,            # (B,)
    mesh: Mesh,
    *,
    microbatches: int = 0,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Batch forward -> last-token logits (B, V) through a staged pipeline.

    The batch splits into M microbatches (default = number of stages). Tick
    t: stage s runs microbatch t-s through its layers, then ppermutes the
    activations to stage s+1 — M + S - 1 ticks total, the classic GPipe
    fill/drain schedule (steady-state bubble fraction (S-1)/(M+S-1)).
    Embedding and the LM head are replicated; the final logits come from the
    last stage (masked psum broadcast)."""
    from ..models.transformer import (_attn_tail, _embed, _logits, _norm,
                                      _qkv)
    from ..ops.attention import attention_prefill
    from ..ops.rotary import apply_rope

    stages = mesh.shape[STAGE_AXIS]
    m = microbatches or stages
    b, s_len = input_ids.shape
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    mb = b // m

    sparams = stage_layers(params, stages)
    pspecs = {k: (_layer_specs(v) if k == "layers"
                  else jax.tree_util.tree_map(lambda _: P(), v))
              for k, v in sparams.items()}

    def run(p, ids, lens):
        my = jax.lax.axis_index(STAGE_AXIS)
        is_first = my == 0
        is_last = my == stages - 1
        positions = jnp.broadcast_to(jnp.arange(s_len), (mb, s_len))

        def stage_block(x, lens_mb):
            """Run this stage's layers on one microbatch's activations."""
            def body(carry, layer):
                x = carry
                ap = layer["attn"]
                xn = _norm(x, layer["ln1"], cfg)
                q, k, v = _qkv(xn, ap, cfg)
                if cfg.positions == "rope":
                    q = apply_rope(q, positions, theta=cfg.rope_theta)
                    k = apply_rope(k, positions, theta=cfg.rope_theta)
                attn = attention_prefill(q, k, v, lengths=lens_mb)
                attn = attn.reshape(mb, s_len, cfg.q_size)
                return _attn_tail(x, attn, ap, layer, cfg, None, None), None

            x, _ = jax.lax.scan(body, x, p["layers"])
            return x

        ids_mb = ids.reshape(m, mb, s_len)
        lens_mb = lens.reshape(m, mb)
        h = cfg.hidden_size
        out_logits = jnp.zeros((m, mb, cfg.vocab_size), jnp.float32)
        recv = jnp.zeros((mb, s_len, h), dtype)

        def tick(t, carry):
            recv, out_logits = carry
            mb_idx = jnp.clip(t - my, 0, m - 1)
            active = (t - my >= 0) & (t - my < m)
            x_in = jnp.where(
                is_first,
                _embed(p, cfg, ids_mb[mb_idx],
                       jnp.broadcast_to(jnp.arange(s_len), (mb, s_len)),
                       dtype),
                recv)
            y = stage_block(x_in, lens_mb[mb_idx])
            # activation handoff to the next stage (ring; last -> 0 unused)
            nxt = jax.lax.ppermute(
                y, STAGE_AXIS,
                [(i, (i + 1) % stages) for i in range(stages)])
            logit = _logits(p, cfg, y, None)         # (mb, S, V)
            last = logit[jnp.arange(mb), lens_mb[mb_idx] - 1]
            out_logits = jax.lax.cond(
                active & is_last,
                lambda o: o.at[mb_idx].set(last.astype(jnp.float32)),
                lambda o: o,
                out_logits)
            return nxt, out_logits

        recv, out_logits = jax.lax.fori_loop(
            0, m + stages - 1, tick, (recv, out_logits))
        # broadcast the last stage's logits to every stage
        out_logits = jnp.where(is_last, out_logits, 0.0)
        out_logits = jax.lax.psum(out_logits, STAGE_AXIS)
        return out_logits.reshape(b, cfg.vocab_size)

    mapped = shard_map(
        run, mesh=mesh,
        in_specs=(pspecs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)(sparams, input_ids, lengths)
