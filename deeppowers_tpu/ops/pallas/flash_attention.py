"""Blockwise online-softmax causal attention (flash attention) for prefill.

A *real* flash attention, unlike the reference's so-named kernel which keeps
per-thread full-sequence score arrays and a full softmax pass (reference:
src/core/execution/models/gpt_kernels.cu:93-187; SURVEY.md §5.7 notes it
cannot scale sequence length). Here: O(S) memory per query block, online
max/denominator rescaling in VMEM scratch, causal + length masking.

Grid: (B*H, S/bq, S/bk) with the K dimension innermost ("arbitrary" =
sequential) so the (m, l, acc) running stats live in scratch across K steps —
the canonical Pallas TPU flash structure. Fully-masked K blocks (beyond the
causal frontier) skip their compute under @pl.when; their DMA is pipelined
away by Mosaic's block prefetcher.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
            block_q: int, block_k: int, scale: float, heads: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bh = pl.program_id(0)
    b = jax.lax.div(bh, heads)
    seq_len = len_ref[b]

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal frontier: K block start beyond the last query row -> no work
    @pl.when(ki * block_k <= qi * block_q + block_q - 1)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale            # (bq, D)
        k_blk = k_ref[0].astype(jnp.float32)                # (bk, D)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (bq, bk)
        q_idx = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_idx = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where((k_idx <= q_idx) & (k_idx < seq_len), s, NEG_INF)

        m_prev = m_ref[:]                                   # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale"))
def flash_attention_prefill(
    q: jnp.ndarray,              # (B, S, H, D)
    k: jnp.ndarray,              # (B, S, K, D) — kv heads, UNREPEATED is fine
    v: jnp.ndarray,
    lengths: jnp.ndarray,        # (B,) int32
    *,
    block_q: int = 512,
    block_k: int = 512,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal flash attention, GQA-aware. Returns (B, S, H, D) in q.dtype.

    K/V may have fewer heads than Q (grouped-query attention): the kernel's
    K/V block specs index kv head h // rep — no repeated copy is ever
    materialized in HBM (rep x the KV bytes saved)."""
    b, s, h, d = q.shape
    kh = k.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5
    bq = min(block_q, s)
    bk = min(block_k, s)
    s_orig = s
    if s % bq or s % bk:
        # pad S to a block multiple: padded K rows are masked by the length
        # check (k_idx < seq_len can never reach them since lengths <= s_orig)
        # and padded Q rows are sliced off below. One extra partial block of
        # compute; removes the power-of-two sequence restriction.
        import math
        mult = math.lcm(bq, bk)
        s = -(-s_orig // mult) * mult
        pad = ((0, 0), (0, s - s_orig), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    def flat(x):                       # (B, S, Hx, D) -> (B*Hx, S, D)
        hx = x.shape[2]
        return x.transpose(0, 2, 1, 3).reshape(b * hx, s, d)

    qf, kf, vf = flat(q), flat(k), flat(v)

    def kv_index(bh, qi, ki, lens, r=rep, nh=h, nk=kh):
        # query program bh = b * H + h_q -> kv row b * K + h_q // rep
        return (jax.lax.div(bh, nh) * nk + jax.lax.div(jax.lax.rem(bh, nh), r),
                ki, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, s // bq, s // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi, ki, lens: (bh, qi, 0)),
            pl.BlockSpec((1, bk, d), kv_index),
            pl.BlockSpec((1, bk, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, ki, lens: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),     # m
            pltpu.VMEM((bq, 1), jnp.float32),     # l
            pltpu.VMEM((bq, d), jnp.float32),     # acc
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_q=bq, block_k=bk, scale=scale,
                          heads=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d // 2,
            bytes_accessed=3 * b * h * s * d * 2 + b * h * s * d * 2,
            transcendentals=b * h * s * s // 2),
        interpret=_interpret(),
    )(lengths.astype(jnp.int32), qf, kf, vf)

    out = out.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out[:, :s_orig]
