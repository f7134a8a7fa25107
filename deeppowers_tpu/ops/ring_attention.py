"""Ring attention: causal attention with the sequence sharded over a mesh
axis (context/sequence parallelism).

New capability beyond the reference (SURVEY.md §5.7: the reference has no
ring/context/sequence parallelism and a hard 2048 cap; the TPU plan calls for
"sharding the KV/sequence dimension over the mesh with collective-permute
ring attention"). Each device holds one contiguous sequence chunk of Q, K, V;
K/V chunks rotate around the ring via jax.lax.ppermute while every device
accumulates online-softmax partials for its local queries. Peak memory per
device is O(S/p * S/p) scores; total traffic per step is one K/V chunk over
ICI, overlapped by XLA with the local compute.

Called *inside* shard_map with q/k/v already sharded on the sequence axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,            # (B, S_local, H, D) — this shard's queries
    k: jnp.ndarray,            # (B, S_local, K, D) — kv heads (GQA: K <= H)
    v: jnp.ndarray,
    axis_name: str,
    *,
    lengths: Optional[jnp.ndarray] = None,   # (B,) GLOBAL valid lengths
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal ring attention over `axis_name`. Returns (B, S_local, H, D).

    Chunk c of the global sequence lives on device c (axis index order).
    GQA-aware: the UNREPEATED K/V chunks rotate around the ring (ppermute
    traffic and HBM reads are rep x smaller than rotating repeated heads);
    queries are grouped (K, rep) for the contractions.
    """
    b, s_local, h, d = q.shape
    kh = k.shape[2]
    rep = h // kh
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    scale = scale if scale is not None else d ** -0.5

    qg = (q.reshape(b, s_local, kh, rep, d) * scale).astype(jnp.float32)
    q_pos = my * s_local + jnp.arange(s_local)              # global q positions

    def step(carry, i):
        k_blk, v_blk, m, l, acc = carry
        # which global chunk this k_blk holds after i rotations
        src = (my - i) % p
        k_pos = src * s_local + jnp.arange(s_local)
        scores = jnp.einsum("bqkrd,bskd->bkrqs", qg,
                            k_blk.astype(jnp.float32))      # (B,K,R,Sq,Sk)
        mask = k_pos[None, :] <= q_pos[:, None]             # causal (global)
        if lengths is not None:
            mask = mask[None] & (k_pos[None, None, :] <
                                 lengths[:, None, None])    # (B, Sq, Sk)
        else:
            mask = jnp.broadcast_to(mask[None], (b, s_local, s_local))
        scores = jnp.where(mask[:, None, None], scores, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        pexp = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)                          # (B,K,R,Sq,1)
        l_new = l * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        # acc layout: (B, Sq, K, R, D); alpha -> (B, Sq, K, R, 1)
        alpha_q = jnp.transpose(alpha[..., 0], (0, 3, 1, 2))[..., None]
        acc_new = acc * alpha_q + jnp.einsum(
            "bkrqs,bskd->bqkrd", pexp, v_blk.astype(jnp.float32))

        # rotate K/V to the next device on the ring
        perm = [(j, (j + 1) % p) for j in range(p)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, l_new, acc_new), None

    m0 = jnp.full((b, kh, rep, s_local, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((b, kh, rep, s_local, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((b, s_local, kh, rep, d), dtype=jnp.float32)
    (k_f, v_f, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(p))

    l_q = jnp.transpose(l[..., 0], (0, 3, 1, 2))[..., None]  # (B,Sq,K,R,1)
    out = acc / jnp.maximum(l_q, 1e-30)
    return out.reshape(b, s_local, h, d).astype(q.dtype)
