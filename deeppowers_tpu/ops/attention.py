"""Attention ops: causal prefill and KV-cache decode, GQA-aware.

Replaces the reference's flash_attention_kernel — which despite its name does a
full-sequence softmax per thread with O(seq) per-thread score arrays and
head_dim<=64 (reference: src/core/execution/models/gpt_kernels.cu:93-187,
SURVEY.md §5.7) — with:

- `attention_prefill`: causal self-attention over the padded prompt. The jnp
  path lets XLA fuse QK^T -> masked softmax -> PV; the Pallas flash path
  (ops/pallas/flash_attention.py) is used on TPU for long sequences.
- `attention_decode`: one-token query against the KV cache with per-slot
  length masking — the hot op of the serving decode loop.

Shapes use B=batch(slots), S=sequence, H=query heads, K=kv heads, D=head dim.
Scores are computed in f32 always (bf16 softmax is an accuracy trap).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# (S, D) -> (block_q, block_k) chosen by runtime.autotuner.tune_flash_attention
_FLASH_BLOCKS: dict = {}


def set_flash_blocks(s: int, d: int, block_q: int, block_k: int) -> None:
    _FLASH_BLOCKS[(s, d)] = (block_q, block_k)


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, S, K, D) -> (B, S, K*n_rep, D) for grouped-query attention."""
    if n_rep == 1:
        return x
    b, s, k, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, k, n_rep, d)).reshape(
        b, s, k * n_rep, d)


def attention_prefill(
    q: jnp.ndarray,            # (B, S, H, D)
    k: jnp.ndarray,            # (B, S, K, D)
    v: jnp.ndarray,            # (B, S, K, D)
    *,
    lengths: Optional[jnp.ndarray] = None,   # (B,) valid prompt lengths
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Causal self-attention over a (padded) prompt. Returns (B, S, H, D).

    Long sequences on TPU take the Pallas flash path (O(S) memory per query
    block); short ones stay on the XLA-fused einsum path where the full
    (S, S) score tile is cheap.
    """
    b, s, h, d = q.shape
    kh = k.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    if use_flash is None:
        # the kernel pads S to a block multiple internally, so any length
        # qualifies; below ~512 the XLA-fused dense path wins anyway
        use_flash = (jax.default_backend() == "tpu" and s >= 512
                     and d in (64, 128, 256))
    if use_flash:
        from .pallas.flash_attention import flash_attention_prefill
        lens = lengths if lengths is not None else jnp.full((b,), s, jnp.int32)
        bq, bk = _FLASH_BLOCKS.get((s, d), (512, 512))
        return flash_attention_prefill(q, k, v, lens, scale=scale,
                                       block_q=bq, block_k=bk)

    # GQA-aware: grouped queries against the UNREPEATED K/V (see
    # attention_decode — a materialized repeat costs rep x the HBM reads)
    qg = (q.reshape(b, s, kh, rep, d) * scale).astype(jnp.float32)
    scores = jnp.einsum("bqkrd,bskd->bkrqs", qg, k.astype(jnp.float32))

    pos = jnp.arange(s)
    causal = pos[None, :] <= pos[:, None]                  # (S, S) keys <= query
    mask = causal[None, None, None, :, :]
    if lengths is not None:
        valid = pos[None, :] < lengths[:, None]            # (B, S) key validity
        mask = mask & valid[:, None, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrqs,bskd->bqkrd", probs, v.astype(jnp.float32))
    return out.reshape(b, s, h, d).astype(q.dtype)


def attention_chunk(
    q: jnp.ndarray,            # (B, C, H, D) chunk queries
    k_cache: jnp.ndarray,      # (B, S, K, D) cache incl. this chunk's keys
    v_cache: jnp.ndarray,
    start: jnp.ndarray,        # scalar int32 — chunk's first position
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention: chunk queries over the whole cache with the
    causal frontier at start + local index. Returns (B, C, H, D).

    Enables Sarathi-style interleaving of long prefills with decode steps
    (new capability vs the reference, which prefilled whole prompts only).
    """
    b, c, h, d = q.shape
    s = k_cache.shape[1]
    kh = k_cache.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    qg = (q.reshape(b, c, kh, rep, d) * scale).astype(jnp.float32)
    scores = jnp.einsum("bqkrd,bskd->bkrqs", qg,
                        k_cache.astype(jnp.float32))
    q_idx = start + jnp.arange(c)                          # (C,)
    k_idx = jnp.arange(s)                                  # (S,)
    mask = k_idx[None, :] <= q_idx[:, None]                # (C, S)
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrqs,bskd->bqkrd", probs,
                     v_cache.astype(jnp.float32))
    return out.reshape(b, c, h, d).astype(q.dtype)


def attention_verify(
    q: jnp.ndarray,            # (B, T, H, D) draft-window queries
    k_cache: jnp.ndarray,      # (B, S, K, D) cache incl. the window's keys
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,      # (B,) tokens in cache before this window
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-token decode attention for speculative verification.

    Query t of slot b sits at position lengths[b] + t; it sees key j iff
    j <= lengths[b] + t (causal within the window, full cache before it).
    Returns (B, T, H, D). Like attention_chunk but with a per-slot start and
    all slots batched (speculative decoding verifies every slot at once)."""
    b, t, h, d = q.shape
    s = k_cache.shape[1]
    kh = k_cache.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    qg = (q.reshape(b, t, kh, rep, d) * scale).astype(jnp.float32)
    scores = jnp.einsum("btkrd,bskd->bkrts", qg,
                        k_cache.astype(jnp.float32))
    q_pos = lengths[:, None] + jnp.arange(t)[None, :]      # (B, T)
    mask = jnp.arange(s)[None, None, :] <= q_pos[:, :, None]  # (B, T, S)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrts,bskd->btkrd", probs,
                     v_cache.astype(jnp.float32))
    return out.reshape(b, t, h, d).astype(q.dtype)


def attention_verify_quantized(
    q: jnp.ndarray,            # (B, T, H, D)
    k_q: jnp.ndarray,          # (B, S, K, D) int8
    v_q: jnp.ndarray,
    k_scale: jnp.ndarray,      # (B, K, S) f32 head-major
    v_scale: jnp.ndarray,
    lengths: jnp.ndarray,      # (B,)
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """attention_verify over an int8 KV cache with scale folding (same trick
    as attention_decode_quantized: int8 arrays reach the dot as a fused cast,
    per-position scales are applied to the (B, H, T, S) scores)."""
    b, t, h, d = q.shape
    s = k_q.shape[1]
    kh = k_q.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    ks, vs = k_scale, v_scale                               # (B, K, S)
    qg = (q.reshape(b, t, kh, rep, d) * scale).astype(jnp.bfloat16)
    scores = jnp.einsum("btkrd,bskd->bkrts", qg, k_q.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, None, :]
    q_pos = lengths[:, None] + jnp.arange(t)[None, :]
    mask = jnp.arange(s)[None, None, :] <= q_pos[:, :, None]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("bkrts,bskd->btkrd", pw, v_q.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, h, d).astype(q.dtype)


def attention_decode_quantized(
    q: jnp.ndarray,            # (B, H, D)
    k_q: jnp.ndarray,          # (B, S, K, D) int8
    v_q: jnp.ndarray,
    k_scale: jnp.ndarray,      # (B, K, S) f32 head-major
    v_scale: jnp.ndarray,
    lengths: jnp.ndarray,      # (B,)
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Decode attention over an int8 KV cache with *scale folding*: the big
    cache arrays are touched only by a dtype cast (which XLA fuses into the
    dot), and the per-(pos, head) quantization scales are applied to the
    (B, H, S) scores / probabilities instead — measured ~25% faster than
    dequantizing the cache first (XLA materializes that dequantized copy).

    scores[b,h,s] = (q . k_int8) * k_scale[s];  out = sum_s (p*v_scale) v_int8
    """
    b, h, d = q.shape
    s = k_q.shape[1]
    kh = k_q.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    # GQA-aware: contract grouped queries against the UNREPEATED int8 cache
    ks, vs = k_scale, v_scale                               # (B, K, S)
    qg = (q.reshape(b, kh, rep, d) * scale).astype(jnp.bfloat16)
    scores = jnp.einsum("bkrd,bskd->bkrs", qg, k_q.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :]
    valid = jnp.arange(s)[None, :] < lengths[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    pw = (probs * vs[:, :, None, :]).astype(jnp.bfloat16)
    out = jnp.einsum("bkrs,bskd->bkrd", pw, v_q.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, d).astype(q.dtype)


def attention_decode(
    q: jnp.ndarray,            # (B, H, D) single new token per slot
    k_cache: jnp.ndarray,      # (B, S, K, D)
    v_cache: jnp.ndarray,      # (B, S, K, D)
    lengths: jnp.ndarray,      # (B,) tokens valid in cache (incl. current)
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-step decode attention. Returns (B, H, D).

    The whole cache is masked by `lengths` — fixed shapes keep this jittable
    with no recompiles as sequences grow (SURVEY.md §7 "continuous batching
    under jit").

    GQA-aware: query heads are grouped as (K, rep) and contracted against
    the UNREPEATED cache — a materialized repeat_kv broadcast costs rep x
    the HBM reads when XLA's fusion misses it (measured 10x standalone).
    """
    b, h, d = q.shape
    s = k_cache.shape[1]
    kh = k_cache.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5

    qg = (q.reshape(b, kh, rep, d) * scale).astype(jnp.float32)
    scores = jnp.einsum("bkrd,bskd->bkrs", qg,
                        k_cache.astype(jnp.float32))
    valid = jnp.arange(s)[None, :] < lengths[:, None]      # (B, S)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkrs,bskd->bkrd", probs, v_cache.astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)


def attention_decode_auto(
    q: jnp.ndarray,            # (B, H, D)
    k_cache: jnp.ndarray,      # (B, S, K, D) bf16/f32 or int8
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,      # (B,)
    k_scale: Optional[jnp.ndarray] = None,   # (B, S, K, 1) f32 when int8
    v_scale: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Decode attention with automatic kernel selection: on TPU the
    head-folded MXU Pallas kernel (ops/pallas/decode_attention.py, measured
    492-853 GB/s vs 142-506 for the per-head layout and ~206 effective for
    the XLA einsum — the (K, D) minor dims of the cache pad to (8, 128)
    Mosaic tiles, so a K=4, D=64 model wasted 4x the DMA traffic); off-TPU
    the XLA einsum paths (the kernel's interpret mode is test-only slow).
    """
    import os
    if (jax.default_backend() == "tpu" and k_cache.shape[1] >= 128
            and os.environ.get("DPT_DECODE_KERNEL", "1") != "0"):
        from .pallas.decode_attention import decode_attention_mxu
        return decode_attention_mxu(q, k_cache, v_cache, lengths,
                                    k_scale, v_scale, scale=scale)
    if k_scale is not None:
        return attention_decode_quantized(q, k_cache, v_cache, k_scale,
                                          v_scale, lengths, scale=scale)
    return attention_decode(q, k_cache, v_cache, lengths, scale=scale)
