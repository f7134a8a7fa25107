"""Model-quality evaluation: perplexity and the Δppl quantization gate.

The reference asserted quantized accuracy with TODO metrics (reference:
tests/test_quantization.cpp:70-94 — "similarity" thresholds never computed).
Here the gate is real: perplexity over token sequences, and
`delta_ppl(params_fp, params_q)` for the BASELINE.md acceptance bar
(Δppl <= 0.1 vs FP16 at the same bit-width).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import TransformerConfig, forward_decode, forward_prefill
from . import kvcache


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def _nll_sum(params, cfg: TransformerConfig, input_ids, lengths,
             dtype=jnp.float32):
    """Sum of next-token negative log-likelihoods over valid positions.

    input_ids: (B, S) padded; lengths: (B,). Position t predicts token t+1;
    positions t >= length-1 are masked. Returns (nll_sum, token_count).
    """
    logits, _ = forward_prefill(params, cfg, input_ids, lengths, dtype=dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = input_ids[:, 1:]                                # (B, S-1)
    tok_logp = jnp.take_along_axis(
        logp[:, :-1], targets[..., None], axis=-1)[..., 0]    # (B, S-1)
    pos = jnp.arange(input_ids.shape[1] - 1)
    valid = pos[None, :] < (lengths[:, None] - 1)
    nll = -jnp.where(valid, tok_logp, 0.0)
    return nll.sum(), valid.sum()


def perplexity(params: Any, cfg: TransformerConfig,
               sequences: Sequence[Sequence[int]], *,
               batch_size: int = 8, max_len: Optional[int] = None,
               dtype=jnp.float32) -> float:
    """Corpus perplexity = exp(total NLL / total predicted tokens)."""
    max_len = max_len or cfg.max_seq_len
    seqs = [list(s)[:max_len] for s in sequences if len(s) >= 2]
    if not seqs:
        raise ValueError("need sequences of length >= 2")
    pad_to = max(len(s) for s in seqs)
    total_nll, total_tokens = 0.0, 0
    for i in range(0, len(seqs), batch_size):
        chunk = seqs[i:i + batch_size]
        b = len(chunk)
        ids = np.zeros((batch_size, pad_to), dtype=np.int32)
        lens = np.zeros((batch_size,), dtype=np.int32)
        for j, s in enumerate(chunk):
            ids[j, :len(s)] = s
            lens[j] = len(s)
        nll, cnt = _nll_sum(params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                            dtype)
        total_nll += float(nll)
        total_tokens += int(cnt)
    return float(np.exp(total_nll / max(total_tokens, 1)))


@partial(jax.jit, static_argnames=("cfg", "kv_cache_dtype", "dtype", "cache_len"))
def _nll_sum_cached(params, cfg: TransformerConfig, input_ids, lengths,
                    kv_cache_dtype="bf16", dtype=jnp.float32, cache_len=0):
    """Teacher-forced NLL through the DECODE path: every position is produced
    by forward_decode reading the (possibly quantized) KV cache — the path
    the prefill-based `_nll_sum` never executes. This is what gates int8/int4
    KV accuracy (BASELINE.md Δppl <= 0.1; the reference left its KV
    quantization accuracy acceptance as a TODO —
    reference: tests/test_quantization.cpp:70-94, gpt_model.cpp:532-545).

    input_ids: (B, S); lengths: (B,). Token at position t is fed as the
    decode input with t tokens already cached; its logits predict t+1.
    """
    b, s = input_ids.shape
    caches = kvcache.init_cache(
        cfg.num_layers, b, cache_len or s, cfg.kv_heads, cfg.dim_head,
        dtype=dtype, kv_cache_dtype=kv_cache_dtype)

    def step(carry, xs):
        caches, nll, cnt = carry
        t, tok, tgt = xs
        logits, caches = forward_decode(
            params, cfg, tok, caches, jnp.full((b,), t, jnp.int32),
            dtype=dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tlp = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        valid = (t + 1) < lengths
        nll = nll + jnp.where(valid, -tlp, 0.0).sum()
        cnt = cnt + valid.sum()
        return (caches, nll, cnt), None

    ts = jnp.arange(s - 1)
    (caches, nll, cnt), _ = jax.lax.scan(
        step, (caches, jnp.float32(0.0), jnp.int32(0)),
        (ts, input_ids[:, :-1].T, input_ids[:, 1:].T))
    return nll, cnt


def cached_perplexity(params: Any, cfg: TransformerConfig,
                      sequences: Sequence[Sequence[int]], *,
                      kv_cache_dtype: str = "bf16", batch_size: int = 8,
                      max_len: Optional[int] = None,
                      dtype=jnp.float32) -> float:
    """Corpus perplexity computed step-by-step through the KV cache.

    Numerically equivalent to `perplexity` when kv_cache_dtype holds the
    compute dtype exactly; with int8/int4 KV it measures the true accuracy
    cost of the quantized cache on every attention read."""
    max_len = max_len or cfg.max_seq_len
    seqs = [list(s)[:max_len] for s in sequences if len(s) >= 2]
    if not seqs:
        raise ValueError("need sequences of length >= 2")
    pad_to = max(len(s) for s in seqs)
    total_nll, total_tokens = 0.0, 0
    for i in range(0, len(seqs), batch_size):
        chunk = seqs[i:i + batch_size]
        ids = np.zeros((batch_size, pad_to), dtype=np.int32)
        lens = np.zeros((batch_size,), dtype=np.int32)
        for j, s in enumerate(chunk):
            ids[j, :len(s)] = s
            lens[j] = len(s)
        nll, cnt = _nll_sum_cached(params, cfg, jnp.asarray(ids),
                                   jnp.asarray(lens),
                                   kv_cache_dtype=kv_cache_dtype,
                                   dtype=dtype, cache_len=pad_to)
        total_nll += float(nll)
        total_tokens += int(cnt)
    return float(np.exp(total_nll / max(total_tokens, 1)))


def delta_ppl(params_ref: Any, params_quant: Any, cfg: TransformerConfig,
              sequences: Sequence[Sequence[int]], **kw) -> dict:
    """The acceptance gate: Δppl = ppl(quantized) - ppl(reference)
    (BASELINE.md: <= 0.1 at the same bit-width)."""
    ppl_ref = perplexity(params_ref, cfg, sequences, **kw)
    ppl_q = perplexity(params_quant, cfg, sequences, **kw)
    return {"ppl_ref": ppl_ref, "ppl_quant": ppl_q,
            "delta_ppl": ppl_q - ppl_ref}
