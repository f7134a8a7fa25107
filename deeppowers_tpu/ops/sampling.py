"""On-device token sampling.

Fixes the reference's host round-trip: its sampling runs on CPU over logits
copied back per token (reference: src/core/inference/inference_engine.cpp:323-437
— temperature -> repetition penalty -> top-k -> top-p -> softmax sample; and
gpt_model.cpp:263-359). Here the whole chain is jnp inside the jitted decode
step, vectorized over batch slots with *per-slot* parameters so one compiled
step serves heterogeneous requests (continuous batching).

All shapes: logits (B, V); per-slot params (B,).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


# static per-slot logit_bias capacity: OpenAI caps logit_bias at 300 keys;
# 64 covers practical use while keeping the per-step scatter negligible
LOGIT_BIAS_SLOTS = 64


class SamplingParams(NamedTuple):
    """Per-slot sampling parameters, all shape (B,) (bias_*: (B, K)).

    Defaults mirror GenerationConfig (config.py): temperature 0.7, top_k 50,
    top_p 0.9 (reference: inference_engine.hpp:19-41).
    """

    temperature: jnp.ndarray      # f32; 0 => greedy
    top_k: jnp.ndarray            # int32; 0 => disabled
    top_p: jnp.ndarray            # f32; 1.0 => disabled
    repetition_penalty: jnp.ndarray  # f32; 1.0 => disabled
    presence_penalty: jnp.ndarray    # f32
    frequency_penalty: jnp.ndarray   # f32
    min_tokens: jnp.ndarray       # int32; suppress EOS before this many tokens
    bias_ids: jnp.ndarray         # int32 (B, LOGIT_BIAS_SLOTS); -1 = empty
    bias_vals: jnp.ndarray        # f32  (B, LOGIT_BIAS_SLOTS)

    @classmethod
    def from_config(cls, cfg, batch_size: int) -> "SamplingParams":
        full = lambda v, dt=jnp.float32: jnp.full((batch_size,), v, dtype=dt)
        temp = cfg.temperature if cfg.do_sample else 0.0
        ids = np.full((batch_size, LOGIT_BIAS_SLOTS), -1, dtype=np.int32)
        vals = np.zeros((batch_size, LOGIT_BIAS_SLOTS), dtype=np.float32)
        bias = getattr(cfg, "logit_bias", None)
        if bias:
            items = list(bias.items())[:LOGIT_BIAS_SLOTS]
            for j, (tid, v) in enumerate(items):
                ids[:, j] = int(tid)
                vals[:, j] = float(v)
        return cls(
            temperature=full(temp),
            top_k=full(cfg.top_k, jnp.int32),
            top_p=full(cfg.top_p),
            repetition_penalty=full(cfg.repetition_penalty),
            presence_penalty=full(cfg.presence_penalty),
            frequency_penalty=full(cfg.frequency_penalty),
            min_tokens=full(cfg.min_tokens, jnp.int32),
            bias_ids=jnp.asarray(ids),
            bias_vals=jnp.asarray(vals),
        )


def apply_logit_bias(logits: jnp.ndarray, params: "SamplingParams"
                     ) -> jnp.ndarray:
    """Per-slot additive logit bias (OpenAI logit_bias semantics: applied
    to raw logits before sampling; ±100 effectively bans/forces a token).
    Scatter-add of K=LOGIT_BIAS_SLOTS entries per row — O(B*K), negligible
    next to the (B, V) sampling chain."""
    v = logits.shape[-1]
    safe = jnp.clip(params.bias_ids, 0, v - 1)
    # Ignore out-of-range ids entirely (a tokenizer/model vocab mismatch can
    # send id >= vocab; clipping alone would bias the last vocab token).
    valid = (params.bias_ids >= 0) & (params.bias_ids < v)
    vals = jnp.where(valid, params.bias_vals, 0.0)
    return jax.vmap(lambda l, i, x: l.at[i].add(x))(logits, safe, vals)


def apply_penalties(
    logits: jnp.ndarray,               # (B, V) f32
    token_counts: jnp.ndarray,         # (B, V) int32 — occurrences in output (+ prompt)
    params: SamplingParams,
) -> jnp.ndarray:
    """Repetition (divide/multiply, HF semantics, matching the reference's
    apply at inference_engine.cpp:354-370) + presence/frequency penalties
    (reference: request.hpp:27-35)."""
    seen = token_counts > 0
    rp = params.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(seen, penalized, logits)
    logits = logits - params.presence_penalty[:, None] * seen.astype(jnp.float32)
    logits = logits - params.frequency_penalty[:, None] * token_counts.astype(
        jnp.float32)
    return logits


def top_k_top_p_mask(logits: jnp.ndarray, top_k: jnp.ndarray,
                     top_p: jnp.ndarray) -> jnp.ndarray:
    """Mask logits outside per-slot top-k / nucleus top-p to -inf.

    One descending sort; both filters become *value thresholds* against it
    (no rank scatter — two argsorts saved, which dominate sampling cost at
    vocab scale). Ties at a threshold are all kept, a superset of the exact
    top-k that only matters for exactly-equal logits. top_k=0 and top_p>=1
    disable their filters.
    """
    b, v = logits.shape
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]        # (B, V) desc

    # top-k threshold: the k-th largest value (k=0 -> keep all)
    k = jnp.clip(jnp.where(top_k > 0, top_k, v), 1, v)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    keep_k = logits >= kth

    # top-p: nucleus = shortest prefix of the sorted order whose mass >= p;
    # its smallest member's value is the threshold. cum_before < p always
    # keeps rank 0.
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum_before = jnp.cumsum(probs_sorted, axis=-1) - probs_sorted
    in_nucleus = cum_before < top_p[:, None]
    thresh_p = jnp.min(jnp.where(in_nucleus, sorted_desc, jnp.inf),
                       axis=-1, keepdims=True)
    keep_p = logits >= thresh_p

    return jnp.where(keep_k & keep_p, logits, NEG_INF)


def sample(
    logits: jnp.ndarray,               # (B, V) any float dtype
    params: SamplingParams,
    rng: jax.Array,                    # single PRNG key
    *,
    token_counts: Optional[jnp.ndarray] = None,
    generated_counts: Optional[jnp.ndarray] = None,  # (B,) tokens emitted so far
    eos_token_id: Optional[int] = None,
) -> jnp.ndarray:
    """Full sampling chain -> next token ids (B,) int32.

    Greedy slots (temperature == 0) take argmax of the penalized logits;
    sampling slots apply temperature then top-k/top-p then categorical draw.
    Both paths are computed and selected per slot (no control flow under jit).
    """
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, params)
    logits = apply_logit_bias(logits, params)
    if eos_token_id is not None and generated_counts is not None:
        suppress = generated_counts < params.min_tokens
        logits = logits.at[:, eos_token_id].add(
            jnp.where(suppress, NEG_INF, 0.0))

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(_):
        temp = jnp.maximum(params.temperature, 1e-6)[:, None]
        scaled = logits / temp
        filtered = top_k_top_p_mask(scaled, params.top_k, params.top_p)
        tok = jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)
        return jnp.where(params.temperature > 0.0, tok, greedy_tok)

    # all-greedy batches skip the vocab sort entirely (lax.cond executes one
    # branch) — the sort is the most expensive op in the chain
    return jax.lax.cond(jnp.any(params.temperature > 0.0),
                        sampled, lambda _: greedy_tok, None)


def processed_probs(
    logits: jnp.ndarray,               # (B, V) any float dtype
    params: SamplingParams,
    *,
    token_counts: Optional[jnp.ndarray] = None,
    generated_counts: Optional[jnp.ndarray] = None,  # (B,)
    eos_ids: Optional[jnp.ndarray] = None,           # (B,) int32, -1 = none
) -> jnp.ndarray:
    """The explicit distribution `sample` draws from, as (B, V) f32 probs.

    Applies the identical chain (penalties -> min-tokens EOS suppression ->
    temperature -> top-k/top-p -> softmax); greedy slots (temperature == 0)
    come back as an exact one-hot at the argmax. Speculative verification
    (runtime/speculative.py) needs p materialized to accept/reject draft
    tokens with the right probabilities.
    """
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_penalties(logits, token_counts, params)
    logits = apply_logit_bias(logits, params)
    if eos_ids is not None and generated_counts is not None:
        suppress = (generated_counts < params.min_tokens) & (eos_ids >= 0)
        col = jnp.clip(eos_ids, 0, logits.shape[-1] - 1)
        logits = logits.at[jnp.arange(logits.shape[0]), col].add(
            jnp.where(suppress, NEG_INF, 0.0))
    v = logits.shape[-1]
    greedy = jax.nn.one_hot(jnp.argmax(logits, axis=-1), v, dtype=jnp.float32)
    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    filtered = top_k_top_p_mask(logits / temp, params.top_k, params.top_p)
    sampled = jax.nn.softmax(filtered, axis=-1)
    return jnp.where((params.temperature > 0.0)[:, None], sampled, greedy)


def logprobs_of(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Log-probability of the chosen tokens (B,) — for InferenceResult.logprobs
    (reference: inference_engine.hpp:46-51). Gather + logsumexp, no
    full-vocab log_softmax materialization."""
    logits = logits.astype(jnp.float32)
    chosen = jnp.take_along_axis(logits, tokens[:, None], axis=-1)[:, 0]
    return chosen - jax.scipy.special.logsumexp(logits, axis=-1)
