"""Speculative decoding: n-gram (prompt-lookup) drafting + exact verification.

New capability vs the reference (no speculative decoding anywhere in its
tree — see docs/roadmap.md item 10). One speculative step:

1. **Draft** K tokens per slot by matching the trailing n-gram of the slot's
   own token history (prompt + generated) against its earlier tokens and
   proposing the continuation of the most recent match (prompt-lookup
   decoding). Drafting is pure device math over a (B, S) history buffer —
   no draft model, no host round-trip.
2. **Verify** all K+1 positions with ONE target-model forward
   (models/transformer.forward_verify): logits[:, t] is the target
   distribution after input t.
3. **Accept** with the delta-draft special case of speculative sampling
   (Leviathan et al. 2023): a deterministic draft d is accepted with
   probability p(d) under the slot's full sampling chain
   (ops/sampling.processed_probs); on the first rejection the token is
   resampled from the residual (p with d removed, renormalized). The output
   distribution is *exactly* the target chain's — greedy output is
   bit-identical to normal decode, sampling output is unbiased.

Each step emits between 1 and K+1 tokens per slot for one forward pass; the
decode-step cost is dominated by weight HBM reads (batch-1-like arithmetic
intensity), so verifying K+1 positions costs barely more than one — the
speedup is the mean accepted length.

Cache discipline: position `lengths + t` holds input t's K/V. Emission is
always a prefix of the window, so the final `lengths + n_emitted` never
counts a stale (rejected) position; stale positions sit beyond `lengths`,
are masked by every masked attention read, and are overwritten as decoding
advances. Out-of-range writes near the cache end are dropped by JAX scatter
semantics (kvcache.append_tokens).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.transformer import TransformerConfig, forward_verify
from ..ops.sampling import logprobs_of, processed_probs


def init_history(batch_slots: int, max_seq: int) -> jnp.ndarray:
    """(B, S) int32 token-history buffer (prompt + generated, per slot)."""
    return jnp.zeros((batch_slots, max_seq), dtype=jnp.int32)


def draft_ngram(history: jnp.ndarray, hist_len: jnp.ndarray, ngram: int,
                k_draft: int) -> jnp.ndarray:
    """Prompt-lookup drafting. Returns (B, K) proposed tokens per slot.

    Finds the most recent position where the trailing `ngram` tokens of
    history[:hist_len] occurred before, and proposes the tokens that followed
    that occurrence. Slots with no match fall back to repeating their last
    token (cheap; usually rejected — costs nothing extra since the verify
    window has fixed shape anyway).
    """
    b, s = history.shape
    gram_pos = hist_len[:, None] - ngram + jnp.arange(ngram)[None, :]
    gram = jnp.take_along_axis(history, jnp.clip(gram_pos, 0, s - 1), axis=1)
    num_p = s - ngram + 1
    # wins[b, p, j] = history[b, p + j] — all candidate n-gram windows
    wins = jnp.stack([history[:, j:j + num_p] for j in range(ngram)], axis=-1)
    match = jnp.all(wins == gram[:, None, :], axis=-1)          # (B, num_p)
    p_idx = jnp.arange(num_p)[None, :]
    # the match must end strictly before the trailing gram itself
    legal = (p_idx + ngram) <= (hist_len[:, None] - 1)
    match = match & legal & (hist_len[:, None] >= ngram + 1)
    best = jnp.max(jnp.where(match, p_idx, -1), axis=1)         # (B,)
    found = best >= 0
    src = best[:, None] + ngram + jnp.arange(k_draft)[None, :]  # (B, K)
    cand = jnp.take_along_axis(history, jnp.clip(src, 0, s - 1), axis=1)
    last = jnp.take_along_axis(
        history, jnp.clip(hist_len - 1, 0, s - 1)[:, None], axis=1)
    return jnp.where(found[:, None], cand, last)


def _accept_window(logits, drafts, state, step_rng, counts, max_cache_len,
                   q_probs=None, guide_tables=None):
    """Sequentially accept/reject the K drafts + sample the bonus token.

    logits: (B, T, V) raw target logits (T = K + 1); drafts: (B, K).
    q_probs: (B, K, V) draft-model proposal distributions, or None for
    deterministic (prompt-lookup) drafts (the delta-distribution case).
    Acceptance follows speculative sampling (Leviathan et al. 2023):
    accept d with prob min(1, p(d)/q(d)); on the first rejection resample
    from the residual normalize(max(0, p - q)) — output distribution is
    exactly the target chain's for ANY draft distribution.

    guide_tables: optional stacked structured-output (allow (R, V), next
    (R, V)) tables (serving/structured.py). Guided slots mask each window
    position's target logits to the DFA row's allowed set BEFORE the
    sampling chain, then advance the row per accepted token — exactness of
    speculative sampling holds with the masked p as the target (any q). A
    guided slot reaching a state with no legal token terminates there
    (accept-only state, no EOS id — same as the decode core's no_move).

    Returns (emitted (B, T) int32 with -1 padding, lps (B, T) f32,
    new_counts, new_generated, terminated (B,) bool, guide_rows (B,) int32).

    Unrolled over T (static, small). `counts` is None on the no-penalty fast
    path — mirrors the decode core's lax.cond skip of the (B, V) scatter.
    """
    b, t, _ = logits.shape
    k_draft = t - 1
    sp = state.sampling
    rows = jnp.arange(b)

    guided = state.guide_state >= 0
    g_row = jnp.clip(state.guide_state, 0, None)
    if guide_tables is not None:
        g_allow, g_next = guide_tables
        g_row = jnp.clip(g_row, 0, g_allow.shape[0] - 1)

    emitting = state.active           # window-local: rejection consumes it
    terminated = jnp.zeros((b,), bool)  # slot-terminal: eos / max_tokens / cap
    gen = state.generated
    new_counts = counts
    emitted_cols, lp_cols = [], []
    for j in range(t):
        logits_j = logits[:, j]
        no_move = jnp.zeros((b,), bool)
        if guide_tables is not None:
            ok = g_allow[g_row] | ~guided[:, None]         # (B, V) bool
            no_move = guided & ~jnp.any(ok, axis=-1)
            logits_j = jnp.where(ok, logits_j, -1e30)
        p = processed_probs(
            logits_j, sp,
            token_counts=new_counts,
            generated_counts=gen,
            eos_ids=state.eos_id)
        if j < k_draft:
            d = drafts[:, j]
            pd = jnp.take_along_axis(p, d[:, None], axis=1)[:, 0]
            u = jax.random.uniform(jax.random.fold_in(step_rng, 2 * j), (b,))
            if q_probs is None:
                # deterministic draft: q = delta(d) => accept w.p. p(d),
                # residual = p with d removed
                acc = u < pd
                p_res = p.at[rows, d].set(0.0)
            else:
                q = q_probs[:, j]
                qd = jnp.take_along_axis(q, d[:, None], axis=1)[:, 0]
                acc = u * jnp.maximum(qd, 1e-20) < pd
                p_res = jnp.maximum(p - q, 0.0)
            p_res = p_res / jnp.maximum(
                jnp.sum(p_res, axis=-1, keepdims=True), 1e-20)
            res = jax.random.categorical(
                jax.random.fold_in(step_rng, 2 * j + 1),
                jnp.log(p_res + 1e-30), axis=-1).astype(jnp.int32)
            tok = jnp.where(acc, d, res)
        else:
            # bonus position: all K drafts accepted — sample from p directly
            acc = jnp.zeros((b,), bool)
            tok = jax.random.categorical(
                jax.random.fold_in(step_rng, 2 * j),
                jnp.log(p + 1e-30), axis=-1).astype(jnp.int32)

        emit = emitting & ~terminated & ~no_move
        terminated = terminated | (emitting & no_move)
        emitted_cols.append(jnp.where(emit, tok, -1))
        lp_cols.append(logprobs_of(logits_j, jnp.maximum(tok, 0)))
        if new_counts is not None:
            new_counts = new_counts.at[rows, tok].add(emit.astype(jnp.int32))
        gen = gen + emit.astype(jnp.int32)
        if guide_tables is not None:
            g_row = jnp.where(emit & guided, g_next[g_row, tok], g_row)
        hit_eos = (tok == state.eos_id) & (state.eos_id >= 0)
        hit_max = gen >= state.max_tokens
        # stop before the engine's cache-full frontier (max_seq - 1)
        hit_cap = (state.lengths + (j + 1)) >= (max_cache_len - 1)
        terminated = terminated | (emit & (hit_eos | hit_max | hit_cap))
        emitting = emitting & acc

    emitted = jnp.stack(emitted_cols, axis=1)     # (B, T)
    lps = jnp.stack(lp_cols, axis=1)              # (B, T)
    return emitted, lps, new_counts, gen, terminated, g_row


def spec_decode_core(params, cfg: TransformerConfig, caches, state,
                     history: jnp.ndarray, dtype=jnp.bfloat16, *,
                     k_draft: int, ngram: int,
                     window: Optional[int] = None, top_k_out: int = 0,
                     tp_axis: Optional[str] = None,
                     ep_axis: Optional[str] = None,
                     data_axis: Optional[str] = None,
                     guide_tables=None):
    """One speculative step for every slot.

    Returns (caches, state, history, emitted (B, T) int32 with -1 padding,
    lps (B, T), [topk (values, ids) each (B, T, k)]). T = k_draft + 1;
    emission is a prefix per slot (1..T tokens for active slots).

    guide_tables: optional structured-output tables — verification masks the
    target distribution per DFA state and advances the per-slot row on
    device (see _accept_window), so constrained decoding composes with
    speculation exactly.
    """
    b = state.tokens.shape[0]
    t = k_draft + 1
    stacked = not isinstance(caches, tuple)    # scan-over-layers cache
    max_cache_len = (caches.max_seq if stacked
                     else getattr(caches[0], "max_seq",
                                  None) or caches[0].k.shape[1])
    hist_len = state.lengths + 1     # cached tokens + the pending last token

    drafts = draft_ngram(history, hist_len, ngram, k_draft)       # (B, K)
    inputs = jnp.concatenate([state.tokens[:, None], drafts], axis=1)
    if stacked:
        from ..models.transformer import forward_verify_scan
        logits, caches = forward_verify_scan(
            params, cfg, inputs, caches, state.lengths, dtype=dtype,
            tp_axis=tp_axis, ep_axis=ep_axis, window=window)      # (B, T, V)
    else:
        logits, caches = forward_verify(params, cfg, inputs, caches,
                                        state.lengths, dtype=dtype,
                                        tp_axis=tp_axis, ep_axis=ep_axis,
                                        window=window)

    rng, step_rng = jax.random.split(state.rng)
    if data_axis is not None:
        # distinct acceptance/resample streams per data shard (same pattern
        # as the decode core)
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(data_axis))
    sp = state.sampling
    need_penalties = jnp.any(
        (sp.repetition_penalty != 1.0) | (sp.presence_penalty != 0.0)
        | (sp.frequency_penalty != 0.0))
    def _with_penalties():
        return _accept_window(logits, drafts, state, step_rng,
                              state.token_counts, max_cache_len,
                              guide_tables=guide_tables)

    def _without_penalties():
        e, lp, _, g, tm, gr = _accept_window(logits, drafts, state, step_rng,
                                             None, max_cache_len,
                                             guide_tables=guide_tables)
        return e, lp, state.token_counts, g, tm, gr

    emitted, lps, counts, gen, terminated, g_rows = jax.lax.cond(
        need_penalties, _with_penalties, _without_penalties)

    valid = emitted >= 0                                          # (B, T)
    n_new = jnp.sum(valid, axis=1).astype(jnp.int32)              # (B,)
    last_idx = jnp.clip(n_new - 1, 0, t - 1)
    last_tok = jnp.take_along_axis(emitted, last_idx[:, None], axis=1)[:, 0]
    last_lp = jnp.take_along_axis(lps, last_idx[:, None], axis=1)[:, 0]
    active = state.active
    got_any = active & (n_new > 0)

    # history append: emitted token j lands at hist position hist_len + j;
    # invalid columns write out of range (dropped).
    s_hist = history.shape[1]
    hist_pos = jnp.where(valid, hist_len[:, None] + jnp.arange(t)[None, :],
                         s_hist)
    history = history.at[jnp.arange(b)[:, None], hist_pos].set(
        jnp.maximum(emitted, 0), mode="drop")

    new_state = state._replace(
        tokens=jnp.where(got_any, last_tok, state.tokens),
        lengths=state.lengths + n_new,
        active=active & ~terminated,
        generated=gen,
        token_counts=counts,
        last_logprob=jnp.where(got_any, last_lp, state.last_logprob),
        guide_state=jnp.where(state.guide_state >= 0, g_rows,
                              state.guide_state),
        rng=rng,
    )
    if top_k_out:
        logp = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True)
        tv, ti = jax.lax.top_k(logp, top_k_out)           # (B, T, k)
        return caches, new_state, history, emitted, lps, (tv, ti.astype(jnp.int32))
    return caches, new_state, history, emitted, lps


spec_decode_step = partial(
    jax.jit,
    static_argnames=("cfg", "dtype", "k_draft", "ngram", "window",
                     "top_k_out", "tp_axis", "ep_axis", "data_axis"),
    donate_argnames=("caches", "state", "history"))(spec_decode_core)


class SpecStats(NamedTuple):
    """Host-side speculative efficiency counters."""

    steps: int = 0
    emitted: int = 0

    @property
    def mean_accepted(self) -> float:
        return self.emitted / max(self.steps, 1)


# ---------------------------------------------------------------------------
# Draft-MODEL speculation: a small model proposes K tokens, the target
# verifies them in one pass. Unlike prompt-lookup, helps on any text; the
# acceptance uses the draft's true proposal distribution q (see
# _accept_window) so the output distribution is exactly the target's for any
# draft model sharing the tokenizer/vocab.
# ---------------------------------------------------------------------------

def spec_decode_draft_core(params, draft_params, cfg: TransformerConfig,
                           draft_cfg: TransformerConfig, caches, draft_caches,
                           state, dtype=jnp.bfloat16, *, k_draft: int,
                           window: Optional[int] = None,
                           top_k_out: int = 0,
                           tp_axis: Optional[str] = None,
                           ep_axis: Optional[str] = None,
                           data_axis: Optional[str] = None,
                           guide_tables=None):
    """One draft-model speculative step for every slot.

    The draft model runs K sequential decode steps (its own KV caches, the
    shared lengths state), proposing d_j ~ q_j through the same per-slot
    sampling chain (penalty-free q — exactness holds for ANY proposal; the
    penalty-free draft just accepts slightly less often for penalty users).
    Both caches follow the same discipline: position lengths+j holds input
    j's K/V; stale positions are masked by `lengths`.

    guide_tables: structured outputs compose in both phases — the DRAFT
    masks its proposal to the grammar and walks a hypothetical DFA path
    (all-accepted), so guided drafts rarely violate the grammar; the
    VERIFY acceptance uses that masked q against the masked target p
    (exact for any q — _accept_window).

    Returns (caches, draft_caches, state, emitted (B, T), lps (B, T)[,
    topk]).
    """
    b = state.tokens.shape[0]
    t = k_draft + 1
    stacked = not isinstance(caches, tuple)
    max_cache_len = (caches.max_seq if stacked
                     else getattr(caches[0], "max_seq",
                                  None) or caches[0].k.shape[1])
    rng, step_rng, draft_rng = jax.random.split(state.rng, 3)
    if data_axis is not None:
        idx = jax.lax.axis_index(data_axis)
        step_rng = jax.random.fold_in(step_rng, idx)
        draft_rng = jax.random.fold_in(draft_rng, idx)
    sp = state.sampling
    guided = state.guide_state >= 0
    if guide_tables is not None:
        g_allow, g_next = guide_tables
        g_row0 = jnp.clip(state.guide_state, 0, g_allow.shape[0] - 1)
    else:
        g_row0 = jnp.zeros((b,), jnp.int32)

    from ..models.transformer import forward_decode, forward_decode_scan
    d_stacked = not isinstance(draft_caches, tuple)

    def draft_body(carry, j):
        tok, lengths, d_row, dcaches = carry
        if d_stacked:
            logits, dcaches = forward_decode_scan(
                draft_params, draft_cfg, tok, dcaches, lengths, dtype=dtype,
                tp_axis=tp_axis, ep_axis=ep_axis, window=window)
        else:
            logits, dcaches = forward_decode(
                draft_params, draft_cfg, tok, dcaches, lengths, dtype=dtype,
                tp_axis=tp_axis, ep_axis=ep_axis, window=window)
        if guide_tables is not None:
            ok = g_allow[d_row] | ~guided[:, None]           # (B, V)
            logits = jnp.where(ok, logits.astype(jnp.float32), -1e30)
        q = processed_probs(logits, sp)                      # (B, V)
        d = jax.random.categorical(
            jax.random.fold_in(draft_rng, j),
            jnp.log(q + 1e-30), axis=-1).astype(jnp.int32)
        if guide_tables is not None:
            d_ok = jnp.take_along_axis(ok, d[:, None], axis=1)[:, 0]
            d_row = jnp.where(guided & d_ok, g_next[d_row, d], d_row)
        return (d, lengths + 1, d_row, dcaches), (d, q)

    (_, _, _, draft_caches), (drafts_k, qs_k) = jax.lax.scan(
        draft_body, (state.tokens, state.lengths, g_row0, draft_caches),
        jnp.arange(k_draft))
    drafts = jnp.transpose(drafts_k)                         # (B, K)
    q_probs = jnp.transpose(qs_k, (1, 0, 2))                 # (B, K, V)

    inputs = jnp.concatenate([state.tokens[:, None], drafts], axis=1)
    if stacked:
        from ..models.transformer import forward_verify_scan
        logits, caches = forward_verify_scan(
            params, cfg, inputs, caches, state.lengths, dtype=dtype,
            tp_axis=tp_axis, ep_axis=ep_axis, window=window)
    else:
        logits, caches = forward_verify(params, cfg, inputs, caches,
                                        state.lengths, dtype=dtype,
                                        tp_axis=tp_axis, ep_axis=ep_axis,
                                        window=window)

    need_penalties = jnp.any(
        (sp.repetition_penalty != 1.0) | (sp.presence_penalty != 0.0)
        | (sp.frequency_penalty != 0.0))

    def _with_penalties():
        return _accept_window(logits, drafts, state, step_rng,
                              state.token_counts, max_cache_len,
                              q_probs=q_probs, guide_tables=guide_tables)

    def _without_penalties():
        e, lp, _, g, tm, gr = _accept_window(logits, drafts, state, step_rng,
                                             None, max_cache_len,
                                             q_probs=q_probs,
                                             guide_tables=guide_tables)
        return e, lp, state.token_counts, g, tm, gr

    emitted, lps, counts, gen, terminated, g_rows = jax.lax.cond(
        need_penalties, _with_penalties, _without_penalties)

    valid = emitted >= 0
    n_new = jnp.sum(valid, axis=1).astype(jnp.int32)
    last_idx = jnp.clip(n_new - 1, 0, t - 1)
    last_tok = jnp.take_along_axis(emitted, last_idx[:, None], axis=1)[:, 0]
    last_lp = jnp.take_along_axis(lps, last_idx[:, None], axis=1)[:, 0]
    active = state.active
    got_any = active & (n_new > 0)

    new_state = state._replace(
        tokens=jnp.where(got_any, last_tok, state.tokens),
        lengths=state.lengths + n_new,
        active=active & ~terminated,
        generated=gen,
        token_counts=counts,
        last_logprob=jnp.where(got_any, last_lp, state.last_logprob),
        guide_state=jnp.where(state.guide_state >= 0, g_rows,
                              state.guide_state),
        rng=rng,
    )
    if top_k_out:
        logp = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True)
        tv, ti = jax.lax.top_k(logp, top_k_out)
        return (caches, draft_caches, new_state, emitted, lps,
                (tv, ti.astype(jnp.int32)))
    return caches, draft_caches, new_state, emitted, lps


spec_decode_draft_step = partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "dtype", "k_draft", "window",
                     "top_k_out", "tp_axis", "ep_axis", "data_axis"),
    donate_argnames=("caches", "draft_caches", "state"))(spec_decode_draft_core)


def spec_decode_multi_core(params, cfg: TransformerConfig, caches, state,
                           history, dtype=jnp.bfloat16, *, k_draft: int,
                           ngram: int, window: Optional[int] = None,
                           num_steps: int = 1, top_k_out: int = 0,
                           tp_axis: Optional[str] = None,
                           ep_axis: Optional[str] = None,
                           data_axis: Optional[str] = None,
                           guide_tables=None):
    """num_steps speculative steps in ONE compiled program — emitted
    (N, B, T). Amortizes per-dispatch runtime overhead exactly like
    _decode_multi_core (engine.RuntimeConfig.decode_steps_per_dispatch);
    with acceptance a, one dispatch advances up to N * (K + 1) tokens."""

    def body(carry, _):
        caches, state, history = carry
        out = spec_decode_core(params, cfg, caches, state, history, dtype,
                               k_draft=k_draft, ngram=ngram, window=window,
                               top_k_out=top_k_out, tp_axis=tp_axis,
                               ep_axis=ep_axis, data_axis=data_axis,
                               guide_tables=guide_tables)
        if top_k_out:
            caches, state, history, emitted, lps, topks = out
        else:
            caches, state, history, emitted, lps = out
            topks = (jnp.zeros((1,)), jnp.zeros((1,)))
        return (caches, state, history), (emitted, lps, topks)

    (caches, state, history), (emitted, lps, topks) = jax.lax.scan(
        body, (caches, state, history), None, length=num_steps)
    if top_k_out:
        return caches, state, history, emitted, lps, topks
    return caches, state, history, emitted, lps


spec_decode_multi_step = partial(
    jax.jit,
    static_argnames=("cfg", "dtype", "k_draft", "ngram", "window",
                     "num_steps", "top_k_out", "tp_axis", "ep_axis",
                     "data_axis"),
    donate_argnames=("caches", "state", "history"))(spec_decode_multi_core)


def spec_decode_draft_multi_core(params, draft_params, cfg, draft_cfg,
                                 caches, draft_caches, state,
                                 dtype=jnp.bfloat16, *, k_draft: int,
                                 window: Optional[int] = None,
                                 num_steps: int = 1, top_k_out: int = 0,
                                 tp_axis: Optional[str] = None,
                                 ep_axis: Optional[str] = None,
                                 data_axis: Optional[str] = None,
                                 guide_tables=None):
    """num_steps draft-model speculative steps in one compiled program."""

    def body(carry, _):
        caches, draft_caches, state = carry
        out = spec_decode_draft_core(params, draft_params, cfg, draft_cfg,
                                     caches, draft_caches, state, dtype,
                                     k_draft=k_draft, window=window,
                                     top_k_out=top_k_out, tp_axis=tp_axis,
                                     ep_axis=ep_axis, data_axis=data_axis,
                                     guide_tables=guide_tables)
        if top_k_out:
            caches, draft_caches, state, emitted, lps, topks = out
        else:
            caches, draft_caches, state, emitted, lps = out
            topks = (jnp.zeros((1,)), jnp.zeros((1,)))
        return (caches, draft_caches, state), (emitted, lps, topks)

    (caches, draft_caches, state), (emitted, lps, topks) = jax.lax.scan(
        body, (caches, draft_caches, state), None, length=num_steps)
    if top_k_out:
        return caches, draft_caches, state, emitted, lps, topks
    return caches, draft_caches, state, emitted, lps


spec_decode_draft_multi_step = partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "dtype", "k_draft", "window",
                     "num_steps", "top_k_out", "tp_axis", "ep_axis",
                     "data_axis"),
    donate_argnames=("caches", "draft_caches", "state"))(
        spec_decode_draft_multi_core)
