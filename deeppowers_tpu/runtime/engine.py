"""Inference engine: jitted prefill/decode steps + slot-based continuous batching.

TPU-native replacement for the reference's InferenceEngine + GPTModel generate
loop (reference: src/core/inference/inference_engine.cpp:23-256 generate /
generate_batch / generate_stream; src/core/execution/models/gpt_model.cpp:57-137)
with the architecture gaps fixed:

- The reference re-feeds the whole sequence each token (its KV cache is
  allocated but never consumed — inference_engine.cpp:60-92). Here decode is a
  single fixed-shape jitted step over the KV cache, compiled once.
- The reference samples on the host per token (O(V log V) CPU round-trip).
  Here sampling is inside the jitted step (ops/sampling.py).
- The reference batches at request level (dynamic batching). Here the decode
  step always runs over B fixed slots with an active mask: requests join and
  leave between steps without recompilation — token-level continuous batching
  (SURVEY.md §7 build plan item 4).

KV caches and decode state are *donated* to each step so XLA updates HBM
buffers in place.
"""

from __future__ import annotations

import time
import zlib
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GenerationConfig, RuntimeConfig
from ..models.transformer import (
    TransformerConfig,
    forward_decode,
    forward_prefill,
    forward_prefill_chunk,
)
from ..ops.sampling import (LOGIT_BIAS_SLOTS, SamplingParams, logprobs_of,
                            sample)
from . import kvcache


class NoFreePages(RuntimeError):
    """The paged-KV pool cannot cover a request's token budget right now —
    retry after running requests release pages (transient, not a request
    error)."""


class DecodeState(NamedTuple):
    """Per-slot decode state, all arrays of leading dim B (pytree)."""

    tokens: jnp.ndarray          # (B,) int32 — last token (next step's input)
    lengths: jnp.ndarray         # (B,) int32 — tokens currently in cache
    active: jnp.ndarray          # (B,) bool
    generated: jnp.ndarray       # (B,) int32 — tokens emitted per slot
    max_tokens: jnp.ndarray      # (B,) int32
    eos_id: jnp.ndarray          # (B,) int32 (-1 => no EOS check)
    token_counts: jnp.ndarray    # (B, V) int32 — for penalties
    last_logprob: jnp.ndarray    # (B,) f32 — logprob of last sampled token
    guide_state: jnp.ndarray     # (B,) int32 — structured-output DFA row in
                                 # the engine's stacked guide tables; -1 =
                                 # unconstrained (serving/structured.py)
    sampling: SamplingParams
    rng: jax.Array


@jax.jit
def _snapshot_state(active, lengths, eos_id):
    """Fresh (non-donated) copies of the tiny per-slot state fields a
    pipelined harvest reads after the next dispatch has consumed the
    donated state buffers."""
    return active | False, lengths + 0, eos_id + 0


def _expert_bytes(params) -> int:
    """Total stored bytes of stacked MoE expert weights (0 for dense)."""
    total = 0
    layers = params["layers"]
    for layer in (layers if isinstance(layers, list) else [layers]):
        moe = layer.get("moe") if isinstance(layer, dict) else None
        if moe and "experts" in moe:
            for node in moe["experts"].values():
                w = node.get("w")
                data = getattr(w, "data", w)
                if hasattr(data, "nbytes"):
                    total += data.nbytes
    return total


def init_state(batch_slots: int, vocab_size: int, rng: jax.Array) -> DecodeState:
    b = batch_slots
    # distinct buffers per field — fields of one donated pytree must not
    # alias (XLA rejects donating the same buffer twice)
    zeros_i = lambda: jnp.zeros((b,), dtype=jnp.int32)  # noqa: E731
    return DecodeState(
        tokens=zeros_i(),
        lengths=zeros_i(),
        active=jnp.zeros((b,), dtype=bool),
        generated=zeros_i(),
        max_tokens=zeros_i(),
        eos_id=jnp.full((b,), -1, dtype=jnp.int32),
        token_counts=jnp.zeros((b, vocab_size), dtype=jnp.int32),
        last_logprob=jnp.zeros((b,), dtype=jnp.float32),
        guide_state=jnp.full((b,), -1, dtype=jnp.int32),
        sampling=SamplingParams(
            temperature=jnp.zeros((b,)), top_k=zeros_i(),
            top_p=jnp.ones((b,)), repetition_penalty=jnp.ones((b,)),
            presence_penalty=jnp.zeros((b,)), frequency_penalty=jnp.zeros((b,)),
            min_tokens=zeros_i(),
            bias_ids=jnp.full((b, LOGIT_BIAS_SLOTS), -1, dtype=jnp.int32),
            bias_vals=jnp.zeros((b, LOGIT_BIAS_SLOTS), dtype=jnp.float32),
        ),
        rng=rng,
    )


# ---------------------------------------------------------------------------
# Step cores: pure functions, parallel-axis aware. Called directly (single
# device) or per-shard inside shard_map (parallel/engine.py).
# ---------------------------------------------------------------------------

def _prefill_core(params, cfg: TransformerConfig, caches, input_ids, length,
                  slot, dtype=jnp.bfloat16, tp_axis=None, ep_axis=None,
                  data_axis=None):
    """Prefill one request (batch 1, padded to a bucket) into cache `slot`.

    Returns (caches, last_token_logits (V,) f32). Under data parallelism the
    slot index is global; each data shard translates it to a local index and
    masks the write if the slot lives elsewhere.
    """
    if not isinstance(caches, tuple):      # stacked cache => scan-over-layers
        from ..models.transformer import forward_prefill_scan
        if data_axis is not None:
            # translate the global slot to this data shard's local index;
            # shards that don't own it write at local_B (scatter drops it)
            local_b = caches.k.shape[1]
            local_slot = slot - jax.lax.axis_index(data_axis) * local_b
            in_range = (local_slot >= 0) & (local_slot < local_b)
            slot = jnp.where(in_range, jnp.clip(local_slot, 0, local_b - 1),
                             local_b)
        return forward_prefill_scan(params, cfg, input_ids, length, slot,
                                    caches, dtype=dtype, tp_axis=tp_axis,
                                    ep_axis=ep_axis)
    lengths = length[None]                                  # (1,)
    logits, kv = forward_prefill(params, cfg, input_ids[None], lengths,
                                 dtype=dtype, tp_axis=tp_axis, ep_axis=ep_axis)
    if data_axis is not None:
        first = caches[0]
        # paged caches: slot rows live in the (data-sharded) page table
        local_b = (first.table.shape[0] if hasattr(first, "table")
                   else first.k.shape[0])
        local_slot = slot - jax.lax.axis_index(data_axis) * local_b
        in_range = (local_slot >= 0) & (local_slot < local_b)
        write_slot = jnp.clip(local_slot, 0, local_b - 1)
    else:
        in_range, write_slot = None, slot
    new_caches = []
    for cache, (k, v) in zip(caches, kv):
        written = kvcache.write_prompt(cache, k[0], v[0], write_slot)
        if in_range is not None:
            written = jax.tree_util.tree_map(
                lambda new, old: jnp.where(in_range, new, old), written, cache)
        new_caches.append(written)
    last = logits[0, length - 1]                            # (V,)
    return tuple(new_caches), last


_prefill_step = partial(jax.jit, static_argnames=("cfg", "dtype"),
                        donate_argnames=("caches",))(_prefill_core)


def _prefill_cp_core(params, cfg: TransformerConfig, caches, input_ids,
                     length, slot, dtype=jnp.bfloat16, *, seq_axis,
                     tp_axis=None, ep_axis=None):
    """Context-parallel prefill: ONE request with its sequence sharded over
    `seq_axis` (ring attention). Each shard computes S/p of the quadratic
    attention and of the activations — long prompts whose S^2 scores or S*H
    activations exceed one chip prefill across the mesh (SURVEY.md §5.7
    plan; new capability vs the reference's hard 2048 cap).

    input_ids: (S/p,) LOCAL chunk (sharded in_spec). The per-layer K/V
    chunks are all-gathered over the ring axis and written to the slot's
    cache row; the same axis doubles as the decode slot axis, so the write
    is masked to the owning shard (slot is global). All three cache
    layouts compose (VERDICT round 1 item 2): contiguous tuple, paged
    tuple (page scatter on the owning shard's pool), and scan-over-layers
    stacked (the ring body runs inside lax.scan)."""
    from ..ops.ring_attention import ring_attention
    from ..models.transformer import (_attn_tail, _embed, _logits, _norm,
                                      _qkv, _scan_layers)
    from ..ops.rotary import apply_rope

    c = input_ids.shape[0]                          # local chunk length
    my = jax.lax.axis_index(seq_axis)
    positions = my * c + jnp.arange(c)              # global positions
    x = _embed(params, cfg, input_ids[None], positions[None], dtype)
    lengths1 = length[None]

    stacked = not isinstance(caches, tuple)
    if stacked:
        local_b = caches.k.shape[1]
    else:
        first = caches[0]
        local_b = (first.table.shape[0] if hasattr(first, "table")
                   else first.k.shape[0])
    local_slot = slot - my * local_b
    in_range = (local_slot >= 0) & (local_slot < local_b)
    write_slot = jnp.clip(local_slot, 0, local_b - 1)

    def layer_fwd(x, layer):
        """Ring-attention layer body -> (x, full-sequence (K, V))."""
        ap = layer["attn"]
        xn = _norm(x, layer["ln1"], cfg)
        q, k, v = _qkv(xn, ap, cfg)
        if cfg.positions == "rope":
            q = apply_rope(q, positions[None], theta=cfg.rope_theta)
            k = apply_rope(k, positions[None], theta=cfg.rope_theta)
        attn = ring_attention(q, k, v, seq_axis, lengths=lengths1)
        # gather the full-sequence K/V for the owning shard's cache write
        k_full = jax.lax.all_gather(k[0], seq_axis, axis=0, tiled=True)
        v_full = jax.lax.all_gather(v[0], seq_axis, axis=0, tiled=True)
        attn = attn.reshape(1, c, cfg.q_size)
        return _attn_tail(x, attn, ap, layer, cfg, tp_axis, ep_axis), \
            (k_full, v_full)

    if stacked:
        from . import kvcache_stacked as st
        # write_*_layer drops out-of-range slots (scatter semantics)
        drop_slot = jnp.where(in_range, write_slot, local_b)

        def body(x, cache, i, layer):
            x, (kf, vf) = layer_fwd(x, layer)
            return x, st.write_prompt_layer(cache, i, kf, vf, drop_slot)

        x, new_caches = _scan_layers(params, caches, x, body)
    else:
        new_caches = []
        for layer, cache in zip(params["layers"], caches):
            x, (kf, vf) = layer_fwd(x, layer)
            written = kvcache.write_prompt(cache, kf, vf, write_slot)
            written = jax.tree_util.tree_map(
                lambda new, old: jnp.where(in_range, new, old), written,
                cache)
            new_caches.append(written)
        new_caches = tuple(new_caches)

    logits = _logits(params, cfg, x, tp_axis)[0]    # (C, V) local
    # the shard owning global position length-1 contributes the last logits
    own_idx = (length - 1) // c
    local_idx = jnp.clip((length - 1) - my * c, 0, c - 1)
    last = jnp.where(own_idx == my, logits[local_idx], 0.0)
    last = jax.lax.psum(last, seq_axis)
    if not stacked:
        new_caches = tuple(new_caches)
    return new_caches, last


def _prefill_chunk_core(params, cfg: TransformerConfig, caches, input_ids,
                        slot, start, dtype=jnp.bfloat16, window=None,
                        tp_axis=None, ep_axis=None, data_axis=None):
    """One chunk of a chunked prefill (single request).

    Under data parallelism the slot is global: the owning shard writes its
    cache and contributes the logits (chunk attention reads the slot's
    PRIOR cache rows, which only the owner holds — non-owner logits are
    garbage and masked out of the psum)."""
    stacked = not isinstance(caches, tuple)
    if data_axis is not None:
        if stacked:
            local_b = caches.k.shape[1]
        else:
            first = caches[0]
            local_b = (first.table.shape[0] if hasattr(first, "table")
                       else first.k.shape[0])
        local_slot = slot - jax.lax.axis_index(data_axis) * local_b
        in_range = (local_slot >= 0) & (local_slot < local_b)
        slot_w = jnp.clip(local_slot, 0, local_b - 1)
    else:
        in_range, slot_w = None, slot
    if stacked:                            # scan-over-layers
        from ..models.transformer import forward_prefill_chunk_scan
        logits, new_caches = forward_prefill_chunk_scan(
            params, cfg, input_ids, caches, slot_w, start, dtype=dtype,
            window=window, tp_axis=tp_axis, ep_axis=ep_axis)
    else:
        logits, new_caches = forward_prefill_chunk(
            params, cfg, input_ids, caches, slot_w, start, dtype=dtype,
            window=window, tp_axis=tp_axis, ep_axis=ep_axis)
    if in_range is not None:
        new_caches = jax.tree_util.tree_map(
            lambda new, old: jnp.where(in_range, new, old), new_caches,
            caches)
        logits = jax.lax.psum(jnp.where(in_range, logits, 0.0), data_axis)
    return new_caches, logits


def _decode_core(params, cfg: TransformerConfig, caches, state: DecodeState,
                 dtype=jnp.bfloat16, tp_axis=None, ep_axis=None,
                 data_axis=None, window=None, top_k_out: int = 0,
                 guide_tables=None):
    """One token for every active slot. Returns (caches, state, emitted (B,)).

    Inactive slots still flow through the math (masked out at state update) —
    fixed shape beats wasted flops at serving batch sizes.

    guide_tables: optional (allow (R, V) bool, next (R, V) int) stacked
    structured-output tables; guided slots (guide_state >= 0) have logits
    masked to the DFA row's allowed set and advance the row on-device — the
    automaton runs inside the compiled step, so constrained decoding composes
    with multi-step dispatch at zero host round-trips.
    """
    if not isinstance(caches, tuple):      # stacked cache => scan-over-layers
        from ..models.transformer import forward_decode_scan
        logits, caches = forward_decode_scan(
            params, cfg, state.tokens, caches, state.lengths, dtype=dtype,
            tp_axis=tp_axis, ep_axis=ep_axis, window=window)
    else:
        logits, caches = forward_decode(params, cfg, state.tokens, caches,
                                        state.lengths, dtype=dtype,
                                        tp_axis=tp_axis, ep_axis=ep_axis,
                                        window=window)
    rng, step_rng = jax.random.split(state.rng)   # rng stays replicated
    if data_axis is not None:
        # distinct sampling stream per data shard, same across tp/ep shards
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(data_axis))
    sp = state.sampling
    # min_tokens: suppress each slot's EOS logit until it has generated
    # enough (HF min_new_tokens semantics — EOS must not even be sampled).
    b_ = logits.shape[0]
    suppress = (state.generated < sp.min_tokens) & (state.eos_id >= 0)
    eos_col = jnp.clip(state.eos_id, 0, logits.shape[1] - 1)
    logits = logits.at[jnp.arange(b_), eos_col].add(
        jnp.where(suppress, -1e30, 0.0))
    guided = state.guide_state >= 0
    guide_row = jnp.clip(state.guide_state, 0, None)
    no_move = jnp.zeros_like(guided)
    if guide_tables is not None:
        g_allow, g_next = guide_tables
        guide_row = jnp.clip(guide_row, 0, g_allow.shape[0] - 1)
        rows = g_allow[guide_row] | ~guided[:, None]       # (B, V) bool
        # a guided slot with no legal token (accept-only state, no EOS id)
        # must stop rather than emit a masked-garbage token
        no_move = guided & ~jnp.any(rows, axis=-1)
        logits = jnp.where(rows, logits, -1e30)
    # Penalties (and the (B, V) token-count scatter that feeds them) are
    # skipped entirely when no active slot uses them — a joining request's
    # counts start from its prompt at admission, so flipping the branch on
    # is exact.
    need_penalties = jnp.any(
        (sp.repetition_penalty != 1.0) | (sp.presence_penalty != 0.0)
        | (sp.frequency_penalty != 0.0))
    next_tokens = jax.lax.cond(
        need_penalties,
        lambda: sample(logits, sp, step_rng,
                       token_counts=state.token_counts,
                       generated_counts=state.generated),
        lambda: sample(logits, sp, step_rng,
                       generated_counts=state.generated))
    lp = logprobs_of(logits, next_tokens)

    active = state.active & ~no_move
    new_lengths = jnp.where(active, state.lengths + 1, state.lengths)
    new_generated = jnp.where(active, state.generated + 1, state.generated)
    hit_eos = (next_tokens == state.eos_id) & (state.eos_id >= 0) & (
        new_generated >= jnp.maximum(state.sampling.min_tokens, 1))
    hit_max = new_generated >= state.max_tokens
    # Cache-capacity guard IN-DEVICE: a multi-step dispatch otherwise keeps
    # decoding rows past the KV storage when the remaining room is not a
    # multiple of the dispatch depth (boundary corruption: appends drop,
    # attention reads stale rows). The host-side max_seq retire only runs
    # between dispatches.
    first_cache = caches[0] if isinstance(caches, tuple) else caches
    cap = getattr(first_cache, "max_seq", None)
    if cap is None and hasattr(first_cache, "k"):
        cap = first_cache.k.shape[1]
    # cap - 1 matches the host-side retire (`lengths >= max_seq - 1`), so
    # token counts are depth-invariant
    hit_cap = (new_lengths >= cap - 1) if cap is not None else False
    still_active = active & ~hit_eos & ~hit_max & ~hit_cap

    b = next_tokens.shape[0]
    counts = jax.lax.cond(
        need_penalties,
        lambda: state.token_counts.at[jnp.arange(b), next_tokens].add(
            active.astype(jnp.int32)),
        lambda: state.token_counts)
    emitted = jnp.where(active, next_tokens, -1)

    new_guide = state.guide_state
    if guide_tables is not None:
        nxt_row = guide_tables[1][guide_row, next_tokens].astype(jnp.int32)
        new_guide = jnp.where(guided & active, nxt_row, state.guide_state)

    new_state = state._replace(
        tokens=jnp.where(active, next_tokens, state.tokens),
        lengths=new_lengths,
        active=still_active,
        generated=new_generated,
        token_counts=counts,
        last_logprob=lp,
        guide_state=new_guide,
        rng=rng,
    )
    if top_k_out:
        logp = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True)
        tv, ti = jax.lax.top_k(logp, top_k_out)
        return caches, new_state, emitted, (tv, ti.astype(jnp.int32))
    return caches, new_state, emitted


_decode_step = partial(
    jax.jit,
    static_argnames=("cfg", "dtype", "tp_axis", "ep_axis", "data_axis",
                     "window"),
    donate_argnames=("caches", "state"))(_decode_core)


def _decode_multi_core(params, cfg: TransformerConfig, caches, state,
                       dtype=jnp.bfloat16, tp_axis=None, ep_axis=None,
                       data_axis=None, window=None, num_steps: int = 1,
                       top_k_out: int = 0, guide_tables=None):
    """num_steps decode steps in one compiled program -> emitted (N, B).

    Per-dispatch host/runtime overhead is amortized across N tokens per slot
    (crucial on remote-tunneled runtimes where a dispatch costs ~30ms).
    Slots that retire mid-scan stay inactive (emitted -1) — the on-device
    active mask already handles it.
    """

    def body(carry, _):
        caches, state = carry
        out = _decode_core(
            params, cfg, caches, state, dtype, tp_axis=tp_axis,
            ep_axis=ep_axis, data_axis=data_axis, window=window,
            top_k_out=top_k_out, guide_tables=guide_tables)
        caches, state, emitted = out[:3]
        topk = out[3] if top_k_out else (jnp.zeros((1,)), jnp.zeros((1,)))
        return (caches, state), (emitted, state.last_logprob, topk)

    (caches, state), (emitted, lps, topks) = jax.lax.scan(
        body, (caches, state), None, length=num_steps)
    if top_k_out:
        return caches, state, emitted, lps, topks
    return caches, state, emitted, lps


_decode_multi = partial(
    jax.jit,
    static_argnames=("cfg", "dtype", "tp_axis", "ep_axis", "data_axis",
                     "window", "num_steps", "top_k_out"),
    donate_argnames=("caches", "state"))(_decode_multi_core)


def _first_token_core(last_logits, sp1: SamplingParams, rng, padded_ids,
                      eos_id, top_k_out: int = 0, guide_row=None):
    """Sample a request's first token from its prefill logits — the whole
    chain (prompt-count scatter, EOS suppression, penalties, sampling,
    logprob, optional top-k) in ONE compiled program. Eagerly this was ~40
    per-op dispatches, which dominated TTFT on remote-tunneled runtimes.

    padded_ids is the bucket-padded prompt with pad value == vocab_size —
    out-of-range scatter indices are dropped, so counts are exact."""
    v = last_logits.shape[0]
    counts = jnp.zeros((1, v), dtype=jnp.int32).at[0, padded_ids].add(
        1, mode="drop")
    # min_tokens: EOS must not be sampled as the very first token either
    suppress = (sp1.min_tokens[0] > 0) & (eos_id >= 0)
    col = jnp.clip(eos_id, 0, v - 1)
    adj = last_logits.at[col].add(jnp.where(suppress, -1e30, 0.0))
    if guide_row is not None:       # structured output: initial-state mask
        adj = jnp.where(guide_row, adj, -1e30)
    tok = sample(adj[None], sp1, rng, token_counts=counts)
    lp = logprobs_of(last_logits[None], tok)
    counts = counts.at[0, tok[0]].add(1)
    if top_k_out:
        logp = last_logits - jax.scipy.special.logsumexp(last_logits)
        tv, ti = jax.lax.top_k(logp, top_k_out)
        return tok, lp, counts, (tv, ti.astype(jnp.int32))
    return tok, lp, counts, ()


_first_token_step = partial(jax.jit, static_argnames=("top_k_out",))(
    _first_token_core)


def _install_slot_core(state: DecodeState, slot, first_tok, first_lp,
                       counts_row, n, max_tokens, eos_id,
                       sp1: SamplingParams, guide_state) -> DecodeState:
    """Install one request into the batched decode state (one compiled
    scatter program instead of ~12 eager ones)."""
    return state._replace(
        tokens=state.tokens.at[slot].set(first_tok),
        lengths=state.lengths.at[slot].set(n),
        active=state.active.at[slot].set(True),
        generated=state.generated.at[slot].set(1),
        max_tokens=state.max_tokens.at[slot].set(max_tokens),
        eos_id=state.eos_id.at[slot].set(eos_id),
        token_counts=state.token_counts.at[slot].set(counts_row),
        last_logprob=state.last_logprob.at[slot].set(first_lp),
        guide_state=state.guide_state.at[slot].set(guide_state),
        sampling=SamplingParams(*[
            getattr(state.sampling, f).at[slot].set(getattr(sp1, f)[0])
            for f in SamplingParams._fields
        ]),
    )


_install_slot_step = partial(jax.jit, donate_argnames=("state",))(
    _install_slot_core)


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------

@dataclass
class _PendingPrefill:
    """Host-side state of an in-progress chunked prefill."""

    ids: np.ndarray
    gen: GenerationConfig
    request_id: str
    pos: int = 0


@dataclass
class SlotResult:
    """Accumulates one request's output on the host."""

    request_id: str
    prompt_len: int
    max_tokens: int = 0
    stop_token_ids: Tuple[int, ...] = ()
    token_ids: List[int] = field(default_factory=list)
    logprobs: List[float] = field(default_factory=list)
    # per emitted token: [(candidate_id, logprob), ...] when
    # RuntimeConfig.emit_top_logprobs > 0
    top_tokens: List[List[Tuple[int, float]]] = field(default_factory=list)
    guided: bool = False               # structured-output constrained
    stop_reason: str = ""              # "eos" | "max_tokens" | "stop_string"
    #                                  | "cancelled" | "guide_complete" | ...
    start_time: float = 0.0
    first_token_time: float = 0.0
    end_time: float = 0.0

    @property
    def ttft_ms(self) -> float:
        return (self.first_token_time - self.start_time) * 1e3

    @property
    def generation_time(self) -> float:
        return (self.end_time or time.perf_counter()) - self.start_time


class InferenceEngine:
    """Slot-based continuous-batching engine over one model.

    Public surface mirrors the reference's InferenceEngine
    (generate / generate_batch / generate_stream — inference_engine.hpp:93-122)
    plus step-level control (add_request / step / pop_finished) used by the
    serving scheduler.
    """

    def __init__(
        self,
        params,
        cfg: TransformerConfig,
        *,
        runtime: Optional[RuntimeConfig] = None,
        eos_token_id: Optional[int] = None,
        kv_cache_dtype: str = "bf16",
        act_dtype=jnp.bfloat16,
        seed: int = 0,
        mesh=None,
        fuse_projections: bool = True,
        kv_layout: str = "contiguous",
        kv_total_pages: Optional[int] = None,
        draft_params=None,
        draft_cfg: Optional[TransformerConfig] = None,
    ):
        self.cfg = cfg
        self.runtime = runtime or RuntimeConfig()
        try:
            # pick up persisted per-shape kernel tunings (device-keyed; a
            # cache miss costs nothing — runtime/autotuner.install_cached)
            from .autotuner import install_cached
            install_cached()
        except Exception:   # pragma: no cover — tuning is never load-bearing
            pass
        self.eos_token_id = eos_token_id
        self.act_dtype = act_dtype
        self.mesh = mesh
        self.kv_layout = kv_layout
        self.kv_cache_dtype = kv_cache_dtype
        if fuse_projections:
            from ..models.transformer import fuse_params
            from ..parallel.mesh import MODEL_AXIS
            tp = mesh.shape[MODEL_AXIS] if mesh is not None else 1
            from ..parallel.mesh import EXPERT_AXIS
            ep = mesh.shape[EXPERT_AXIS] if mesh is not None else 1
            # the MoE cat relayout transiently unpacks int4 codes on the
            # default device BEFORE sharding — for EP-scale expert sets
            # (the models EP exists for) that can exceed one chip, so cat
            # only models whose expert weights fit comfortably
            # cat works under TP too (round 4): experts REPLICATE over the
            # model axis (same memory as the stacked layout's P(expert,..)
            # specs) while EP still block-slices the expert-major cat
            fuse_moe = (mesh is None or _expert_bytes(params) < 2 << 30)
            params = fuse_params(params, cfg, tp=tp, fuse_moe=fuse_moe,
                                 ep=ep)
        scan = self.runtime.scan_layers
        if scan == "auto":
            scan = cfg.num_layers >= 16 and kv_layout != "paged" \
                and self.runtime.seq_parallel_prefill is False
            if scan:
                from ..models.transformer import stack_layer_params
                try:
                    params = stack_layer_params(params)
                except ValueError:
                    scan = False    # mixed per-depth precision: unrolled
        elif scan:
            if kv_layout == "paged":
                raise ValueError("scan_layers requires kv_layout='contiguous'")
            from ..models.transformer import stack_layer_params
            params = stack_layer_params(params)
        self.scan_layers = bool(scan)
        b = self.runtime.max_batch_size
        max_seq = min(self.runtime.max_seq_len, cfg.max_seq_len)
        self.max_seq = max_seq
        self._page_alloc = None
        if kv_layout == "paged":
            from ..parallel.mesh import DATA_AXIS
            from . import kvcache_paged
            ps = self.runtime.kv_page_size
            if max_seq % ps or self.runtime.prefill_chunk_size % ps:
                raise ValueError(
                    f"max_seq {max_seq} and prefill_chunk_size must be "
                    f"multiples of kv_page_size {ps}")
            max_pages = max_seq // ps
            # data parallelism: one page pool PER DATA SHARD (pool rows and
            # table rows both shard over the data axis; page ids are shard-
            # local — see kvcache_paged.ShardedPageAllocator)
            dshards = mesh.shape[DATA_AXIS] if mesh is not None else 1
            if b % max(dshards, 1):
                raise ValueError(
                    f"max_batch_size {b} not divisible by data={dshards}")
            per_shard = kv_total_pages or ((b // dshards) * max_pages + 1)
            caches = kvcache_paged.init_paged_cache(
                cfg.num_layers, b, max_seq, cfg.kv_heads, cfg.dim_head,
                page_size=ps, total_pages=dshards * per_shard,
                dtype=act_dtype, kv_cache_dtype=kv_cache_dtype)
            alloc_cls = (kvcache_paged.PrefixCachingAllocator
                         if self.runtime.enable_prefix_cache
                         else kvcache_paged.PageAllocator)
            if dshards > 1:
                self._page_alloc = kvcache_paged.ShardedPageAllocator(
                    alloc_cls, per_shard, b, max_pages, dshards)
            else:
                self._page_alloc = alloc_cls(per_shard, b, max_pages)
            self._table_host = np.zeros((b, max_pages), dtype=np.int32)
        elif self.scan_layers:
            from . import kvcache_stacked
            caches = kvcache_stacked.init_cache(
                cfg.num_layers, b, max_seq, cfg.kv_heads, cfg.dim_head,
                dtype=act_dtype, kv_cache_dtype=kv_cache_dtype)
        else:
            # chunk-transposed K mirror: wide int8-K caches, single device
            # (mesh-local shards would change the width policy — follow-up)
            caches = kvcache.init_cache(
                cfg.num_layers, b, max_seq, cfg.kv_heads, cfg.dim_head,
                dtype=act_dtype, kv_cache_dtype=kv_cache_dtype,
                kv_kt=(mesh is None and kvcache.kt_auto(
                    kv_cache_dtype, cfg.kv_heads, cfg.dim_head)))
        state = init_state(b, cfg.vocab_size, jax.random.PRNGKey(seed))

        if mesh is not None:
            from ..parallel import engine as par_engine
            from ..parallel import sharding as par_sharding
            params = par_sharding.shard_params(params, mesh, cfg)
            caches = par_sharding.shard_cache(caches, mesh)
            state = par_sharding.shard_state(state, mesh)
            self._decode_builder = lambda w, n: par_engine.build_decode_step(
                mesh, cfg, params, self.caches, self.state, act_dtype,
                window=w, num_steps=n,
                top_k_out=self.runtime.emit_top_logprobs,
                guide_tables=self._guide_dev)
            if self.runtime.seq_parallel_prefill:
                from ..parallel.mesh import DATA_AXIS as _DA
                if mesh.shape[_DA] < 2:
                    raise ValueError(
                        "seq_parallel_prefill needs a data axis >= 2")
                self._prefill_fn = par_engine.build_prefill_cp_step(
                    mesh, cfg, params, caches, act_dtype)
            else:
                self._prefill_fn = par_engine.build_prefill_step(
                    mesh, cfg, params, caches, act_dtype)
        else:
            self._decode_builder = lambda w, n: (
                lambda p, c, s: _decode_multi(
                    p, self.cfg, c, s, self.act_dtype, window=w, num_steps=n,
                    top_k_out=self.runtime.emit_top_logprobs,
                    guide_tables=self._guide_dev))
            self._prefill_fn = lambda p, c, ids, ln, sl: _prefill_step(
                p, self.cfg, c, ids, ln, sl, self.act_dtype)
        self._decode_fns = {}

        # structured-output guides: all registered guides' DFA rows stacked
        # into two (R, V) tables (host mirror + device copy). Registration is
        # per unique grammar; the decode step retraces once per table shape.
        self._guides: Dict[str, Tuple[int, object]] = {}
        self._guide_rows = 0
        self._guide_allow_host: Optional[np.ndarray] = None
        self._guide_next_host: Optional[np.ndarray] = None
        self._guide_dev = None

        # prefix caching for the contiguous/stacked layouts: retired slots'
        # KV rows stay resident until slot reuse; matching prompts COPY them
        # (kvcache.copy_prefix) and prefill only the suffix. Single-device
        # (the suffix rides the chunked-prefill path); paged uses page
        # mapping instead (PrefixCachingAllocator above).
        self._prefix_idx = None
        if (self.runtime.enable_prefix_cache and kv_layout != "paged"
                and mesh is None):
            from .prefix_index import SlotPrefixIndex
            self._prefix_idx = SlotPrefixIndex(b)

        self._spec_k = self.runtime.speculative_tokens
        self._history = None
        self._draft = None          # (params, cfg) for draft-model drafting
        self._draft_caches = None
        # forward-equivalents one speculative step costs vs one plain decode
        # step (1.0 for prompt-lookup; 1 + K * size-ratio with a draft model)
        self._spec_cost_ratio = 1.0
        # Multi-step dispatch depth. decode_steps_per_dispatch == 0 means
        # AUTO: probe at 4 then 12 steps/dispatch, fit per-dispatch fixed
        # cost D and per-step device time s from the two medians, and pick
        # the depth that keeps D under ~8% of device time (latency-capped).
        # On a co-located host (D ~ 0.1 ms) auto lands at small depths; on
        # remote-tunneled runtimes (D ~ 35 ms measured here) it climbs to
        # the cap and multiplies serving throughput.
        _spd = self.runtime.decode_steps_per_dispatch
        self._auto_dispatch = _spd == 0
        self._steps_per_dispatch = 4 if self._auto_dispatch else max(1, _spd)
        self._auto_times: Dict[int, List[float]] = {}
        self._auto_done = not self._auto_dispatch
        self._inflight: Optional[Dict] = None   # pipelined-dispatch handles
        # per-slot occupancy epoch: a pipelined harvest must only touch a
        # slot whose occupant is the one that was installed when its
        # dispatch was enqueued (admissions/cancels can swap occupants
        # while a dispatch is in flight)
        self._slot_epoch = np.zeros((b,), dtype=np.int64)
        if self._spec_k > 0:
            from . import speculative
            # paged + mesh composes for TP/EP (data=1 is already enforced by
            # the paged init above — page ids are global ints into one shared
            # pool; kv-head-sharded pools verify per-shard like decode)

            if self._spec_k + 1 >= min(self.runtime.prefill_buckets):
                raise ValueError(
                    "speculative_tokens must be smaller than the smallest "
                    "prefill bucket (stale window writes must be overwritten "
                    "by the next prefill)")
            if draft_params is not None:
                if draft_cfg is None:
                    raise ValueError("draft_params needs draft_cfg")
                if draft_cfg.vocab_size != cfg.vocab_size:
                    raise ValueError(
                        f"draft vocab {draft_cfg.vocab_size} != target "
                        f"vocab {cfg.vocab_size} (same tokenizer required)")
                if fuse_projections:
                    from ..models.transformer import fuse_params
                    from ..parallel.mesh import MODEL_AXIS as _MA
                    _tp = mesh.shape[_MA] if mesh is not None else 1
                    draft_params = fuse_params(draft_params, draft_cfg,
                                               tp=_tp, fuse_moe=True,
                                               ep=ep if mesh is not None
                                               else 1)
                self._draft = (draft_params, draft_cfg)
                # Draft-model break-even: one spec step costs ~1 target
                # verify forward + K draft forwards. Decode is HBM-bound, so
                # a draft forward costs ~ (draft bytes / target bytes) of a
                # target forward; the auto-disable threshold scales by the
                # whole step's forward-equivalents (VERDICT r2 weak #6 — the
                # prompt-lookup constant undercounts draft cost, so a
                # below-break-even draft model would never self-disable).
                _nb = lambda t: sum(
                    x.size * x.dtype.itemsize
                    for x in jax.tree_util.tree_leaves(t)
                    if hasattr(x, "dtype"))
                ratio = _nb(draft_params) / max(_nb(params), 1)
                self._spec_cost_ratio = 1.0 + self._spec_k * ratio
                self._draft_caches = kvcache.init_cache(
                    draft_cfg.num_layers, b, max_seq, draft_cfg.kv_heads,
                    draft_cfg.dim_head, dtype=act_dtype,
                    kv_cache_dtype=kv_cache_dtype)
                if mesh is not None:
                    from ..parallel import sharding as par_sharding
                    self._draft = (par_sharding.shard_params(
                        draft_params, mesh, draft_cfg), draft_cfg)
                    self._draft_caches = par_sharding.shard_cache(
                        self._draft_caches, mesh)
            else:
                self._history = speculative.init_history(b, max_seq)
                if mesh is not None:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P
                    from ..parallel.mesh import DATA_AXIS
                    self._history = jax.device_put(
                        self._history,
                        NamedSharding(mesh, P(DATA_AXIS, None)))
        self.spec_steps = 0
        self.spec_emitted = 0
        # per-step acceptance histogram: index = tokens emitted in one
        # speculative window (1..K+1); feeds the auto-disable policy and
        # the serving stats (VERDICT round 1 item 8)
        self.spec_accept_hist = np.zeros((self._spec_k + 2,), dtype=np.int64)
        self.spec_disabled = False

        self.params = params
        self.caches = caches
        self.state = state
        self._lengths_host = np.zeros((b,), dtype=np.int64)
        # host mirror of state.active: spares the step()-entry device fetch
        # (a full tunnel round trip); refreshed wholesale from each step's
        # batched harvest transfer, kept exact by _activate_slot/_retire
        self._active_host = np.zeros((b,), dtype=bool)
        self._slots: List[Optional[SlotResult]] = [None] * b
        self._finished: List[SlotResult] = []
        self._prefilling: Dict[int, "_PendingPrefill"] = {}
        # deferred-admission support (deferred_admission context): phase-2
        # contexts awaiting one batched first-token harvest
        self._defer_admission = False
        self._pending_first: List[Dict] = []
        self._pending_batch: List[Dict] = []   # batched-admission prefills
        self.steps = 0
        # dispatch accounting (regression guard, VERDICT r3 weak #3): the
        # steady-state decode path must cost exactly ONE device dispatch and
        # ONE batched host transfer per step() — an accidental extra
        # device_get would silently halve serving throughput on a
        # remote-tunneled runtime. tests/test_engine.py pins these.
        self.dispatch_count = 0
        self.transfer_count = 0

    # -- slot management ----------------------------------------------------
    @property
    def num_slots(self) -> int:
        return len(self._slots)

    @property
    def free_slots(self) -> List[int]:
        return [i for i, s in enumerate(self._slots) if s is None]

    @property
    def active_requests(self) -> int:
        return sum(s is not None for s in self._slots)

    def _bucket(self, n: int) -> int:
        for b in self.runtime.prefill_buckets:
            if n <= b and b <= self.max_seq:
                return b
        return self.max_seq

    def add_request(
        self,
        token_ids: Sequence[int],
        gen: GenerationConfig,
        *,
        request_id: str = "",
    ) -> int:
        """Prefill a prompt into a free slot; returns the slot index.

        Long prompts (> prefill_chunk_size, single-device) run as chunked
        prefill internally. Raises RuntimeError when no slot is free (callers
        queue upstream — serving/scheduler.py).
        """
        slot = self.begin_request(token_ids, gen, request_id=request_id)
        while slot in self._prefilling:
            self.continue_prefill(slot)
        return slot

    def begin_request(
        self,
        token_ids: Sequence[int],
        gen: GenerationConfig,
        *,
        request_id: str = "",
    ) -> int:
        """Reserve a slot and start prefill. Short prompts complete
        immediately; long ones enter chunked mode — the caller (scheduler)
        drives `continue_prefill` one chunk at a time, interleaved with
        decode steps (Sarathi-style; no head-of-line blocking)."""
        gen.validate()
        if gen.guide is not None:
            if gen.min_tokens:
                # min_tokens suppresses EOS, which can conflict with an
                # accept-only DFA state (no legal continuation) — the guide
                # decides termination
                import dataclasses as _dc
                gen = _dc.replace(gen, min_tokens=0)
        free = self.free_slots
        if not free:
            raise RuntimeError("no free slots")
        n = len(token_ids)
        if n == 0:
            raise ValueError("empty prompt")
        room = self.max_seq - n
        if room <= 0:
            raise ValueError(
                f"prompt length {n} exceeds max_seq_len {self.max_seq}")
        slot = free[0]
        t0 = time.perf_counter()
        matched = 0
        if self._prefix_idx is not None:
            src, matched = self._prefix_idx.match(token_ids, exclude=-1)
            if matched and src == slot:
                # don't clobber the source: prefer another free slot
                alt = [s for s in free if s != src]
                if alt:
                    slot = alt[0]
                else:
                    matched = 0
            # this slot's rows are about to be overwritten — never a source
            self._prefix_idx.invalidate(slot)
            if matched:
                # device copy of the matched rows; suffix prefills below via
                # the chunked path (pos starts at `matched`)
                self.caches = self._copy_prefix_step(src, slot, matched)
                self._prefix_idx.record_hit(matched)
        if (self._page_alloc is not None
                and self.runtime.enable_prefix_cache):
            # map shared pages for the longest cached full-page prefix; the
            # suffix prefills via the chunked path so shared pages are never
            # rewritten
            matched = self._page_alloc.match_prefix(
                self._table_host, slot, token_ids,
                self.runtime.kv_page_size)
        if self._page_alloc is not None:
            if self.runtime.kv_reserve == "lazy":
                # reserve prompt + slack; grow page-by-page during decode
                # (_grow_pages), preempting under pool pressure
                budget = min(n + self.runtime.kv_lazy_slack + self._spec_k,
                             self.max_seq)
            else:
                # reserve the request's full token budget up front (prompt +
                # generation; speculative windows write up to K positions
                # past the final accepted token) — admission control over
                # the shared page pool
                budget = min(n + gen.max_tokens + 1 + self._spec_k,
                             self.max_seq)
                budget = max(budget, self._bucket(n))  # padded prompt write
            ps = self.runtime.kv_page_size
            if not self._page_alloc.ensure(self._table_host, slot, budget, ps):
                # ensure() is not transactional — release the partial
                # allocation or the empty slot strands pages the running
                # requests can never reclaim
                self._page_alloc.release(self._table_host, slot)
                raise NoFreePages(
                    f"no free KV pages ({self._page_alloc.free_pages} left, "
                    f"need {-(-budget // ps)})")
            self._sync_table()
        chunk = self.runtime.prefill_chunk_size
        if n - matched > chunk or matched:
            # reserve the slot; chunks run via continue_prefill (for a
            # prefix-cache hit, prefill starts at the matched offset).
            # Epoch bumps HERE too: any occupancy change must invalidate
            # in-flight pipelined harvests for this slot (the previous
            # occupant's leftover tokens must not leak into this request)
            self._slot_epoch = self._slot_epoch.copy()
            self._slot_epoch[slot] += 1
            self._slots[slot] = SlotResult(request_id=request_id,
                                           prompt_len=n, start_time=t0)
            self._prefilling[slot] = _PendingPrefill(
                ids=np.asarray(token_ids, dtype=np.int32), gen=gen,
                request_id=request_id, pos=matched)
            return slot

        bucket = self._bucket(n)
        padded = np.zeros((bucket,), dtype=np.int32)
        padded[:n] = np.asarray(token_ids, dtype=np.int32)
        if (self._defer_admission and self.runtime.batched_admission
                and self._page_alloc is None
                and self.mesh is None and self._draft is None
                and not matched):
            # batched admission: defer the prefill so the whole admit
            # round's prompts stream the weights ONCE (one grouped prefill
            # per bucket at flush) instead of once per request
            self._slot_epoch = self._slot_epoch.copy()
            self._slot_epoch[slot] += 1
            self._slots[slot] = SlotResult(request_id=request_id,
                                           prompt_len=n, start_time=t0)
            self._pending_batch.append(
                {"slot": slot, "ids": list(token_ids), "padded": padded,
                 "n": n, "gen": gen, "rid": request_id, "t0": t0,
                 "bucket": bucket})
            return slot
        self.caches, last_logits = self._prefill_fn(
            self.params, self.caches, jnp.asarray(padded),
            jnp.int32(n), jnp.int32(slot))
        self._activate_slot(slot, token_ids, gen, request_id, last_logits, t0)
        return slot

    @property
    def prefilling_slots(self) -> List[int]:
        return list(self._prefilling)

    def continue_prefill(self, slot: int) -> bool:
        """Run one prefill chunk for a reserved slot; returns True when the
        prompt is fully prefilled (slot is then active in the decode batch)."""
        pp = self._prefilling[slot]
        chunk = self.runtime.prefill_chunk_size
        n = len(pp.ids)
        c_ids = np.zeros((chunk,), dtype=np.int32)
        piece = pp.ids[pp.pos:pp.pos + chunk]
        c_ids[:len(piece)] = piece
        window = None
        need = pp.pos + chunk
        for b in (256, 512, 1024, 2048, 4096, 8192):
            if b >= self.max_seq:
                break
            if need <= b:
                window = b
                break
        self.caches, logits = self._chunk_fn(window)(
            self.params, self.caches, jnp.asarray(c_ids),
            jnp.int32(slot), jnp.int32(pp.pos))
        pp.pos += len(piece)
        if pp.pos < n:
            return False
        last_logits = logits[len(piece) - 1]
        res = self._slots[slot]
        t0 = res.start_time
        del self._prefilling[slot]
        self._activate_slot(slot, pp.ids.tolist(), pp.gen, pp.request_id,
                            last_logits, t0)
        return True

    def _copy_prefix_step(self, src: int, dst: int, n: int):
        """One compiled masked row copy (donated caches): rows [0, n) of slot
        src -> slot dst across all layers (contiguous or stacked)."""
        fn = self._decode_fns.get(("pfxcopy",))
        if fn is None:
            if self.scan_layers:
                from . import kvcache_stacked
                core = kvcache_stacked.copy_prefix
            else:
                core = lambda c, s, d, nn: tuple(   # noqa: E731
                    kvcache.copy_prefix(l, s, d, nn) for l in c)
            fn = self._decode_fns[("pfxcopy",)] = jax.jit(
                core, donate_argnums=(0,))
        return fn(self.caches, jnp.int32(src), jnp.int32(dst), jnp.int32(n))

    def _chunk_fn(self, window):
        key = ("chunk", window)
        fn = self._decode_fns.get(key)
        if fn is None:
            if self.mesh is not None:
                from ..parallel import engine as par_engine
                fn = par_engine.build_prefill_chunk_step(
                    self.mesh, self.cfg, self.params, self.caches,
                    self.act_dtype, window=window)
            else:
                chunk_jit = partial(
                    jax.jit, static_argnames=("cfg", "dtype", "window"),
                    donate_argnames=("caches",))(_prefill_chunk_core)
                fn = (lambda p, c, ids, sl, st: chunk_jit(
                    p, self.cfg, c, ids, sl, st, self.act_dtype,
                    window=window))
            self._decode_fns[key] = fn
        return fn

    def _activate_slot(self, slot: int, token_ids: Sequence[int],
                       gen: GenerationConfig, request_id: str,
                       last_logits, t0: float) -> None:
        """Sample the first token from prefill logits and install the slot
        into the batched decode state."""
        n = len(token_ids)
        # First sampled token comes from the prefill logits via the same
        # sampling chain (one-slot batch), compiled as one program
        # (_first_token_core) — eager per-op dispatch dominated TTFT on
        # remote-tunneled runtimes.
        sp1 = SamplingParams.from_config(gen, 1)
        # zlib.crc32, not hash(): Python string hashing is salted per-process
        # (PYTHONHASHSEED), which would desynchronize sampling across the
        # processes of a multi-host replicated engine (serving/multihost.py)
        # and break run-to-run reproducibility of unseeded requests.
        seed = gen.seed if gen.seed is not None else (
            zlib.crc32(request_id.encode()) & 0x7FFFFFFF)
        first_rng = jax.random.fold_in(jax.random.PRNGKey(seed), slot)
        bucket = self._bucket(n)
        padded_ids = np.full((bucket,), self.cfg.vocab_size, dtype=np.int32)
        padded_ids[:n] = np.asarray(token_ids, dtype=np.int32)
        k_out = self.runtime.emit_top_logprobs
        eos_suppress = (self.eos_token_id
                        if self.eos_token_id is not None else -1)
        guide = gen.guide
        g_offset = self._register_guide(guide) if guide is not None else 0
        guide_row0 = (jnp.asarray(self._guide_allow_host[g_offset])
                      if guide is not None else None)
        first_tok, first_lp, counts_row, topk1 = _first_token_step(
            last_logits, sp1, first_rng, jnp.asarray(padded_ids),
            jnp.int32(eos_suppress), top_k_out=k_out, guide_row=guide_row0)

        # Deferred admission (batched harvests): everything except the
        # guided-request DFA walk can install with g_state unknown-free;
        # the first-token host values arrive in ONE device_get for the
        # whole admission round (deferred_admission context). Guided
        # requests need first_tok on the host before install (the DFA row
        # advance feeds _install_slot_step), so they harvest immediately.
        defer = self._defer_admission and guide is None

        first_tok_np = first_lp_np = topk1_np = None
        g_state = -1
        if not defer:
            # one batched transfer (each scalar fetch is a full ~26 ms
            # round trip on remote-tunneled runtimes)
            if k_out:
                first_tok_np, first_lp_np, topk1_np = jax.device_get(
                    (first_tok, first_lp, topk1))
            else:
                first_tok_np, first_lp_np = jax.device_get(
                    (first_tok, first_lp))
            first_tok_host = int(first_tok_np[0])
            if guide is not None:
                vt = guide.allow.shape[1]
                if first_tok_host < vt and guide.allow[0, first_tok_host]:
                    g_state = g_offset + int(
                        guide.next_state[0, first_tok_host])

        # Install the slot into the batched state (one compiled program).
        eos = self.eos_token_id if self.eos_token_id is not None else -1
        if gen.stop_token_ids:
            # engine tracks a single eos id in-device; extra stop ids are
            # checked host-side in the step() harvest.
            eos = gen.stop_token_ids[0] if eos == -1 else eos
        self.state = _install_slot_step(
            self.state, jnp.int32(slot), first_tok[0], first_lp[0],
            counts_row[0], jnp.int32(n), jnp.int32(gen.max_tokens),
            jnp.int32(eos), sp1, jnp.int32(g_state))
        self._active_host = self._active_host.copy()
        self._active_host[slot] = True
        self._slot_epoch = self._slot_epoch.copy()
        self._slot_epoch[slot] += 1
        res = self._slots[slot] if (self._slots[slot] is not None and
                                    self._slots[slot].request_id == request_id
                                    ) else SlotResult(
            request_id=request_id, prompt_len=n, start_time=t0)
        res.prompt_len = n
        res.max_tokens = gen.max_tokens
        res.guided = guide is not None
        res.stop_token_ids = tuple(gen.stop_token_ids)
        self._slots[slot] = res
        self._lengths_host = np.maximum(self._lengths_host,
                                        np.where(np.arange(self.num_slots)
                                                 == slot, n, 0))
        if (self._page_alloc is not None
                and self.runtime.enable_prefix_cache):
            self._page_alloc.register_prefix(slot, token_ids,
                                             self.runtime.kv_page_size)
        if self._prefix_idx is not None:
            self._prefix_idx.register(slot, token_ids)
        if self._history is not None:
            # prompt-lookup drafting history: the prompt writes here; the
            # first generated token is patched in by _activate_finish once
            # harvested (fixed-shape row write — one compiled scatter)
            row = np.zeros((self._history.shape[1],), dtype=np.int32)
            row[:n] = np.asarray(token_ids, dtype=np.int32)
            self._history = self._history.at[slot].set(jnp.asarray(row))
        if self._draft is not None:
            # the draft model prefills the prompt into its own KV caches
            # (its prefill logits are discarded — the target sampled the
            # first token above). Zero-pad: padded_ids' vocab-size filler
            # would hit jnp.take's NaN out-of-bounds fill and 0 * NaN = NaN
            # poisons attention through the padded V rows.
            dparams, dcfg = self._draft
            zero_padded = np.where(padded_ids < self.cfg.vocab_size,
                                   padded_ids, 0).astype(np.int32)
            self._draft_caches, _ = _prefill_step(
                dparams, dcfg, self._draft_caches, jnp.asarray(zero_padded),
                jnp.int32(n), jnp.int32(slot), self.act_dtype)

        # TTFT stamps HERE (the first token's device work is enqueued and
        # completes promptly) — stamping at deferred-flush time would charge
        # request 1 for requests 2..N's prefills in the same admit round
        res.first_token_time = time.perf_counter()
        ctx = {"slot": slot, "res": res, "gen": gen, "eos": eos, "n": n,
               "k_out": k_out, "first_tok": first_tok, "first_lp": first_lp,
               "topk1": topk1, "token_ids": token_ids}
        if defer:
            self._pending_first.append(ctx)
        else:
            self._activate_finish(ctx, first_tok_np, first_lp_np, topk1_np)

    def _flush_batch_prefills(self) -> None:
        """Run every deferred admission's prefill as per-bucket GROUPED
        device programs (weights stream once per group)."""
        pend, self._pending_batch = self._pending_batch, []
        groups: Dict[int, List[Dict]] = {}
        for it in pend:
            res = self._slots[it["slot"]]
            if res is None or res.request_id != it["rid"]:
                # cancelled (or otherwise swapped out) while pending — the
                # retire already recorded it; don't prefill or re-install
                continue
            groups.setdefault(it["bucket"], []).append(it)
        for bucket in sorted(groups):
            items = groups[bucket]
            while items:
                bhat = 1
                while bhat < min(len(items), 8):
                    bhat *= 2
                take, items = items[:bhat], items[bhat:]
                ids = np.zeros((bhat, bucket), dtype=np.int32)
                lens = np.ones((bhat,), dtype=np.int32)
                slots = np.full((bhat,), self.num_slots, dtype=np.int32)
                for i, it in enumerate(take):
                    ids[i] = it["padded"]
                    lens[i] = it["n"]
                    slots[i] = it["slot"]
                try:
                    self.caches, last = self._prefill_batch(bucket, bhat)(
                        self.params, self.caches, jnp.asarray(ids),
                        jnp.asarray(lens), jnp.asarray(slots))
                except Exception:
                    # free the group's reserved slots before propagating —
                    # the per-request path leaves failed slots free too;
                    # leaking the SlotResults would shrink free_slots
                    # permanently
                    for it in take:
                        if (self._slots[it["slot"]] is not None
                                and self._slots[it["slot"]].request_id
                                == it["rid"]):
                            self._slots[it["slot"]] = None
                            self._slot_epoch = self._slot_epoch.copy()
                            self._slot_epoch[it["slot"]] += 1
                    raise
                for i, it in enumerate(take):
                    self._activate_slot(it["slot"], it["ids"], it["gen"],
                                        it["rid"], last[i], it["t0"])

    def _prefill_batch(self, bucket: int, bhat: int):
        key = ("prefill_batch", bucket, bhat)
        fn = self._decode_fns.get(key)
        if fn is not None:
            return fn
        cfg, dtype = self.cfg, self.act_dtype
        if not isinstance(self.caches, tuple):     # stacked (scan) layout
            from ..models.transformer import forward_prefill_scan_batch

            def core(params, caches, ids, lengths, slots):
                return forward_prefill_scan_batch(
                    params, cfg, ids, lengths, slots, caches, dtype=dtype)
        else:
            def core(params, caches, ids, lengths, slots):
                logits, kv = forward_prefill(params, cfg, ids, lengths,
                                             dtype=dtype)
                new = tuple(
                    kvcache.write_prompts(c, k, v, slots)
                    for c, (k, v) in zip(caches, kv))
                last = logits[jnp.arange(ids.shape[0]), lengths - 1]
                return new, last
        fn = jax.jit(core, donate_argnums=(1,))
        self._decode_fns[key] = fn
        return fn

    def _activate_finish(self, ctx, first_tok_np, first_lp_np,
                         topk1_np) -> None:
        """Phase 2 of slot activation: record the harvested first token
        and handle finish-on-first-token."""
        res, gen, slot = ctx["res"], ctx["gen"], ctx["slot"]
        if self._slots[slot] is not res:
            # the request was cancelled/retired while its harvest was
            # deferred (e.g. a streaming client disconnected between
            # admission and flush) — nothing to record, and re-retiring a
            # freed slot would corrupt the slot table
            return
        first_tok_host = int(first_tok_np[0])
        res.token_ids.append(first_tok_host)
        res.logprobs.append(float(first_lp_np[0]))
        if ctx["k_out"]:
            tv, ti = topk1_np
            res.top_tokens.append(
                [(int(i), float(v)) for i, v in zip(ti, tv)])
        if self._history is not None:
            # patch the first generated token into the drafting history row
            # (the prompt was written in phase 1)
            self._history = self._history.at[
                slot, ctx["n"]].set(jnp.int32(first_tok_host))
        # A request can finish on its very first token.
        hit_stop = (first_tok_host == ctx["eos"] or
                    first_tok_host in gen.stop_token_ids)
        if (hit_stop and gen.min_tokens < 1) or gen.max_tokens <= 1:
            self.state = self.state._replace(
                active=self.state.active.at[slot].set(False))
            res.stop_reason = "eos" if hit_stop else "max_tokens"
            self._retire(slot)

    def _flush_activations(self) -> None:
        """Harvest every deferred admission in ONE device transfer."""
        if self._pending_batch:
            # grouped prefills first; their _activate_slot calls queue the
            # first-token harvests into _pending_first (deferral forced on
            # for the duration — the context flag is already cleared here)
            prev_flag = self._defer_admission
            self._defer_admission = True
            try:
                self._flush_batch_prefills()
            finally:
                self._defer_admission = prev_flag
        pend, self._pending_first = self._pending_first, []
        if not pend:
            return
        handles = []
        for c in pend:
            handles.append(c["first_tok"])
            handles.append(c["first_lp"])
            if c["k_out"]:
                handles.append(c["topk1"])
        got = list(jax.device_get(handles))
        i = 0
        for c in pend:
            ft, lp = got[i], got[i + 1]
            i += 2
            tk = None
            if c["k_out"]:
                tk = got[i]
                i += 1
            self._activate_finish(c, ft, lp, tk)

    from contextlib import contextmanager as _ctxmgr

    @_ctxmgr
    def deferred_admission(self):
        """Batch the host harvests of every admission inside the context
        into one device transfer (scheduler._admit wraps its loop in this;
        ~26 ms/request saved on remote-tunneled runtimes)."""
        self._defer_admission = True
        try:
            yield self
        finally:
            self._defer_admission = False
            self._flush_activations()

    def _register_guide(self, guide) -> int:
        """Append a compiled Guide's (allow, next_state) rows to the stacked
        device tables; returns the guide's row offset. Idempotent per
        grammar (keyed on the guide's pattern). The EOS column is rewritten
        from the DFA's accept states; token ids beyond the tokenizer vocab
        (padded model vocab) stay disallowed."""
        key = guide.key or str(id(guide))
        hit = self._guides.get(key)
        if hit is not None:
            return hit[0]
        v = self.cfg.vocab_size
        s, vt = guide.allow.shape
        if vt > v:
            raise ValueError(
                f"guide vocab {vt} exceeds model vocab {v} — compile the "
                "guide with the model's tokenizer")
        offset = self._guide_rows
        allow = np.zeros((s, v), dtype=bool)
        allow[:, :vt] = guide.allow
        nxt = np.zeros((s, v), dtype=np.int32)
        nxt[:, :vt] = guide.next_state.astype(np.int32) + offset
        eos = self.eos_token_id if self.eos_token_id is not None else -1
        if 0 <= eos < v:
            allow[:, eos] = guide.eos_allowed
            nxt[:, eos] = offset        # unused: the slot retires on EOS
        if self._guide_allow_host is None:
            self._guide_allow_host = allow
            self._guide_next_host = nxt
        else:
            self._guide_allow_host = np.concatenate(
                [self._guide_allow_host, allow])
            self._guide_next_host = np.concatenate(
                [self._guide_next_host, nxt])
        self._guide_rows += s
        self._guide_dev = (jnp.asarray(self._guide_allow_host),
                           jnp.asarray(self._guide_next_host))
        if self.mesh is not None:
            # read-only lookup tables: replicate across the mesh
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            self._guide_dev = jax.device_put(
                self._guide_dev, NamedSharding(self.mesh, _P()))
        self._guides[key] = (offset, guide)
        # decode AND speculative fns capture the tables (mesh builders bind
        # them at build time); drop them so the next dispatch rebuilds with
        # the new rows
        self._decode_fns = {k: v for k, v in self._decode_fns.items()
                            if k[0] == "chunk"}
        return offset

    def _window(self, steps: int = 1) -> Optional[int]:
        """Smallest bucket >= max live length + dispatch steps. Bounds decode
        attention's HBM reads to the live context; None below the smallest
        bucket threshold (single compile for short-context workloads).

        On TPU with the Pallas decode/verify kernels enabled, ALWAYS None:
        the kernels bound HBM reads per SLOT via their clamped block index
        maps (finer than any bucket), so buckets would only multiply
        compiled variants — a fresh ~30s+ compile stall every time the live
        context crosses a bucket boundary mid-serving."""
        import os
        if (jax.default_backend() == "tpu"
                and os.environ.get("DPT_DECODE_KERNEL", "1") != "0"):
            return None
        need = int(self._lengths_host.max()) + steps
        if self.max_seq <= 256:
            return None
        for b in (256, 512, 1024, 2048, 4096, 8192):
            if b >= self.max_seq:
                break
            if need <= b:
                return b
        return None   # full cache

    def _spec_fn(self, window: Optional[int], num_steps: int):
        key = ("spec", window, num_steps)
        fn = self._decode_fns.get(key)
        if fn is None:
            from . import speculative
            if self.mesh is not None:
                from ..parallel import engine as par_engine
                fn = par_engine.build_spec_step(
                    self.mesh, self.cfg, self.params, self.caches,
                    self.state, self._history, self.act_dtype,
                    k_draft=self._spec_k,
                    ngram=self.runtime.speculative_ngram,
                    window=window, num_steps=num_steps,
                    top_k_out=self.runtime.emit_top_logprobs,
                    guide_tables=self._guide_dev)
            else:
                fn = (lambda p, c, s, h: speculative.spec_decode_multi_step(
                    p, self.cfg, c, s, h, self.act_dtype,
                    k_draft=self._spec_k,
                    ngram=self.runtime.speculative_ngram,
                    window=window, num_steps=num_steps,
                    top_k_out=self.runtime.emit_top_logprobs,
                    guide_tables=self._guide_dev))
            self._decode_fns[key] = fn
        return fn

    def _spec_draft_fn(self, window: Optional[int], num_steps: int):
        key = ("spec_draft", window, num_steps)
        fn = self._decode_fns.get(key)
        if fn is None:
            from . import speculative
            dcfg = self._draft[1]
            if self.mesh is not None:
                from ..parallel import engine as par_engine
                fn = par_engine.build_spec_draft_step(
                    self.mesh, self.cfg, dcfg, self.params, self._draft[0],
                    self.caches, self._draft_caches, self.state,
                    self.act_dtype, k_draft=self._spec_k, window=window,
                    num_steps=num_steps,
                    top_k_out=self.runtime.emit_top_logprobs,
                    guide_tables=self._guide_dev)
            else:
                fn = (lambda p, dp, c, dc, s:
                      speculative.spec_decode_draft_multi_step(
                          p, dp, self.cfg, dcfg, c, dc, s, self.act_dtype,
                          k_draft=self._spec_k, window=window,
                          num_steps=num_steps,
                          top_k_out=self.runtime.emit_top_logprobs,
                          guide_tables=self._guide_dev))
            self._decode_fns[key] = fn
        return fn

    @property
    def prefix_cache_stats(self) -> Dict[str, int]:
        """{hits, hit_tokens, cached_pages} (zeros when prefix caching is
        off). cached_pages is paged-layout specific (contiguous reuse is
        row-copy based, not page-mapped)."""
        a = self._page_alloc
        if a is not None and hasattr(a, "hits"):
            return {"hits": a.hits, "hit_tokens": a.hit_tokens,
                    "cached_pages": a.cached_pages}
        if self._prefix_idx is not None:
            return {"hits": self._prefix_idx.hits,
                    "hit_tokens": self._prefix_idx.hit_tokens,
                    "cached_pages": 0}
        return {"hits": 0, "hit_tokens": 0, "cached_pages": 0}

    @property
    def spec_mean_accepted(self) -> float:
        """Mean tokens emitted per speculative step (1.0 = no win)."""
        return self.spec_emitted / max(self.spec_steps, 1)

    @property
    def spec_window_mean(self) -> float:
        """Mean accepted tokens per NON-EMPTY speculative window (per slot,
        per step) — the per-request acceptance the auto-disable policy and
        serving stats use; spec_mean_accepted aggregates across slots."""
        total = int(self.spec_accept_hist.sum())
        if not total:
            return 0.0
        counts = np.arange(self.spec_accept_hist.shape[0])
        return float((self.spec_accept_hist * counts).sum() / total)

    def _decode(self, window: Optional[int]):
        n = self._steps_per_dispatch
        key = (window, n)
        fn = self._decode_fns.get(key)
        if fn is None:
            fn = self._decode_fns[key] = self._decode_builder(window, n)
        return fn

    def step(self) -> Dict[int, List[int]]:
        """Run one decode dispatch (num_steps tokens per slot; see
        RuntimeConfig.decode_steps_per_dispatch); returns {slot: [tokens]}.

        Also retires finished slots (EOS / max_tokens / cache-full).

        PIPELINED mode (plain decode, non-lazy paging, after the auto-depth
        probe): the NEXT dispatch enqueues BEFORE the previous dispatch's
        harvest transfer, so the harvest round trip rides the device's
        compute of the following dispatch instead of serializing with it —
        on a remote-tunneled runtime that hides ~26 ms per dispatch. Device
        math is identical (the in-device active mask is always current);
        host bookkeeping (retires, stop strings) runs one dispatch behind,
        costing at most one wasted dispatch when the whole batch drains.
        """
        if not self._active_host.any():
            if self._inflight is not None:
                # final harvest: the batch went inactive while a dispatch
                # was still in flight
                h, self._inflight = self._inflight, None
                return self._harvest(h)
            return {}
        lazy = (self._page_alloc is not None
                and self.runtime.kv_reserve == "lazy")
        pipelined = (self._spec_k == 0 and not lazy and self._auto_done
                     and self.runtime.pipelined_dispatch)
        if pipelined:
            h_new = self._dispatch_plain(lookahead=True)
            prev, self._inflight = self._inflight, h_new
            if prev is None:
                # prime the pipeline: enqueue a second dispatch so there is
                # always one in flight, then harvest the first — callers
                # expect tokens from every step() while requests are active
                self._inflight = self._dispatch_plain(lookahead=True)
                return self._harvest(h_new)
            out = self._harvest(prev)
            if not out and self._active_host.any():
                # the previous dispatch predates every live occupant (all
                # its slots were re-admitted while it flew) — harvest the
                # fresh dispatch too so callers see tokens every step while
                # requests are active (drivers treat an empty step as done)
                h, self._inflight = (self._inflight,
                                     self._dispatch_plain(lookahead=True))
                out = self._harvest(h)
            return out
        if self._inflight is not None:     # mode switched (e.g. spec off)
            h, self._inflight = self._inflight, None
            out = self._harvest(h)
            if out:
                return out
        if lazy:
            self._grow_pages()
            if not self._active_host.any():
                return {}
        _t0 = time.perf_counter() if not self._auto_done else 0.0
        if self._spec_k > 0:
            n = self._steps_per_dispatch
            t = self._spec_k + 1
            win = self._window(n * t)
            self.dispatch_count += 1
            if self._draft is not None:
                out = self._spec_draft_fn(win, n)(
                    self.params, self._draft[0], self.caches,
                    self._draft_caches, self.state)
                if self.runtime.emit_top_logprobs:
                    (self.caches, self._draft_caches, self.state, emitted,
                     lps, topks) = out
                else:
                    (self.caches, self._draft_caches, self.state, emitted,
                     lps) = out
                    topks = None
            else:
                out = self._spec_fn(win, n)(
                    self.params, self.caches, self.state, self._history)
                if self.runtime.emit_top_logprobs:
                    (self.caches, self.state, self._history, emitted, lps,
                     topks) = out
                else:
                    self.caches, self.state, self._history, emitted, lps = out
                    topks = None
            # (N, B, T) -> (N*T, B): row order = (step, window position),
            # preserving per-slot emission order for the harvest loop
            b_ = emitted.shape[1]
            spec_reshape = True
            emitted = jnp.transpose(emitted, (0, 2, 1)).reshape(-1, b_)
            lps = jnp.transpose(lps, (0, 2, 1)).reshape(-1, b_)
            self.steps += n
            self.spec_steps += n
        else:
            h = self._dispatch_plain()
            out2 = self._harvest(h)
            if not self._auto_done:
                self._auto_observe(time.perf_counter() - _t0)
            return out2
        h = {"emitted": emitted, "lps": lps, "active": self.state.active,
             "lengths": self.state.lengths, "eos_id": self.state.eos_id,
             "topks": topks, "spec_reshape": spec_reshape,
             "spec": True}
        out2 = self._harvest(h)
        if not self._auto_done:
            self._auto_observe(time.perf_counter() - _t0)
        return out2

    def _dispatch_plain(self, lookahead: bool = False) -> Dict:
        """Enqueue one plain multi-step decode dispatch; returns the
        device handles the harvest needs. lookahead widens the CPU window
        bucket by one dispatch (host lengths lag one dispatch when
        pipelining; on TPU the window is always None).

        The state fields the harvest reads are SNAPSHOTTED into fresh
        buffers: the decode step donates (caches, state), so the next
        pipelined dispatch would delete the very handles a deferred
        harvest still needs."""
        n = self._steps_per_dispatch
        win = self._window(2 * n if lookahead else n)
        self.dispatch_count += 1
        out = self._decode(win)(self.params, self.caches, self.state)
        if self.runtime.emit_top_logprobs:
            self.caches, self.state, emitted, lps, topks = out
        else:
            self.caches, self.state, emitted, lps = out
            topks = None
        self.steps += n
        active, lengths, eos = _snapshot_state(
            self.state.active, self.state.lengths, self.state.eos_id)
        return {"emitted": emitted, "lps": lps, "active": active,
                "lengths": lengths, "eos_id": eos, "topks": topks,
                "spec_reshape": False, "spec": False,
                "epoch": self._slot_epoch}

    def _harvest(self, h: Dict) -> Dict[int, List[int]]:
        """Fetch one dispatch's results (ONE batched transfer) and run the
        host bookkeeping: emissions, stop ids, retires, stats."""
        emitted, lps, topks = h["emitted"], h["lps"], h["topks"]
        spec_reshape = h["spec_reshape"]
        # ONE batched host transfer for the whole harvest: each individual
        # fetch through a remote-tunneled runtime costs a full ~26 ms round
        # trip (measured: 6 sequential np.asarray per step = 156 ms of pure
        # latency, dwarfing the ~8 ms of device compute). device_get
        # pipelines the transfers into a single round trip.
        fetch = [emitted, lps, h["active"], h["lengths"], h["eos_id"]]
        if topks is not None:
            fetch += [topks[0], topks[1]]
        self.transfer_count += 1
        got = jax.device_get(fetch)
        emitted_np, lp_np, active_np, lengths_np, eos_np = got[:5]
        if topks is not None:
            tv, ti = got[5], got[6]
            if spec_reshape:
                b_, k_ = emitted_np.shape[1], tv.shape[-1]
                topk_vals = tv.transpose(0, 2, 1, 3).reshape(-1, b_, k_)
                topk_ids = ti.transpose(0, 2, 1, 3).reshape(-1, b_, k_)
            else:
                topk_vals, topk_ids = tv, ti       # (N, B, k)
        else:
            topk_vals = topk_ids = None
        if h["spec"]:
            self.spec_emitted += int((emitted_np >= 0).sum())
            # acceptance-length distribution: emitted rows are (step,
            # window-position)-ordered — fold back to per-(step, slot)
            # window counts and histogram the non-empty windows
            t = self._spec_k + 1
            wins = (emitted_np.reshape(-1, t, emitted_np.shape[1]) >= 0
                    ).sum(axis=1)                 # (N, B) accepted per window
            np.add.at(self.spec_accept_hist,
                      np.clip(wins[wins > 0], 0, t), 1)
            # draft-model speculation pays K extra draft forwards per window,
            # so its break-even is the configured (prompt-lookup) threshold
            # scaled by the step's forward-equivalents
            thresh = (self.runtime.speculative_min_accepted
                      * self._spec_cost_ratio)
            if (thresh > 0
                    and self.spec_accept_hist.sum()
                    >= self.runtime.speculative_probe_steps
                    and self.spec_window_mean < thresh):
                # below break-even on this workload: speculation is pure
                # overhead — fall back to plain decode (stale window writes
                # past `lengths` are never read; reads are length-bounded)
                self._spec_k = 0
                self.spec_disabled = True
        active_np = np.array(active_np, dtype=bool)
        epoch0 = h.get("epoch")
        if epoch0 is not None and not np.array_equal(epoch0,
                                                     self._slot_epoch):
            # stale rows (slot re-admitted since this dispatch): keep the
            # CURRENT mirror for those slots — the snapshot predates them
            fresh = epoch0 == self._slot_epoch
            merged = self._active_host.copy()
            merged[fresh] = active_np[fresh]
            active_np = merged
            lengths_np = np.where(fresh, lengths_np, self._lengths_host)
        self._lengths_host = lengths_np
        self._active_host = active_np
        epoch = epoch0
        out: Dict[int, List[int]] = {}
        for slot in range(emitted_np.shape[1]):
            if self._slots[slot] is None:
                continue
            if epoch is not None and epoch[slot] != self._slot_epoch[slot]:
                # a different request occupies this slot now (admitted or
                # swapped while this dispatch was in flight) — its tokens
                # and retire decisions belong to the next harvest
                continue
            res = self._slots[slot]
            toks = [int(t) for t in emitted_np[:, slot] if t >= 0]
            if not toks:
                if not active_np[slot] and slot not in self._prefilling:
                    # deactivated without emitting: a guided slot reached an
                    # accept-only DFA state with no EOS id — complete
                    res.stop_reason = res.stop_reason or (
                        "guide_complete" if res.guided else "max_tokens")
                    self._retire(slot)
                continue
            res.token_ids.extend(toks)
            res.logprobs.extend(
                float(lp_np[row, slot])
                for row in range(emitted_np.shape[0])
                if emitted_np[row, slot] >= 0)
            if topk_ids is not None:
                res.top_tokens.extend(
                    [(int(topk_ids[row, slot, j]),
                      float(topk_vals[row, slot, j]))
                     for j in range(topk_ids.shape[2])]
                    for row in range(emitted_np.shape[0])
                    if emitted_np[row, slot] >= 0)
            out[slot] = toks
            # secondary stop ids (the device tracks one EOS; extras checked
            # here — reference: RequestConfig.stop_tokens semantics)
            if res.stop_token_ids and active_np[slot] and any(
                    t in res.stop_token_ids for t in toks):
                self.state = self.state._replace(
                    active=self.state.active.at[slot].set(False))
                active_np[slot] = False
                cut = next(i for i, t in enumerate(res.token_ids)
                           if t in res.stop_token_ids)
                res.token_ids = res.token_ids[:cut + 1]
                res.logprobs = res.logprobs[:cut + 1]
                res.top_tokens = res.top_tokens[:cut + 1]
                res.stop_reason = "eos"
            cache_full = lengths_np[slot] >= self.max_seq - 1
            if not active_np[slot] or cache_full:
                if cache_full and active_np[slot]:
                    self.state = self.state._replace(
                        active=self.state.active.at[slot].set(False))
                    res.stop_reason = res.stop_reason or "max_seq"
                elif toks and toks[-1] == int(eos_np[slot]):
                    res.stop_reason = res.stop_reason or "eos"
                elif cache_full:
                    res.stop_reason = res.stop_reason or "max_seq"
                elif (res.guided and res.max_tokens
                      and len(res.token_ids) < res.max_tokens):
                    # deactivated short of max_tokens without EOS: the DFA
                    # reached an accept-only state with no legal continuation
                    # mid-window (speculative path)
                    res.stop_reason = res.stop_reason or "guide_complete"
                else:
                    res.stop_reason = res.stop_reason or "max_tokens"
                self._retire(slot)
        return out

    def _auto_observe(self, dt: float) -> None:
        """Adaptive multi-step dispatch: probe medians at 4 then 12
        steps/dispatch, fit per-dispatch fixed cost D and per-step device
        time s, and settle on the ladder depth keeping D <= ~8% of device
        time, latency-capped at ~100 ms of tokens per dispatch."""
        n = self._steps_per_dispatch
        times = self._auto_times.setdefault(n, [])
        times.append(dt)
        probe = 7                       # first sample is the compile; drop it
        if n == 4 and len(times) >= probe:
            self._steps_per_dispatch = 12
        elif n == 12 and len(times) >= probe:
            # min, not median: dispatches that hit a compile (new window
            # bucket / depth variant) are 1000x outliers; the fastest
            # observed dispatch is the honest (D + n*s) sample
            t4 = min(self._auto_times[4][1:])
            t12 = min(times[1:])
            s = max((t12 - t4) / 8.0, 1e-6)
            d = max(t4 - 4.0 * s, 0.0)
            want = d / (0.08 * s)
            cap = 0.1 / s
            n_star = max(1.0, min(want, cap, 32.0))
            ladder = (1, 2, 4, 6, 8, 12, 16, 24, 32)
            self._steps_per_dispatch = min(
                ladder, key=lambda x: abs(x - n_star))
            self._auto_done = True

    def _grow_pages(self) -> None:
        """Lazy paged mode: before each dispatch, extend every active slot's
        page allocation to cover the next dispatch; under pool exhaustion
        preempt the youngest other request (LIFO — old requests never
        starve). A slot that cannot grow and has no victims stops at its
        current length (stop_reason "kv_pages")."""
        ps = self.runtime.kv_page_size
        steps = self._steps_per_dispatch
        if self._spec_k:
            # each spec step can write K+1 positions and overrun by K
            steps = steps * (self._spec_k + 1) + self._spec_k
        changed = False
        for slot in range(self.num_slots):
            res = self._slots[slot]
            if res is None or slot in self._prefilling:
                continue
            needed = min(int(self._lengths_host[slot]) + steps + 1,
                         self.max_seq)
            shared = getattr(self._page_alloc, "shared_per_slot", None)
            have_pages = len(self._page_alloc.per_slot[slot]) + (
                len(shared[slot]) if shared else 0)
            if needed <= have_pages * ps:
                continue
            while not self._page_alloc.ensure(self._table_host, slot,
                                              needed, ps):
                victim = self._pick_victim(exclude=slot)
                if victim is None:
                    self.state = self.state._replace(
                        active=self.state.active.at[slot].set(False))
                    res.stop_reason = "kv_pages"
                    self._retire(slot)
                    break
                self.preempt(victim)
            else:
                changed = True
        if changed:
            self._sync_table()

    def _pick_victim(self, exclude: int) -> Optional[int]:
        """Youngest other request (mid-prefill slots included — they are
        typically the youngest and release their pages cleanly)."""
        best, best_t = None, -1.0
        for slot, res in enumerate(self._slots):
            if res is None or slot == exclude:
                continue
            if res.start_time > best_t:
                best, best_t = slot, res.start_time
        return best

    def preempt(self, slot: int) -> None:
        """Evict a running request under page-pool pressure: deactivate it,
        release its pages, and surface it via pop_finished with stop_reason
        "preempted" — the scheduler re-enqueues it and generation resumes by
        re-prefilling prompt + generated prefix (docs/roadmap.md item 9)."""
        if self._slots[slot] is None:
            return
        self._prefilling.pop(slot, None)
        self.state = self.state._replace(
            active=self.state.active.at[slot].set(False))
        self._slots[slot].stop_reason = "preempted"
        self._retire(slot)

    def cancel(self, slot: int) -> None:
        """Cancel a running request (streaming callback returned False —
        reference: inference_engine.cpp:173-256 cancel-on-false)."""
        if self._slots[slot] is None:
            return
        self._prefilling.pop(slot, None)
        self.state = self.state._replace(
            active=self.state.active.at[slot].set(False))
        self._slots[slot].stop_reason = "cancelled"
        self._retire(slot)

    def _sync_table(self) -> None:
        from . import kvcache_paged
        self.caches = kvcache_paged.with_table(
            self.caches, jnp.asarray(self._table_host))

    def _retire(self, slot: int) -> None:
        res = self._slots[slot]
        res.end_time = time.perf_counter()
        self._finished.append(res)
        self._slots[slot] = None
        self._active_host = self._active_host.copy()
        self._active_host[slot] = False
        # occupancy changed: in-flight pipelined harvests must neither
        # touch this slot nor resurrect its pre-retire active/length mirror
        self._slot_epoch = self._slot_epoch.copy()
        self._slot_epoch[slot] += 1
        if self._prefix_idx is not None and len(res.token_ids) > 1:
            # rows [n, n + g - 1) hold the generated tokens except the last
            # (never fed back) — extend the resident claim for multi-turn
            # reuse. Valid even after host-side stop-string truncation (the
            # truncated rows hold exactly the truncated tokens).
            self._prefix_idx.extend(slot, res.token_ids[:-1])
        # Zero the retired slot's length so the decode window can shrink
        # (its cache rows are dead; the inactive mask guards correctness).
        self.state = self.state._replace(
            lengths=self.state.lengths.at[slot].set(0),
            guide_state=self.state.guide_state.at[slot].set(-1))
        self._lengths_host = self._lengths_host.copy()
        self._lengths_host[slot] = 0
        if self._page_alloc is not None:
            self._page_alloc.release(self._table_host, slot)
            self._sync_table()

    def pop_finished(self) -> List[SlotResult]:
        done, self._finished = self._finished, []
        return done

    def reset(self) -> None:
        """Drop all in-flight state: fresh caches + decode state, slots
        freed. Used by the scheduler's failure recovery (reference:
        handle_worker_failure + requeue, scheduler.cpp:260-279)."""
        b = self.num_slots
        self._active_host = np.zeros((b,), dtype=bool)
        self._inflight = None
        self._pending_batch = []
        if self._page_alloc is not None:
            from . import kvcache_paged
            ps = self.runtime.kv_page_size
            max_pages = self.max_seq // ps
            caches = kvcache_paged.init_paged_cache(
                self.cfg.num_layers, b, self.max_seq, self.cfg.kv_heads,
                self.cfg.dim_head, page_size=ps,
                dtype=self.act_dtype, kv_cache_dtype=self.kv_cache_dtype)
            alloc_cls = (kvcache_paged.PrefixCachingAllocator
                         if self.runtime.enable_prefix_cache
                         else kvcache_paged.PageAllocator)
            self._page_alloc = alloc_cls(b * max_pages + 1, b, max_pages)
            self._table_host = np.zeros((b, max_pages), dtype=np.int32)
        elif self.scan_layers:
            from . import kvcache_stacked
            caches = kvcache_stacked.init_cache(
                self.cfg.num_layers, b, self.max_seq, self.cfg.kv_heads,
                self.cfg.dim_head, dtype=self.act_dtype,
                kv_cache_dtype=self.kv_cache_dtype)
        else:
            caches = kvcache.init_cache(
                self.cfg.num_layers, b, self.max_seq, self.cfg.kv_heads,
                self.cfg.dim_head, dtype=self.act_dtype,
                kv_cache_dtype=self.kv_cache_dtype,
                kv_kt=(self.mesh is None and kvcache.kt_auto(
                    self.kv_cache_dtype, self.cfg.kv_heads,
                    self.cfg.dim_head)))
        state = init_state(b, self.cfg.vocab_size,
                           jax.random.PRNGKey(self.steps + 1))
        if self.mesh is not None:
            from ..parallel import sharding as par_sharding
            caches = par_sharding.shard_cache(caches, self.mesh)
            state = par_sharding.shard_state(state, self.mesh)
        self.caches = caches
        self.state = state
        self._slots = [None] * b
        self._finished = []
        self._prefilling = {}
        self._lengths_host = np.zeros((b,), dtype=np.int64)
        if self._prefix_idx is not None:
            from .prefix_index import SlotPrefixIndex
            self._prefix_idx = SlotPrefixIndex(b)   # fresh caches: no residents
        if self._history is not None:
            from . import speculative
            self._history = speculative.init_history(b, self.max_seq)
            if self.mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS
                self._history = jax.device_put(
                    self._history, NamedSharding(self.mesh,
                                                 P(DATA_AXIS, None)))
        if self._draft is not None:
            dcfg = self._draft[1]
            self._draft_caches = kvcache.init_cache(
                dcfg.num_layers, b, self.max_seq, dcfg.kv_heads,
                dcfg.dim_head, dtype=self.act_dtype,
                kv_cache_dtype=self.kv_cache_dtype)
        self.spec_steps = 0
        self.spec_emitted = 0
        self.spec_accept_hist = np.zeros_like(self.spec_accept_hist)

    # -- one-shot APIs (reference parity) -----------------------------------
    def generate(
        self,
        token_ids: Sequence[int],
        gen: Optional[GenerationConfig] = None,
    ) -> SlotResult:
        """Blocking single-prompt generation (reference:
        InferenceEngine::generate, inference_engine.cpp:23-114)."""
        return self.generate_batch([token_ids], gen)[0]

    def generate_batch(
        self,
        prompts: Sequence[Sequence[int]],
        gen: Optional[GenerationConfig] = None,
    ) -> List[SlotResult]:
        """True batched generation — all prompts decode in one fixed-shape
        step (the reference's generate_batch fell back to sequential,
        inference_engine.cpp:139-159)."""
        gen = gen or GenerationConfig()
        order: List[Tuple[int, str]] = []
        for i, p in enumerate(prompts):
            rid = f"batch-{i}"
            self.add_request(p, gen, request_id=rid)
            order.append((i, rid))
        results: Dict[str, SlotResult] = {}
        pending = {rid for _, rid in order}
        while pending:
            if not self.step():
                for r in self.pop_finished():
                    results[r.request_id] = r
                    pending.discard(r.request_id)
                if pending:
                    raise RuntimeError("engine stalled with pending requests")
                break
            for r in self.pop_finished():
                results[r.request_id] = r
                pending.discard(r.request_id)
        return [results[rid] for _, rid in order]

    def generate_stream(
        self,
        token_ids: Sequence[int],
        gen: Optional[GenerationConfig] = None,
        callback: Optional[Callable[[int], bool]] = None,
    ) -> SlotResult:
        """Streaming generation; callback gets each token id, return False to
        cancel (reference: generate_stream, inference_engine.cpp:173-256)."""
        gen = gen or GenerationConfig()
        slot = self.add_request(token_ids, gen, request_id="stream")
        res = self._slots[slot]
        if res is None:  # finished on the first token
            res = [r for r in self.pop_finished() if r.request_id == "stream"][0]
            if callback:
                callback(res.token_ids[0])
            return res
        if callback and not callback(res.token_ids[0]):
            self.cancel(slot)
            return [r for r in self.pop_finished() if r.request_id == "stream"][0]
        while self._slots[slot] is not None:
            toks = self.step()
            if slot in toks and callback is not None:
                stop = False
                for tok in toks[slot]:
                    if not callback(tok):
                        stop = True
                        break
                if stop:
                    if self._slots[slot] is not None:
                        self.cancel(slot)
                    break
        done = [r for r in self.pop_finished() if r.request_id == "stream"]
        return done[0] if done else res
