"""Decode attention Pallas kernel: KV-cache attention with in-VMEM int8
dequant and per-slot length-bounded HBM reads.

Why a kernel: XLA materializes the dequantized cache before attention — an
int8 KV cache decode was measured *slower* than bf16 (179us vs 143us for
llama-7B shapes) despite half the HBM bytes. Here the int8 blocks + scales
stream into VMEM and dequantize inline, so int8 halves the real traffic.
Additionally the S-block index map is redirected to
min(block, ceil(len/bs)-1): blocks beyond a slot's live length repeat the
previous block (no new DMA) with compute skipped — reads track each slot's
*own* length, finer than the engine-level window bucket.

Layout: cache (B, S, Kh, D); q (B, H, D) with H = Kh * rep (GQA). Scores are
VPU broadcast-multiply-reduce over D (batched per kv-head) — this op is
bandwidth-bound, the MXU has nothing to add at M=rep rows.

Grid: (B, S/bs) with the S dimension sequential; online-softmax partials in
VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _kernel(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_s: int, rep: int, scale: float,
            quantized: bool):
    b = pl.program_id(0)
    sb = pl.program_id(1)
    seq_len = len_ref[b]

    @pl.when(sb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(sb * block_s < seq_len)
    def _():
        h, d = q_ref.shape[1], q_ref.shape[2]
        kh = h // rep
        q = q_ref[0].astype(jnp.float32) * scale            # (H, D)
        k_blk = k_ref[0].astype(jnp.float32)                # (bs, Kh, D)
        v_blk = v_ref[0].astype(jnp.float32)
        if quantized:
            k_blk = k_blk * ks_ref[0].T[..., None]          # (kh,bs)->(bs,kh,1)
            v_blk = v_blk * vs_ref[0].T[..., None]
        pos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (rep, block_s), 1)
        valid = pos < seq_len                               # (rep, bs)

        # per-kv-head 2-D flash update (Mosaic: reductions stay on the
        # trailing axes; batched/3-D reductions are unsupported)
        for j in range(kh):
            q_j = q[j * rep:(j + 1) * rep]                  # (rep, D)
            k_j = k_blk[:, j, :]                            # (bs, D)
            v_j = v_blk[:, j, :]
            s = jax.lax.dot_general(
                q_j, k_j, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (rep, bs)
            s = jnp.where(valid, s, NEG_INF)
            m_prev = m_ref[j * rep:(j + 1) * rep]           # (rep, 1)
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[j * rep:(j + 1) * rep] = (
                l_ref[j * rep:(j + 1) * rep] * alpha
                + jnp.sum(p, axis=-1, keepdims=True))
            acc_ref[j * rep:(j + 1) * rep] = (
                acc_ref[j * rep:(j + 1) * rep] * alpha
                + jax.lax.dot_general(
                    p, v_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            m_ref[j * rep:(j + 1) * rep] = m_new

    @pl.when(sb == pl.num_programs(1) - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.astype(o_ref.dtype)


def _unpack4(packed):
    """int8-packed nibble planes -> (lo, hi) sign-extended int32 arrays."""
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    return lo, hi


def _unpack4_u8(packed):
    """Byte-plane nibble unpack -> (lo, hi) int8 planes holding v+8 in
    [0, 15]: bitcast to i32 (4 sublanes/word, elementwise structure
    preserved), mask/shift 8 nibbles per word, XOR 0x08 to rebias the
    two's-complement nibble to unsigned v+8, bitcast back. ~1.6 VPU
    ops/value vs 3+ for the i32 convert + shift pair, and the planes feed
    the int8 MXU directly with ZERO converts (the +8 bias is corrected
    exactly via row/col sums — see the int8-dot paths)."""
    w32 = pltpu.bitcast(packed, jnp.int32)
    lo = pltpu.bitcast((w32 & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
    hi = pltpu.bitcast(
        (jnp.right_shift(w32, 4) & 0x0F0F0F0F) ^ 0x08080808, jnp.int8)
    return lo, hi


def _kernel_mxu(len_ref, *refs, block_s: int, kh: int,
                scale: float, quantized: bool, tokens: int = 1,
                stacked: bool = False, kv_bits: int = 8,
                v_bits: int = 0, int8_dots: bool = False):
    """Head-folded MXU decode attention body. Refs (blocks):
      q:  (1, O, D)  queries, O = Kh*rep*T rows ordered (kv-head, rep, t) —
           T = 1 for plain decode, T > 1 folds a speculative-verify window's
           tokens into extra output rows (only the mask bound differs)
      k/v: (1, bs, F) folded cache blocks (F = Kh*D) — lane-aligned, so the
           DMA streams at full rate (the per-head (bs, Kh, D) layout padded
           (Kh, D) -> (8, 128) tiles and wasted ~4x the traffic)
      ks/vs: (1, kh, bs) f32 scales (int8 KV), kh-major so the pad is tiny
      out: (1, O, D)  the diagonal blocks of the folded accumulator
      w (scratch): (F, O) block-diagonal query matrix, built IN-KERNEL at
           sb==0 (tile q^T Kh-fold + block-diagonal iota mask) — an earlier
           version built/extracted W outside and the (B,F,O) f32 round trips
           through HBM cost more than the kernel saved end-to-end.
    With `stacked`, cache/scale blocks carry an extra leading unit dim (the
    scan-over-layers (L, B, S, F) cache, layer picked by the index maps) —
    slicing a layer OUTSIDE the kernel materialized a full-layer copy at the
    custom-call boundary.
    Scores for ALL kv-heads in ONE (bs, F) @ (F, O) MXU dot — cross-head
    terms vanish by W's block-diagonal structure. Cost is O/rep-fold
    redundant MXU flops, noise next to the HBM stream this op is bound by.
    Causal masking: row (k, r, t) sees pos < seq_len - (T-1) + t, i.e.
    callers pass lengths + T (tokens already cached + the window).
    """
    if stacked:
        (_lay_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
         m_ref, l_ref, acc_ref, w_ref, *aux) = refs
        blk = lambda r: r[0, 0]
    else:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
         m_ref, l_ref, acc_ref, w_ref, *aux) = refs
        blk = lambda r: r[0]
    aux_ref = aux[0] if aux else None
    b = pl.program_id(0)
    sb = pl.program_id(1)
    seq_len = len_ref[b]
    h, d = q_ref.shape[1], q_ref.shape[2]
    rep = h // kh       # = true_rep * tokens (rows per kv-head group)
    # int4 KV: the cache stores nibble-packed half-split heads (width D/2);
    # the kernel works in folded half-spaces (lo/hi feature halves) so the
    # unpack never needs a lane interleave — W/scores split per K half, the
    # accumulator per V half, halves concatenate at extraction. K and V
    # packings are INDEPENDENT (mixed "k8v4" mode: int8 K + int4 V).
    k_packed = kv_bits == 4
    v_packed = (v_bits if v_bits else kv_bits) == 4
    # contiguous int4 K ships 2 sub-block scales per head (rows 2k+half);
    # stacked/paged int4 still use 1 — detect from the scale block rows
    ks_rows = (ks_ref.shape[-2] if quantized else 0)
    vs_rows = (vs_ref.shape[-2] if quantized else 0)
    k_half_scales = bool(quantized) and k_packed and ks_rows == 2 * kh
    v_half_scales = bool(quantized) and v_packed and vs_rows == 2 * kh
    kdw = d // 2 if k_packed else d
    vdw = d // 2 if v_packed else d
    fk = kh * kdw
    n_k_halves = 2 if k_packed else 1
    n_v_halves = 2 if v_packed else 1

    def build_w(q_half, half):
        wfull = jnp.broadcast_to(q_half.T[None], (kh, kdw, h)).reshape(fk, h)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (fk, h), 0) // kdw
        col_k = jax.lax.broadcasted_iota(jnp.int32, (fk, h), 1) // rep
        w_ref[half] = jnp.where(row_k == col_k, wfull,
                                0.0).astype(w_ref.dtype)

    @pl.when(sb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0].astype(jnp.float32) * scale            # (O, D)
        if int8_dots:
            # int8-MXU scores (2x the bf16 MXU rate, zero K-side converts):
            # quantize each query ROW to int8 (per-row scale qs); the score
            # correction for the nibble +8 rebias is 8 * rowsum(wi8) — both
            # land in the aux scratch. This trades <=0.8% relative score
            # error (8-bit q) for ~2x on the kernel's dot-bound stage; the
            # trained-weights Δppl KV gate (scripts/eval_ppl.py) covers it.
            qs = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                             1e-30) / 127.0                 # (O, 1)
            aux_ref[0, :, 0:1] = qs
            for half in range(n_k_halves):
                qh = q[:, half * kdw:(half + 1) * kdw] if k_packed else q
                wi8 = jnp.clip(jnp.round(qh / qs), -127, 127)  # (O, kdw) f32
                aux_ref[half, :, 1:2] = jnp.sum(wi8, axis=1, keepdims=True)
                build_w(wi8, half)                          # int8 w_ref
        elif k_packed:
            build_w(q[:, :kdw], 0)
            build_w(q[:, kdw:], 1)
        else:
            build_w(q, 0)

    @pl.when(sb * block_s < seq_len)
    def _():
        if int8_dots:
            k_halves = (_unpack4_u8(blk(k_ref)) if k_packed
                        else [blk(k_ref)])                  # i8: v+8 | s8
            v_halves = (_unpack4_u8(blk(v_ref)) if v_packed
                        else [blk(v_ref)])
            qs = aux_ref[0, :, 0:1]                         # (O, 1)
            partials = [jax.lax.dot_general(
                w_ref[i], k_halves[i], (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
                - (8.0 * aux_ref[i, :, 1:2] if k_packed else 0.0)
                for i in range(n_k_halves)]                 # v+8 rebias
            if quantized and k_half_scales:
                ks2 = blk(ks_ref).reshape(kh, 2, -1)        # (kh, 2, bs)
                s = sum(partials[i]
                        * jnp.repeat(ks2[:, i, :], rep, axis=0)
                        for i in range(n_k_halves)) * qs
            else:
                s = sum(partials) * qs
        else:
            k_halves = ([x.astype(jnp.bfloat16)
                         for x in _unpack4(blk(k_ref))] if k_packed
                        else [blk(k_ref).astype(w_ref.dtype)])
            v_halves = ([x.astype(jnp.bfloat16)
                         for x in _unpack4(blk(v_ref))] if v_packed
                        else [blk(v_ref)])
            # scores TRANSPOSED (O, bs): lane-dim softmax reductions + both
            # big dots in natural (M,K)x(K,N) form — no in-VMEM transposes
            # of the streamed blocks (only w (F,O), 32 KB, transposes)
            partials = [jax.lax.dot_general(
                w_ref[i].astype(k_halves[i].dtype), k_halves[i],
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
                for i in range(n_k_halves)]                 # (O, bs) each
            if quantized and k_half_scales:
                ks2 = blk(ks_ref).reshape(kh, 2, -1)        # (kh, 2, bs)
                s = sum(partials[i]
                        * jnp.repeat(ks2[:, i, :], rep, axis=0)
                        for i in range(n_k_halves))
            else:
                s = sum(partials)
        if quantized and not k_half_scales:
            ks = blk(ks_ref)                                # (kh, bs)
            s = s * jnp.repeat(ks, rep, axis=0)             # scale per row s
        pos = sb * block_s + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        bound = seq_len - (tokens - 1) + (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % tokens
            if tokens > 1 else 0)
        s = jnp.where(pos < bound, s, NEG_INF)
        m_prev = m_ref[:]                                   # (O, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                              # (O, bs)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        if v_half_scales:
            vs2 = blk(vs_ref).reshape(kh, 2, -1)            # (kh, 2, bs)
            p_halves = [p * jnp.repeat(vs2[:, i, :], rep, axis=0)
                        for i in range(n_v_halves)]
        elif quantized:
            p = p * jnp.repeat(blk(vs_ref), rep, axis=0)
            p_halves = [p] * n_v_halves
        else:
            p_halves = [p] * n_v_halves
        if int8_dots:
            # int8 p·V: per-row dynamic requantization of the (vs-folded)
            # probabilities; the v+8 rebias is corrected with rowsum(pi8) —
            # exact w.r.t. the quantized p (~2 decimal digits vs bf16's ~3)
            for i in range(n_v_halves):
                pi = p_halves[i]
                rs = jnp.maximum(jnp.max(pi, axis=1, keepdims=True),
                                 1e-30) / 127.0             # (O, 1)
                pi8 = jnp.clip(jnp.round(pi / rs), 0, 127).astype(jnp.int8)
                di = jax.lax.dot_general(
                    pi8, v_halves[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                if v_packed:
                    di = di - 8.0 * jnp.sum(
                        pi8.astype(jnp.int32), axis=1,
                        keepdims=True).astype(jnp.float32)
                acc_ref[i] = acc_ref[i] * alpha + di * rs
        else:
            # bf16 p·V on the MXU (f32 accumulate): p in [0,1] after the vs
            # fold keeps ~3 decimal digits — same trade the XLA quantized
            # path makes
            for i in range(n_v_halves):
                acc_ref[i] = acc_ref[i] * alpha + jax.lax.dot_general(
                    p_halves[i].astype(jnp.bfloat16),
                    v_halves[i].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (O, Fv)

    @pl.when(sb == pl.num_programs(1) - 1)
    def _():
        # diagonal-block extraction in VMEM: row group k of the folded
        # output keeps only its own head's D columns (lo|hi halves concat)
        l_inv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
        for j in range(kh):
            rows = slice(j * rep, (j + 1) * rep)
            cols = slice(j * vdw, (j + 1) * vdw)
            parts = [(acc_ref[i][rows, cols] * l_inv[rows]).astype(
                o_ref.dtype) for i in range(n_v_halves)]
            o_ref[0, rows] = (parts[0] if n_v_halves == 1
                              else jnp.concatenate(parts, axis=1))


def _auto_block_s(s: int, f: int, itemsize: int, block_s: Optional[int],
                  budget: int = 2 * 2 ** 20) -> int:
    """Largest VMEM-safe S-block: bigger blocks amortize per-step grid
    overhead (measured 365 -> 496 GB/s going 512 -> 1024 at f=256), but
    double-buffered k+v blocks (4 * budget bytes of stack) must fit the
    ~16MB scoped-vmem limit with headroom. Must be a multiple of 128
    (scale-block lane tiling) unless it covers all of S."""
    if block_s is None:
        block_s = max(budget // (f * itemsize) // 128 * 128, 128)
        block_s = min(block_s, 1024)
    return s if s <= block_s else block_s


@functools.partial(jax.jit,
                   static_argnames=("block_s", "scale", "tokens", "kv_bits",
                                    "v_bits", "int8_dots"))
def decode_attention_mxu(
    q: jnp.ndarray,                      # (B, O, D), O = H * tokens
    k_cache: jnp.ndarray,                # (B, S, Kh, D) bf16 or int8, or
                                         # (L, B, S, Kh*D) flat w/ `layer`;
                                         # int4: width D/2 nibble-packed
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,                # (B,) valid tokens: cached + window
    k_scale: Optional[jnp.ndarray] = None,   # (B, Kh, S) f32 head-major, or
                                             # (L, B, Kh, S) w/ `layer`
    v_scale: Optional[jnp.ndarray] = None,
    *,
    block_s: Optional[int] = None,
    scale: Optional[float] = None,
    tokens: int = 1,
    kv_bits: int = 8,
    v_bits: int = 0,                         # V bits when != K (k8v4 mixed)
    layer: Optional[jnp.ndarray] = None,     # traced scan index (stacked)
    int8_dots: Optional[bool] = None,        # None: int8 KV default via env
) -> jnp.ndarray:
    """Bandwidth-optimized GQA decode attention (see _kernel_mxu).

    Exact same semantics as ops.attention.attention_decode (tokens == 1) or
    attention_verify (tokens > 1, q rows ordered (kv-head, rep, t) and
    lengths = cached + tokens); the XLA formulation tops out near the f32
    VPU MAC roofline (~230 GB/s at rep=8) and XLA's memory-bound codegen
    stalls even plain reduces at ~370 GB/s — this kernel streams folded
    lane-aligned blocks and does the per-position math on the MXU. With
    `layer`, caches are the STACKED scan-over-layers arrays indexed
    in the Pallas index maps (an outside dynamic-slice would materialize a
    full-layer copy at the custom-call boundary)."""
    b, h, d = q.shape
    vb = v_bits or kv_bits
    dw = d // 2 if kv_bits == 4 else d    # stored per-head width (K)
    vdw = d // 2 if vb == 4 else d        # stored per-head width (V)
    n_halves = 2 if kv_bits == 4 else 1
    n_v_halves = 2 if vb == 4 else 1
    stacked = layer is not None
    if stacked:
        s, f = k_cache.shape[2], k_cache.shape[3]
        fv = v_cache.shape[3]            # may differ: mixed k8v4 V packing
        kf, vf = k_cache, v_cache
    else:
        s, kh4 = k_cache.shape[1], k_cache.shape[2]
        f = kh4 * dw
        fv = kh4 * vdw
        kf = k_cache.reshape(b, s, f)  # free: merges the two minor dims
        vf = v_cache.reshape(b, s, fv)  # (int8 streams int8; cast in VMEM)
    kh = f // dw
    scale = scale if scale is not None else d ** -0.5
    quantized = k_scale is not None
    bs = _auto_block_s(s, f, kf.dtype.itemsize, block_s)
    # int8 KV (packed int4 or plain int8): run BOTH kernel dots on the int8
    # MXU (2x the bf16 rate; this stage — not DMA — bounds the kernel at
    # MHA-wide shapes: 7B f=4096 measured 188 GB/s effective with bf16
    # dots). Opt out with DPT_ATTN_INT8=0 (bf16 dots, prior numerics).
    import os
    if int8_dots is None:
        int8_dots = os.environ.get("DPT_ATTN_INT8", "1") != "0"
    int8_dots = bool(int8_dots) and kf.dtype == jnp.int8
    w_dtype = jnp.int8 if int8_dots else (
        jnp.bfloat16 if kf.dtype == jnp.int8 else kf.dtype)
    num_sb = _cdiv(s, bs)

    def last_blk(sb, lens, bb):
        last = jnp.maximum(jax.lax.div(lens[bb] + bs - 1, bs) - 1, 0)
        return jnp.minimum(sb, last)

    if stacked:
        prefetch = (lengths.astype(jnp.int32),
                    jnp.asarray(layer).reshape(1).astype(jnp.int32))
        kv_idx = lambda bb, sb, lens, lay: (
            lay[0], bb, last_blk(sb, lens, bb), 0)
        scale_idx = lambda bb, sb, lens, lay: (
            lay[0], bb, 0, last_blk(sb, lens, bb))
        q_idx = lambda bb, sb, lens, lay: (bb, 0, 0)
        zero2 = lambda bb, sb, lens, lay: (0, 0)
        kv_spec = pl.BlockSpec((1, 1, bs, f), kv_idx)
        v_spec = pl.BlockSpec((1, 1, bs, fv), kv_idx)
        sc_spec = pl.BlockSpec((1, 1, kh, bs), scale_idx)
    else:
        prefetch = (lengths.astype(jnp.int32),)
        kv_idx = lambda bb, sb, lens: (bb, last_blk(sb, lens, bb), 0)
        scale_idx = lambda bb, sb, lens: (bb, 0, last_blk(sb, lens, bb))
        q_idx = lambda bb, sb, lens: (bb, 0, 0)
        zero2 = lambda bb, sb, lens: (0, 0)
        kv_spec = pl.BlockSpec((1, bs, f), kv_idx)
        v_spec = pl.BlockSpec((1, bs, fv), kv_idx)
        sc_spec = pl.BlockSpec((1, kh, bs), scale_idx)

    in_specs = [pl.BlockSpec((1, h, d), q_idx), kv_spec, v_spec]
    args = [q, kf, vf]
    if quantized:
        # scales are stored HEAD-major (.., Kh, S) — exactly the kernel's
        # consumption orientation, and S-minor tiles compactly in HBM.
        # Contiguous int4 K may carry 2 sub-block scale rows per head
        # (rows 2k+half — the half-scale layout the Δppl gate demanded).
        ksr = k_scale.shape[-2]
        vsr = v_scale.shape[-2]
        if stacked:
            k_sc_spec = (sc_spec if ksr == kh else
                         pl.BlockSpec((1, 1, ksr, bs), scale_idx))
            v_sc_spec = (sc_spec if vsr == kh else
                         pl.BlockSpec((1, 1, vsr, bs), scale_idx))
        else:
            k_sc_spec = (sc_spec if ksr == kh else
                         pl.BlockSpec((1, ksr, bs), scale_idx))
            v_sc_spec = (sc_spec if vsr == kh else
                         pl.BlockSpec((1, vsr, bs), scale_idx))
        in_specs += [k_sc_spec, v_sc_spec]
        args += [k_scale, v_scale]
    else:
        in_specs += [pl.BlockSpec((1, 1), zero2),
                     pl.BlockSpec((1, 1), zero2)]
        dummy = jnp.zeros((1, 1), dtype=jnp.float32)
        args += [dummy, dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, num_sb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), q_idx),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),          # m (per out row)
            pltpu.VMEM((h, 1), jnp.float32),          # l
            pltpu.VMEM((n_v_halves, h, fv), jnp.float32),  # acc/V-half
            pltpu.VMEM((n_halves, f, h), w_dtype),    # block-diagonal W(s)
        ] + ([pltpu.VMEM((2, h, 128), jnp.float32)]   # qs + rebias rowsums
             if int8_dots else []),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_mxu, block_s=bs, kh=kh, scale=scale,
                          quantized=quantized, tokens=tokens,
                          stacked=stacked, kv_bits=kv_bits, v_bits=v_bits,
                          int8_dots=int8_dots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * f * h,
            bytes_accessed=2 * b * s * f * (1 if quantized else 2),
            transcendentals=b * h * s),
        interpret=_interpret(),
    )(*prefetch, *args)
    return out


def _fold_tokens(q):
    """(B, T, H, D) -> (B, H*T, D) with rows ordered (head, t) — the
    head-folded kernels' required output-row order."""
    b, t, h, d = q.shape
    return jnp.transpose(q, (0, 2, 1, 3)).reshape(b, h * t, d)


def _unfold_tokens(out, t):
    """(B, H*T, D) -> (B, T, H, D)."""
    b, ht, d = out.shape
    return jnp.transpose(out.reshape(b, ht // t, t, d), (0, 2, 1, 3))


def verify_attention_mxu(
    q: jnp.ndarray,                      # (B, T, H, D) verify-window queries
    k_cache: jnp.ndarray,                # as decode_attention_mxu
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,                # (B,) tokens cached BEFORE window
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    kv_bits: int = 8,
    v_bits: int = 0,
    layer: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Speculative-verify attention on the head-folded MXU kernel: the T
    window tokens fold into extra output rows (O = H*T), so the cache
    streams ONCE for the whole window with the same per-slot length-bounded
    reads as decode. Matches ops.attention.attention_verify."""
    t = q.shape[1]
    out = decode_attention_mxu(_fold_tokens(q), k_cache, v_cache,
                               lengths + t, k_scale, v_scale,
                               scale=scale, tokens=t, kv_bits=kv_bits,
                               v_bits=v_bits, layer=layer)
    return _unfold_tokens(out, t)


def _kernel_mxu_paged_db(len_ref, tab_ref, q_ref, k_hbm, v_hbm, ks_hbm,
                         vs_hbm, o_ref, m_ref, l_ref, acc_ref, w_ref,
                         k_buf, v_buf, ks_buf, vs_buf, sems, *,
                         page: int, grp: int, kh: int, wp: int,
                         scale: float, quantized: bool, tokens: int = 1,
                         kv_bits: int = 8, v_bits: int = 0):
    """decode_attention_mxu over a paged pool with MANUAL double-buffered
    multi-page DMA: one (page, F) block per grid step was latency-bound
    (~82 GB/s — per-step overhead dwarfs a 64KB DMA), so each super-step
    copies `grp` table-scattered pages into a VMEM buffer while the MXU
    works on the previous buffer. Pools stay in ANY/HBM space; the page
    table and lengths ride scalar prefetch. DMAs for steps past a slot's
    live length are never issued (reads track per-slot length).

    K and V packings are independent (mixed k8v4), and packed int4 sides
    may carry 2 sub-block scales per head (rows 2*head+half) — the paged
    layout now runs the same quality-gated modes as the contiguous one."""
    b = pl.program_id(0)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)
    seq_len = len_ref[b]
    h, d = q_ref.shape[1], q_ref.shape[2]
    k_packed = kv_bits == 4
    v_packed = (v_bits or kv_bits) == 4
    # int4 pools store nibble-packed half-split heads (width D/2): the
    # kernel works in folded half-spaces like _kernel_mxu — halved DMA
    # traffic is the entire point of int4 KV
    kdw = d // 2 if k_packed else d
    vdw = d // 2 if v_packed else d
    fk = kh * kdw
    n_k_halves = 2 if k_packed else 1
    n_v_halves = 2 if v_packed else 1
    ksr = ks_buf.shape[1] if quantized else 0
    vsr = vs_buf.shape[1] if quantized else 0
    k_half_scales = quantized and k_packed and ksr == 2 * kh
    v_half_scales = quantized and v_packed and vsr == 2 * kh
    rep = h // kh
    rows = grp * page
    live_sb = jax.lax.div(seq_len + rows - 1, rows)         # super-steps

    def start_dmas(s, slot):
        """Issue page DMAs for super-step s into buffer `slot`."""
        for g in range(grp):
            vp = s * grp + g
            pid = tab_ref[b * wp + jnp.minimum(vp, wp - 1)]

            @pl.when(vp * page < seq_len)
            def _(g=g, pid=pid):
                pltpu.make_async_copy(
                    k_hbm.at[pid], k_buf.at[slot, pl.ds(g * page, page)],
                    sems.at[slot, 0, g]).start()
                pltpu.make_async_copy(
                    v_hbm.at[pid], v_buf.at[slot, pl.ds(g * page, page)],
                    sems.at[slot, 1, g]).start()
                if quantized:
                    pltpu.make_async_copy(
                        ks_hbm.at[pid],
                        ks_buf.at[slot, slice(None), pl.ds(g * page, page)],
                        sems.at[slot, 2, g]).start()
                    pltpu.make_async_copy(
                        vs_hbm.at[pid],
                        vs_buf.at[slot, slice(None), pl.ds(g * page, page)],
                        sems.at[slot, 3, g]).start()

    def wait_dmas(s, slot):
        for g in range(grp):
            vp = s * grp + g

            @pl.when(vp * page < seq_len)
            def _(g=g):
                pltpu.make_async_copy(
                    k_hbm.at[0], k_buf.at[slot, pl.ds(g * page, page)],
                    sems.at[slot, 0, g]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0], v_buf.at[slot, pl.ds(g * page, page)],
                    sems.at[slot, 1, g]).wait()
                if quantized:
                    pltpu.make_async_copy(
                        ks_hbm.at[0],
                        ks_buf.at[slot, slice(None), pl.ds(g * page, page)],
                        sems.at[slot, 2, g]).wait()
                    pltpu.make_async_copy(
                        vs_hbm.at[0],
                        vs_buf.at[slot, slice(None), pl.ds(g * page, page)],
                        sems.at[slot, 3, g]).wait()

    def build_w(q_half, half):
        wfull = jnp.broadcast_to(q_half.T[None], (kh, kdw, h)).reshape(fk, h)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (fk, h), 0) // kdw
        col_k = jax.lax.broadcasted_iota(jnp.int32, (fk, h), 1) // rep
        w_ref[half] = jnp.where(row_k == col_k, wfull,
                                0.0).astype(w_ref.dtype)

    @pl.when(sb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0].astype(jnp.float32) * scale            # (H, D)
        if k_packed:
            build_w(q[:, :kdw], 0)
            build_w(q[:, kdw:], 1)
        else:
            build_w(q, 0)
        start_dmas(0, 0)

    @pl.when(sb < live_sb)
    def _():
        slot = jax.lax.rem(sb, 2)
        # prefetch the NEXT super-block into the other buffer first
        @pl.when(sb + 1 < live_sb)
        def _():
            start_dmas(sb + 1, 1 - slot)
        wait_dmas(sb, slot)

        k_halves = ([x.astype(jnp.bfloat16) for x in _unpack4(k_buf[slot])]
                    if k_packed else [k_buf[slot].astype(w_ref.dtype)])
        v_halves = ([x.astype(jnp.bfloat16) for x in _unpack4(v_buf[slot])]
                    if v_packed else [v_buf[slot]])
        partials = [jax.lax.dot_general(
            w_ref[i].astype(k_halves[i].dtype), k_halves[i],
            (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
            for i in range(n_k_halves)]                     # (O, rows) each
        if k_half_scales:
            ks2 = ks_buf[slot].reshape(kh, 2, -1)           # (kh, 2, rows)
            s = sum(partials[i] * jnp.repeat(ks2[:, i, :], rep, axis=0)
                    for i in range(n_k_halves))
        else:
            s = sum(partials)
            if quantized:
                s = s * jnp.repeat(ks_buf[slot], rep, axis=0)
        pos = sb * rows + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        bound = seq_len - (tokens - 1) + (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % tokens
            if tokens > 1 else 0)
        valid = pos < bound
        s = jnp.where(valid, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        # re-mask AFTER the scale fold: columns past a slot's live pages
        # read UNINITIALIZED scale buffer values (never DMA'd), and
        # p=0 times garbage is only safe when the garbage is finite
        if v_half_scales:
            vs2 = vs_buf[slot].reshape(kh, 2, -1)           # (kh, 2, rows)
            p_halves = [jnp.where(valid,
                                  p * jnp.repeat(vs2[:, i, :], rep, axis=0),
                                  0.0)
                        for i in range(n_v_halves)]
        elif quantized:
            p = jnp.where(valid, p * jnp.repeat(vs_buf[slot], rep, axis=0),
                          0.0)
            p_halves = [p] * n_v_halves
        else:
            p_halves = [p] * n_v_halves
        for i in range(n_v_halves):
            acc_ref[i] = acc_ref[i] * alpha + jax.lax.dot_general(
                p_halves[i].astype(jnp.bfloat16),
                v_halves[i].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (O, Fv)

    @pl.when(sb == n_sb - 1)
    def _():
        l_inv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
        for j in range(kh):
            rows_j = slice(j * rep, (j + 1) * rep)
            cols_j = slice(j * vdw, (j + 1) * vdw)
            parts = [(acc_ref[i][rows_j, cols_j] * l_inv[rows_j]).astype(
                o_ref.dtype) for i in range(n_v_halves)]
            o_ref[0, rows_j] = (parts[0] if n_v_halves == 1
                                else jnp.concatenate(parts, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("scale", "tokens", "kv_bits", "v_bits"))
def decode_attention_paged_mxu(
    q: jnp.ndarray,                      # (B, H, D)
    k_pool: jnp.ndarray,                 # (P, page, F) bf16/int8; F=Kh*D/2 int4
    v_pool: jnp.ndarray,
    table: jnp.ndarray,                  # (B, WP) int32 page ids
    lengths: jnp.ndarray,                # (B,) valid tokens (incl. current)
    k_scale: Optional[jnp.ndarray] = None,   # (P, Kh|2Kh, page) f32
    v_scale: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    tokens: int = 1,
    kv_bits: int = 8,
    v_bits: int = 0,                     # V bits when != K (k8v4 mixed)
) -> jnp.ndarray:
    """decode_attention_mxu over the paged KV layout: the S-grid walks the
    prefetched page table, streaming only each slot's LIVE pages straight
    from the shared pool — no gather materialization (the jnp.take path
    writes + rereads the whole windowed view every layer every step). Blocks
    beyond a slot's live length clamp to its last live page (no new DMA,
    compute skipped), so reads track per-slot lengths below the engine's
    window bucket."""
    b, h, d = q.shape
    ps, f = k_pool.shape[1], k_pool.shape[2]
    vb = v_bits or kv_bits
    kdw = d // 2 if kv_bits == 4 else d   # stored per-head K width
    vdw = d // 2 if vb == 4 else d
    kh = f // kdw
    fv = kh * vdw
    n_v_halves = 2 if vb == 4 else 1
    n_k_halves = 2 if kv_bits == 4 else 1
    wp = table.shape[1]
    scale = scale if scale is not None else d ** -0.5
    quantized = k_scale is not None

    # super-block: ~512 rows per step, VMEM-bounded (see _auto_block_s)
    grp = max(min(512 // ps, wp,
                  (2 ** 20) // (ps * f * k_pool.dtype.itemsize)), 1)
    num_sb = _cdiv(wp, grp)
    rows = grp * ps

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [
        pl.BlockSpec((1, h, d), lambda bb, sb, lens, tab: (bb, 0, 0)),
        any_spec, any_spec, any_spec, any_spec,
    ]
    if quantized:
        args = [q, k_pool, v_pool, k_scale, v_scale]
        sdtype = k_scale.dtype
        ksr, vsr = k_scale.shape[1], v_scale.shape[1]
    else:
        dummy = jnp.zeros((1, 1, 1), dtype=jnp.float32)
        args = [q, k_pool, v_pool, dummy, dummy]
        sdtype = jnp.float32
        ksr = vsr = kh

    w_dtype = jnp.bfloat16 if k_pool.dtype == jnp.int8 else k_pool.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, num_sb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d),
                               lambda bb, sb, lens, tab: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),          # m
            pltpu.VMEM((h, 1), jnp.float32),          # l
            pltpu.VMEM((n_v_halves, h, fv), jnp.float32),  # acc per V-half
            pltpu.VMEM((n_k_halves, f, h), w_dtype),  # block-diagonal W
            pltpu.VMEM((2, rows, f), k_pool.dtype),   # k double buffer
            pltpu.VMEM((2, rows, v_pool.shape[2]), v_pool.dtype),
            pltpu.VMEM((2, ksr, rows), sdtype),       # k_scale buffer
            pltpu.VMEM((2, vsr, rows), sdtype),       # v_scale buffer
            pltpu.SemaphoreType.DMA((2, 4, grp)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_mxu_paged_db, page=ps, grp=grp, kh=kh,
                          wp=wp, scale=scale, quantized=quantized,
                          tokens=tokens, kv_bits=kv_bits, v_bits=v_bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * wp * ps * f * h,
            bytes_accessed=2 * b * wp * ps * f * (1 if quantized else 2),
            transcendentals=b * h * wp * ps),
        interpret=_interpret(),
    )(lengths.astype(jnp.int32), table.reshape(-1).astype(jnp.int32), *args)


# ---------------------------------------------------------------------------
# Chunk-transposed ("kt") decode attention — the MHA bandwidth kernel
# ---------------------------------------------------------------------------
#
# Why: the head-folded kernel above reads at S-block granularity (>= 512 rows
# at 7B shapes) and scores with (bs, F) @ (F, O) dots whose M dim carries the
# positions — at rep = 1 (MHA) that is ~16x the MXU tile-cycles of the
# per-head orientation (rep, d) @ (d, bs), and the grid pays ~0.9 us per DEAD
# S-block step at serving lengths (measured, scripts/bench_attn_variants.py).
# This kernel:
#   - stores K chunk-TRANSPOSED: kt (B, C, F, 128), chunk c = positions
#     [c*128, (c+1)*128) feature-major, so score dots run (rep*T, d) @
#     (d, 128) with positions in lanes and queries in the 8-wide sublane dim;
#   - keeps the ROW-major k (B, S, F) as the source of truth — appends stay
#     cheap row scatters (ops/pallas/kv_append.py, unchanged), and the
#     kernel itself FLUSHES a completed chunk (transpose in VMEM, one DMA)
#     from the freshly-loaded tail rows into kt, so no separate flush pass
#     exists. kt is a derived acceleration MIRROR (K bytes duplicated on
#     this layout; the paged layout remains the capacity-bound path);
#   - runs ONE dynamic loop over the batch's total live 128-row units with
#     manual double-buffered DMA (nbuf deep) — dead chunks cost nothing and
#     reads track each slot's length at 128-row granularity (2.8x less HBM
#     traffic than the 512-row block clamp at the 7B bench's length profile;
#     measured 21.1 vs 42.2 us/layer-call).
# V stays row-major (B, S, FV) — p @ V wants positions in the contraction
# sublanes, which is the layout appends already produce.
#
# Invariants (stateless, no flush bookkeeping):
#   - kt[b, c] is valid whenever a reader needs it: readers touch chunk c
#     only once cached = lengths - tokens >= (c+1)*128; prefill writers
#     transpose every chunk they cover, and the kernel re-flushes chunk c
#     (from the row-major tail rows) on every tail unit with
#     (c+1)*128 <= lengths — so chunks made stale by speculative-window
#     rejection or prefix-copy self-heal before becoming readable.
# Reference behavior anchor: KV-cache consumption in the decode loop,
# /root/reference/src/core/execution/models/gpt_model.cpp:362-430, 532-545.


def kt_group(f: int, c_chunks: int) -> int:
    """Chunks per DMA unit for the kt kernel: group narrow-F caches so one
    K-unit DMA is >= 256 KB (128-chunk DMAs at F = 512 measured
    issue-overhead-bound), constrained to divide C so every unit's V/scale
    rows stay in bounds."""
    grp = max(1, min(8, 2048 // max(f, 1)))
    while grp > 1 and c_chunks % grp:
        grp -= 1
    return grp


def _kt_kernel(len_ref, q_ref, kt_hbm, k_hbm, v_hbm, ks_hbm, vs_hbm,
               o_ref, kt_out, m_ref, l_ref, acc_ref, kbuf, ktail, vbuf,
               ksbuf, vsbuf, ttr_ref, tq_ref, s_ref, sems, fsem, *, kh: int,
               scale: float, tokens: int, v_bits: int, nbuf: int, grp: int):
    bsz = len_ref.shape[0]
    o_rows, d = q_ref.shape[1], q_ref.shape[2]
    rep = o_rows // kh                    # = true_rep * tokens
    f = kh * d
    fv = vbuf.shape[2]
    vdw = fv // kh
    n_v_halves = 2 if v_bits == 4 else 1
    rows_u = grp * 128                    # rows per full unit

    # per-slot live units: ceil(full/grp) grouped chunk units + 1-2 tail
    # units of 128 rows (full = committed chunks; the derivation in the
    # header bounds full <= C-1 and tail chunk indices <= C-1, so every DMA
    # below is in range given grp | C)
    fulls, fullus, iters, cums = [], [], [], [jnp.int32(0)]
    for i in range(bsz):
        ln = len_ref[i]
        full = jnp.maximum((ln - tokens) // 128, 0)
        fullu = jax.lax.div(full + grp - 1, grp)
        n_tail = ln - full * 128
        it = fullu + jax.lax.div(n_tail + 127, 128)
        it = jnp.where(ln > 0, it, 0)
        fulls.append(full)
        fullus.append(fullu)
        iters.append(it)
        cums.append(cums[-1] + it)
    total = cums[-1]

    def pick(b, vals):
        r = jnp.int32(0) if vals[0].dtype == jnp.int32 else jnp.float32(0)
        for i in range(bsz):
            r = r + jnp.where(b == i, vals[i], 0)
        return r

    def slot_of(t):
        b = jnp.int32(0)
        for i in range(1, bsz):
            b = b + (t >= cums[i]).astype(jnp.int32)
        return b

    def unit_of(t):
        """-> (b, is_tail, c0 first chunk, rows base row)."""
        b = slot_of(t)
        u = t - pick(b, cums[:-1])
        fullu = pick(b, fullus)
        is_tail = u >= fullu
        c0 = jnp.where(is_tail, pick(b, fulls) + (u - fullu), u * grp)
        n_rows = jnp.where(is_tail, 128, rows_u)
        return b, is_tail, c0, n_rows

    def issue(t, slot):
        b, is_tail, c0, _ = unit_of(t)

        @pl.when(jnp.logical_not(is_tail))
        def _():
            pltpu.make_async_copy(kt_hbm.at[b, pl.ds(c0, grp)],
                                  kbuf.at[slot], sems.at[slot, 0]).start()
            pltpu.make_async_copy(v_hbm.at[b, pl.ds(c0 * 128, rows_u), :],
                                  vbuf.at[slot], sems.at[slot, 2]).start()
            pltpu.make_async_copy(ks_hbm.at[b, :, pl.ds(c0 * 128, rows_u)],
                                  ksbuf.at[slot], sems.at[slot, 3]).start()
            pltpu.make_async_copy(vs_hbm.at[b, :, pl.ds(c0 * 128, rows_u)],
                                  vsbuf.at[slot], sems.at[slot, 4]).start()

        @pl.when(is_tail)
        def _():
            pltpu.make_async_copy(k_hbm.at[b, pl.ds(c0 * 128, 128), :],
                                  ktail.at[slot], sems.at[slot, 1]).start()
            pltpu.make_async_copy(v_hbm.at[b, pl.ds(c0 * 128, 128), :],
                                  vbuf.at[slot, pl.ds(0, 128), :],
                                  sems.at[slot, 2]).start()
            pltpu.make_async_copy(ks_hbm.at[b, :, pl.ds(c0 * 128, 128)],
                                  ksbuf.at[slot, :, pl.ds(0, 128)],
                                  sems.at[slot, 3]).start()
            pltpu.make_async_copy(vs_hbm.at[b, :, pl.ds(c0 * 128, 128)],
                                  vsbuf.at[slot, :, pl.ds(0, 128)],
                                  sems.at[slot, 4]).start()

    def wait(t, slot):
        b, is_tail, c0, _ = unit_of(t)

        @pl.when(jnp.logical_not(is_tail))
        def _():
            pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot],
                                  sems.at[slot, 2]).wait()
            pltpu.make_async_copy(ksbuf.at[slot], ksbuf.at[slot],
                                  sems.at[slot, 3]).wait()
            pltpu.make_async_copy(vsbuf.at[slot], vsbuf.at[slot],
                                  sems.at[slot, 4]).wait()

        @pl.when(is_tail)
        def _():
            pltpu.make_async_copy(ktail.at[slot], ktail.at[slot],
                                  sems.at[slot, 1]).wait()
            pltpu.make_async_copy(vbuf.at[slot, pl.ds(0, 128), :],
                                  vbuf.at[slot, pl.ds(0, 128), :],
                                  sems.at[slot, 2]).wait()
            pltpu.make_async_copy(ksbuf.at[slot, :, pl.ds(0, 128)],
                                  ksbuf.at[slot, :, pl.ds(0, 128)],
                                  sems.at[slot, 3]).wait()
            pltpu.make_async_copy(vsbuf.at[slot, :, pl.ds(0, 128)],
                                  vsbuf.at[slot, :, pl.ds(0, 128)],
                                  sems.at[slot, 4]).wait()

    o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(total > 0)
    def _():
        if grp > 1:
            # tail units DMA only the first 128 V-scale columns; the stale
            # remainder multiplies p = 0 exactly — but uninitialized VMEM
            # can hold NaN bit patterns and NaN * 0 = NaN, so zero once
            vsbuf[:] = jnp.zeros_like(vsbuf)
        for w in range(nbuf - 1):
            @pl.when(jnp.int32(w) < total)
            def _(w=w):
                issue(jnp.int32(w), jnp.int32(w))

        def body(t, _):
            b, is_tail, c0, _n = unit_of(t)
            u = t - pick(b, cums[:-1])
            seq_len = len_ref[b]
            full = pick(b, fulls)
            slot = jax.lax.rem(t, nbuf)

            @pl.when(t + nbuf - 1 < total)
            def _():
                issue(t + nbuf - 1, jax.lax.rem(t + nbuf - 1, nbuf))

            wait(t, slot)

            @pl.when(u == 0)
            def _():
                m_ref[:] = jnp.full_like(m_ref, NEG_INF)
                l_ref[:] = jnp.zeros_like(l_ref)
                acc_ref[:] = jnp.zeros_like(acc_ref)

            q = (q_ref[b].astype(jnp.float32) * scale).astype(jnp.bfloat16)

            # scores into s_ref (O, rows_u): chunk units dot the grp
            # pre-transposed chunks directly; tail units transpose the
            # freshly-loaded row-major rows in VMEM first (int8 values are
            # exact in bf16, so the flush roundtrip below is bit-exact)
            @pl.when(jnp.logical_not(is_tail))
            def _():
                for j in range(kh):
                    qj = q[j * rep:(j + 1) * rep]
                    cols = [jax.lax.dot_general(
                        qj, kbuf[slot, ci, j * d:(j + 1) * d, :].astype(
                            jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        for ci in range(grp)]
                    s_ref[j * rep:(j + 1) * rep] = (
                        jnp.concatenate(cols, axis=1) if grp > 1 else cols[0])

            @pl.when(is_tail)
            def _():
                ttr_ref[:] = jnp.swapaxes(
                    ktail[slot].astype(jnp.bfloat16), 0, 1)
                for j in range(kh):
                    s_ref[j * rep:(j + 1) * rep, 0:128] = jax.lax.dot_general(
                        q[j * rep:(j + 1) * rep],
                        ttr_ref[j * d:(j + 1) * d, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            s = s_ref[:] * jnp.repeat(ksbuf[slot], rep, axis=0)  # (O, rows_u)
            pos = c0 * 128 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            bound = seq_len - (tokens - 1) + (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % tokens
                if tokens > 1 else 0)
            # chunk units hold only committed rows (bound there is the
            # flushed-chunk frontier); tail units mask to their 128 columns
            bound = jnp.where(is_tail, bound, full * 128)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            valid = (pos < bound) & (jnp.logical_not(is_tail) | (col < 128))
            s = jnp.where(valid, s, NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:] = m_new
            if v_bits == 4:
                v_halves = _unpack4_u8(vbuf[slot])            # planes: v+8
                vs2 = vsbuf[slot].reshape(kh, 2, -1)
                for i in range(n_v_halves):
                    pi = (p * jnp.repeat(vs2[:, i, :], rep, axis=0)).astype(
                        jnp.bfloat16)
                    di = jax.lax.dot_general(
                        pi, v_halves[i].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    di = di - 8.0 * jnp.sum(pi.astype(jnp.float32), axis=1,
                                            keepdims=True)
                    acc_ref[i] = acc_ref[i] * alpha + di
            else:
                pi = (p * jnp.repeat(vsbuf[slot], rep, axis=0)).astype(
                    jnp.bfloat16)
                acc_ref[0] = acc_ref[0] * alpha + jax.lax.dot_general(
                    pi, vbuf[slot].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            # flush: this tail unit's 128 rows complete chunk c0
            @pl.when(is_tail & ((c0 + 1) * 128 <= seq_len))
            def _():
                tq_ref[:] = jnp.round(ttr_ref[:].astype(jnp.float32)).astype(
                    jnp.int8)
                cp = pltpu.make_async_copy(tq_ref, kt_out.at[b, c0], fsem)
                cp.start()
                cp.wait()

            @pl.when(u == pick(b, iters) - 1)
            def _():
                l_inv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
                for j in range(kh):
                    rws = slice(j * rep, (j + 1) * rep)
                    cls = slice(j * vdw, (j + 1) * vdw)
                    parts = [(acc_ref[i][rws, cls] * l_inv[rws]).astype(
                        o_ref.dtype) for i in range(n_v_halves)]
                    o_ref[b, rws] = (parts[0] if n_v_halves == 1
                                     else jnp.concatenate(parts, axis=1))
            return 0

        jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("scale", "tokens", "v_bits", "nbuf"))
def decode_attention_kt(
    q: jnp.ndarray,                      # (B, O, D), O = H * tokens
    kt: jnp.ndarray,                     # (B, C, Kh*D, 128) int8 chunks
    k: jnp.ndarray,                      # (B, S, Kh*D) int8 row-major source
    v: jnp.ndarray,                      # (B, S, FV) int8; FV=Kh*D(/2 int4)
    lengths: jnp.ndarray,                # (B,) valid tokens incl. window
    k_scale: jnp.ndarray,                # (B, Kh, S) f32
    v_scale: jnp.ndarray,                # (B, Kh|2Kh, S) f32
    *,
    scale: Optional[float] = None,
    tokens: int = 1,
    v_bits: int = 8,
    nbuf: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk-transposed decode/verify attention (see _kt_kernel).

    Returns (out (B, O, D), kt_updated) — kt is aliased in place; the kernel
    flushes any chunk its tail rows complete. Same semantics as
    decode_attention_mxu given the kt-mirror invariants above."""
    b, o_rows, d = q.shape
    f = kt.shape[2]
    kh = f // d
    fv = v.shape[2]
    scale = scale if scale is not None else d ** -0.5
    n_v_halves = 2 if v_bits == 4 else 1
    grp = kt_group(f, kt.shape[1])
    ru = grp * 128
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((b, o_rows, d), lambda i, ln: (0, 0, 0)),
                  any_spec, any_spec, any_spec, any_spec, any_spec],
        out_specs=(pl.BlockSpec((b, o_rows, d), lambda i, ln: (0, 0, 0)),
                   any_spec),
        scratch_shapes=[
            pltpu.VMEM((o_rows, 1), jnp.float32),              # m
            pltpu.VMEM((o_rows, 1), jnp.float32),              # l
            pltpu.VMEM((n_v_halves, o_rows, fv), jnp.float32),  # acc
            pltpu.VMEM((nbuf, grp, f, 128), jnp.int8),         # kt units
            pltpu.VMEM((nbuf, 128, f), jnp.int8),              # tail rows
            pltpu.VMEM((nbuf, ru, fv), jnp.int8),              # v rows
            pltpu.VMEM((nbuf, kh, ru), jnp.float32),           # k scales
            pltpu.VMEM((nbuf, v_scale.shape[1], ru), jnp.float32),
            pltpu.VMEM((f, 128), jnp.bfloat16),                # tail source
            pltpu.VMEM((f, 128), jnp.int8),                    # flush stage
            pltpu.VMEM((o_rows, ru), jnp.float32),             # scores
            pltpu.SemaphoreType.DMA((nbuf, 5)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kt_kernel, kh=kh, scale=scale, tokens=tokens,
                          v_bits=v_bits, nbuf=nbuf, grp=grp),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, o_rows, d), q.dtype),
                   jax.ShapeDtypeStruct(kt.shape, kt.dtype)),
        input_output_aliases={2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kt.shape[1] * 128 * f * o_rows // max(kh, 1),
            bytes_accessed=b * kt.shape[1] * 128 * (f + fv),
            transcendentals=b * o_rows * kt.shape[1] * 128),
        interpret=_interpret(),
    )(lengths.astype(jnp.int32), q, kt, k, v, k_scale, v_scale)


def verify_attention_kt(q, kt, k, v, lengths, k_scale, v_scale, *,
                        scale=None, v_bits=8):
    """Speculative-verify attention over the kt layout: T window tokens fold
    into extra output rows (see verify_attention_mxu)."""
    t = q.shape[1]
    out, kt_new = decode_attention_kt(
        _fold_tokens(q), kt, k, v, lengths + t, k_scale, v_scale,
        scale=scale, tokens=t, v_bits=v_bits)
    return _unfold_tokens(out, t), kt_new


@functools.partial(jax.jit, static_argnames=("block_s", "scale"))
def decode_attention_kernel(
    q: jnp.ndarray,                      # (B, H, D)
    k_cache: jnp.ndarray,                # (B, S, Kh, D) bf16 or int8
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,                # (B,) valid tokens (incl. current)
    k_scale: Optional[jnp.ndarray] = None,   # (B, Kh, S) f32 head-major
    v_scale: Optional[jnp.ndarray] = None,
    *,
    block_s: Optional[int] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    b, h, d = q.shape
    s, kh = k_cache.shape[1], k_cache.shape[2]
    rep = h // kh
    scale = scale if scale is not None else d ** -0.5
    quantized = k_scale is not None
    # halved budget: this kernel's in-VMEM f32 casts of the k/v blocks are
    # stack allocations on top of the double-buffered blocks themselves
    bs = _auto_block_s(s, kh * d, k_cache.dtype.itemsize, block_s,
                       budget=2 ** 20)

    num_sb = _cdiv(s, bs)

    def kv_idx(bb, sb, lens):
        last = jnp.maximum(jax.lax.div(lens[bb] + bs - 1, bs) - 1, 0)
        return (bb, jnp.minimum(sb, last), 0, 0)

    in_specs = [
        pl.BlockSpec((1, h, d), lambda bb, sb, lens: (bb, 0, 0)),
        pl.BlockSpec((1, bs, kh, d), kv_idx),
        pl.BlockSpec((1, bs, kh, d), kv_idx),
    ]
    args = [q, k_cache, v_cache]
    if quantized:
        def scale_idx4(bb, sb, lens):
            last = jnp.maximum(jax.lax.div(lens[bb] + bs - 1, bs) - 1, 0)
            return (bb, 0, jnp.minimum(sb, last))

        in_specs += [pl.BlockSpec((1, kh, bs), scale_idx4),
                     pl.BlockSpec((1, kh, bs), scale_idx4)]
        args += [k_scale, v_scale]
    else:
        # dummy scalar inputs keep the kernel signature uniform
        in_specs += [pl.BlockSpec((1, 1), lambda bb, sb, lens: (0, 0)),
                     pl.BlockSpec((1, 1), lambda bb, sb, lens: (0, 0))]
        dummy = jnp.zeros((1, 1), dtype=jnp.float32)
        args += [dummy, dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_sb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), lambda bb, sb, lens: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),         # m (head-major rows)
            pltpu.VMEM((h, 1), jnp.float32),         # l
            pltpu.VMEM((h, d), jnp.float32),         # acc
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_s=bs, rep=rep, scale=scale,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * d,
            bytes_accessed=2 * b * s * kh * d * (1 if quantized else 2),
            transcendentals=b * h * s),
        interpret=_interpret(),
    )(lengths.astype(jnp.int32), *args)
    return out


def verify_attention_paged_mxu(
    q: jnp.ndarray,                      # (B, T, H, D)
    k_pool: jnp.ndarray,                 # (P, page, F)
    v_pool: jnp.ndarray,
    table: jnp.ndarray,                  # (B, WP)
    lengths: jnp.ndarray,                # (B,) tokens cached BEFORE window
    k_scale: Optional[jnp.ndarray] = None,   # (P, Kh|2Kh, page)
    v_scale: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    kv_bits: int = 8,
    v_bits: int = 0,
) -> jnp.ndarray:
    """Speculative-verify attention over the paged pool (see
    verify_attention_mxu): the T window tokens fold into extra output rows,
    one table-walking pass over the live pages."""
    t = q.shape[1]
    out = decode_attention_paged_mxu(_fold_tokens(q), k_pool, v_pool, table,
                                     lengths + t, k_scale, v_scale,
                                     scale=scale, tokens=t, kv_bits=kv_bits,
                                     v_bits=v_bits)
    return _unfold_tokens(out, t)
