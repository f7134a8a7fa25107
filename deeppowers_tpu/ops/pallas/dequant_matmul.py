"""Fused int8/int4 dequant -> bf16 MXU matmul (Pallas TPU kernel).

The central kernel of the framework (BASELINE.json north star: ">=90% of
roofline dequant-matmul throughput"). Weights stay packed in HBM; each grid
step DMAs an int8 block into VMEM, casts to bf16 (int4: two nibble planes),
feeds the MXU, and applies quantization scales to the f32 partial sums —
closing the gap SURVEY.md §3.4 flags in the reference (its dequantization was
a separate kernel pass writing fp tensors back to HBM:
src/core/execution/models/quantization_kernels.cu vs gpt_kernels.cu:190-233).

Key design points:
- Weight-stationary grid (M/BM, N/BN, K/BK) with sequential K accumulation
  into a VMEM f32 scratch; total HBM traffic ~= K*N bytes (the packed
  weights) + activations once per N-block.
- Scales applied *after* each partial dot on the (BM, BN) output block
  ("post" mode) when the K-block lies inside one quantization group —
  O(BM*BN) VPU work instead of O(BK*BN); "pre" mode row-scales the weight
  block for group sizes smaller than the K block.
- int4 uses the half-split packing (quant/qtypes.py): the low-nibble plane is
  rows [0, K/2), the high-nibble plane rows [K/2, K), so the kernel runs two
  MXU dots per block against two activation slices — no lane shuffles.

Decode-loop fusion modes (dequant_matmul_fused) — small-batch decode is
launch-count-bound (~6-10us fixed cost per fused op on this runtime;
docs/benchmarks.md "decode step anatomy"), so the neighbours of each matmul
fold INTO the kernel:
- rms_weight: RMSNorm folded in. The kernel dots the RAW hidden state
  (row-scaled by the norm weight g per K-block on the VPU) and multiplies the
  output rows by rsqrt(mean(x^2) + eps), accumulated across K blocks in a
  VMEM scratch — exact because the RMS row scale is a per-row scalar:
  rmsnorm(x) @ W == (x*g @ W) * rsqrt(mean(x^2)+eps).
- glu: x is the fused gate|up activation (M, 2K); the kernel computes
  act(gate)*up blockwise in VMEM and dots the result — the GLU elementwise
  never round-trips HBM.
- residual / bias: added to the f32 accumulator before the final cast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.qtypes import QuantizedTensor


# (K, N, bits) -> (block_n, block_k) installed by
# runtime.autotuner.tune_dequant_matmul
_DQMM_BLOCKS: dict = {}

# int4 grouped-scale strategy inside a K block (A/B-able, see
# docs/benchmarks.md round-2 kernel notes):
#   "grouped": one sub-dot per (plane, group), post-scaling each (BM, BN)
#              partial — minimal VPU work, 2*bk/g small MXU dots per block
#   "scale":   row-scale the unpacked u8 plane once ((u8 - 8) * s fused as
#              u8*s - 8s) and run ONE MXU dot per plane — 3 extra VPU
#              ops/value, 8x fewer MXU pipeline fills
import os as _os
_INT4_PRE_MODE = _os.environ.get("DPT_INT4_PRE", "grouped")


# (K, N) -> int4 in-block scaling mode, installed by the autotuner; consulted
# when the caller passes int4_mode=None (explicit arg > tuned > env default)
_DQMM_INT4_MODE: dict = {}


def set_dqmm_blocks(k: int, n: int, bits: int, block_n: int,
                    block_k: int) -> None:
    _DQMM_BLOCKS[(k, n, bits)] = (block_n, block_k)


def set_dqmm_int4_mode(k: int, n: int, mode: str) -> None:
    _DQMM_INT4_MODE[(k, n)] = mode


def _resolve_int4_mode(qw: QuantizedTensor, explicit) -> str:
    """int4-only knob: for int8 weights, pin the env default so a tuned int4
    mode for the same (K, N) cannot fork the int8 _dispatch jit cache key
    (the int8 kernel never reads int4_mode)."""
    if qw.bits != 4:
        return _INT4_PRE_MODE
    if explicit:
        return explicit
    return _DQMM_INT4_MODE.get((qw.shape[0], qw.shape[1]), _INT4_PRE_MODE)


def _resolve_blocks(qw: QuantizedTensor, block_n: int, block_k: int):
    """Apply per-shape tuned block sizes when the caller kept the defaults.

    Resolved HERE, outside the jitted _dispatch: block_n/block_k are static
    jit args, so they must carry the tuned values into the cache key — a
    trace-time table lookup inside _dispatch would be baked into whichever
    jaxpr compiled first and silently ignore later set_dqmm_blocks calls.
    """
    if block_n == 1024 and block_k == 1024:
        tuned = _DQMM_BLOCKS.get((qw.shape[0], qw.shape[1], qw.bits))
        if tuned is not None:
            return tuned
        if qw.bits == 4:
            k = qw.shape[0]
            keff = k // 2
            g_eff = qw.group_size or k
            # Ragged K (keff not a 2048-multiple): take the WHOLE nibble
            # plane as one K block — zero pad DMA, zero pad compute.
            # Measured v5e round 4, honest streamed-weights harness at the
            # model's real N and decode M (scripts/bench_blocks_model.py —
            # NOT the N-widened sweep, whose pipeline structure misleads):
            # 7B w_out (keff 5504, glu-fused) 530 -> 605 GB/s at bn1024.
            # Per-shape tuning (the same script persists winners into the
            # autotune cache) can beat this default; this is the untuned
            # floor. Guard: block group-compatible and <= 12 MiB so the
            # double-buffered blocks + unpack temporaries stay inside the
            # raised 64 MiB scoped-VMEM budget.
            if (keff % 2048 != 0 and keff % 128 == 0
                    and (g_eff in (k, keff) or keff % g_eff == 0)
                    and keff * 1024 <= 12 * 2**20):
                return 1024, keff
            # Aligned K: the largest K blocks _pick_block_k allows — fewer
            # grid steps amortize the nibble unpack and (grouped mode) the
            # per-group sub-dot pipeline fills. Measured v5e, >VMEM
            # weights: g128 grouped 397 -> 456 GB/s, W4A8 545 -> 635
            # (docs/benchmarks.md round-2 sweep).
            return block_n, 2048
    return block_n, block_k


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# Unified kernel factory
#
# Ref order (inputs): x planes | w | scale planes | [g planes] | [residual]
#                     | [bias];  outputs: o;  scratch: acc, [sumsq].
# Planes: i8 = 1 activation ref, i4 = 2 (nibble halves); glu doubles each
# (gate planes then up planes).
# ---------------------------------------------------------------------------

def _make_kernel(*, bits: int, pre_scale: bool, rms: bool, glu: bool,
                 act: str, has_residual: bool, has_bias: bool, out_dtype,
                 k_total: int, eps: float, act_i8: bool = False,
                 int4_mode: str = "grouped"):
    n_planes = 2 if bits == 4 else 1
    nx = n_planes * (2 if glu else 1)
    ng = n_planes if rms else 0

    def kernel(*refs):
        idx = 0
        x_refs = refs[idx:idx + nx]; idx += nx
        w_ref = refs[idx]; idx += 1
        s_refs = refs[idx:idx + n_planes]; idx += n_planes
        g_refs = refs[idx:idx + ng]; idx += ng
        res_ref = refs[idx] if has_residual else None
        idx += int(has_residual)
        bias_ref = refs[idx] if has_bias else None
        idx += int(has_bias)
        o_ref = refs[idx]; idx += 1
        acc_ref = refs[idx]; idx += 1
        ss_ref = refs[idx] if rms else None

        k_idx = pl.program_id(2)

        @pl.when(k_idx == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            if rms:
                ss_ref[:] = jnp.zeros_like(ss_ref)

        def activation(plane: int) -> jnp.ndarray:
            """bf16 activation block for nibble plane `plane`."""
            if glu:
                gf = x_refs[plane][:].astype(jnp.float32)
                uf = x_refs[n_planes + plane][:].astype(jnp.float32)
                a = (jax.nn.silu(gf) if act == "silu"
                     else jax.nn.gelu(gf, approximate=True))
                return (a * uf).astype(jnp.bfloat16)
            if rms:
                xf = x_refs[plane][:].astype(jnp.float32)
                ss = jnp.sum(xf * xf, axis=1, keepdims=True)      # (BM, 1)
                ss_ref[:] += jnp.broadcast_to(ss, ss_ref.shape)
                xf = xf * g_refs[plane][0].astype(jnp.float32)    # (1, BK)
                return xf.astype(jnp.bfloat16)
            return x_refs[plane][:].astype(jnp.bfloat16)

        def qdot(a_bf16, wi8, s_col, offset_u8: bool):
            """act_i8 quantized sub-dot: per-row dynamic int8 activations ->
            int8 x int8 MXU dot with i32 accumulation (2x bf16 MXU rate on
            v5e+; ZERO weight-side converts — the MXU eats the unpacked u8
            planes directly). offset_u8: weights hold v+8, corrected via the
            int rowsum. Accumulates into acc_ref."""
            af = a_bf16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(af), axis=1, keepdims=True)   # (BM, 1)
            qs = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
            ai = jnp.clip(jnp.round(af / qs), -127, 127).astype(jnp.int8)
            di = jax.lax.dot_general(ai, wi8, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            part = di
            if offset_u8:
                rs = jnp.sum(ai.astype(jnp.int32), axis=1, keepdims=True)
                part = di - 8 * rs
            acc_ref[:] += part.astype(jnp.float32) * qs * \
                s_col.astype(jnp.float32)

        if bits == 4:
            # Byte-plane nibble unpack: bitcast the packed i8 block to i32
            # (Mosaic packs 4 consecutive SUBLANES per word, row order
            # preserved on the round trip), mask/shift 8 nibbles per word at
            # i32 width, XOR 0x08 per nibble to rebias signed [-8,7] ->
            # unsigned v+8 in [0,15], bitcast back to i8. ~1.6 VPU
            # ops/value vs 3 for the old i8->i32 convert + per-plane
            # shift/sign-extend (the VPU bound that held int4 at ~420 GB/s
            # while int8 streamed 698 — docs/benchmarks.md). The +8 bias is
            # exact: dot(a, V) = dot(a, V+8) - 8*rowsum(a), with rowsum
            # O(BM*BK) — negligible next to the BK*BN weight block.
            w32 = pltpu.bitcast(w_ref[:], jnp.int32)
            planes_u8 = (
                pltpu.bitcast((w32 & 0x0F0F0F0F) ^ 0x08080808, jnp.int8),
                pltpu.bitcast(
                    (jnp.right_shift(w32, 4) & 0x0F0F0F0F) ^ 0x08080808,
                    jnp.int8),
            )
            for plane, u8 in enumerate(planes_u8):
                a = activation(plane)
                ub = None if act_i8 else u8.astype(jnp.bfloat16)
                if pre_scale and int4_mode == "scale" and not act_i8:
                    # row-scale the whole plane, one dot:
                    # (u8 - 8) * s == u8 * s - 8 * s (8s precomputed rows)
                    rows = s_refs[0].shape[0]
                    bkk, bnn = w_ref.shape
                    gsz = bkk // rows
                    sfull = jnp.broadcast_to(
                        s_refs[plane][:, 0].astype(jnp.float32)[:, None, :],
                        (rows, gsz, bnn)).reshape(bkk, bnn)
                    wf = (u8.astype(jnp.float32) * sfull - 8.0 * sfull
                          ).astype(jnp.bfloat16)
                    acc_ref[:] += jnp.dot(
                        a, wf, preferred_element_type=jnp.float32)
                elif pre_scale:
                    # per-group scales within the block (g | bk): one sub-dot
                    # per group, scale applied on the (BM, BN) partial —
                    # O(BM*BN) VPU work per group instead of row-scaling the
                    # whole (BK, BN) weight block
                    rows = s_refs[0].shape[0]
                    bkk = w_ref.shape[0]
                    gsz = bkk // rows
                    for gi in range(rows):
                        sl = slice(gi * gsz, (gi + 1) * gsz)
                        ag = a[:, sl]
                        if act_i8:
                            qdot(ag, u8[sl], s_refs[plane][gi], True)
                            continue
                        part = jnp.dot(ag, ub[sl],
                                       preferred_element_type=jnp.float32)
                        rs = jnp.sum(ag.astype(jnp.float32), axis=1,
                                     keepdims=True)
                        acc_ref[:] += (part - 8.0 * rs) * \
                            s_refs[plane][gi].astype(jnp.float32)
                elif act_i8:
                    qdot(a, u8, s_refs[plane][0], True)
                else:
                    part = jnp.dot(a, ub,
                                   preferred_element_type=jnp.float32)
                    rs = jnp.sum(a.astype(jnp.float32), axis=1,
                                 keepdims=True)
                    acc_ref[:] += (part - 8.0 * rs) * \
                        s_refs[plane][0].astype(jnp.float32)
        elif act_i8 and pre_scale:
            rows = s_refs[0].shape[0]
            bkk = w_ref.shape[0]
            gsz = bkk // rows
            a = activation(0)
            for gi in range(rows):
                sl = slice(gi * gsz, (gi + 1) * gsz)
                qdot(a[:, sl], w_ref[sl], s_refs[0][gi], False)
        elif act_i8:
            qdot(activation(0), w_ref[:], s_refs[0][0], False)
        elif pre_scale:
            bk, bn = w_ref.shape
            rows = s_refs[0].shape[0]
            g = bk // rows
            s = jnp.broadcast_to(s_refs[0][:], (rows, g, bn)).reshape(bk, bn)
            w = (w_ref[:].astype(jnp.float32) * s).astype(jnp.bfloat16)
            acc_ref[:] += jnp.dot(activation(0), w,
                                  preferred_element_type=jnp.float32)
        else:
            part = jnp.dot(activation(0), w_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc_ref[:] += part * s_refs[0][0].astype(jnp.float32)

        @pl.when(k_idx == pl.num_programs(2) - 1)
        def _():
            r = acc_ref[:]
            if rms:
                r = r * jax.lax.rsqrt(ss_ref[:, 0:1] / k_total + eps)
            if has_bias:
                r = r + bias_ref[0].astype(jnp.float32)           # (1, BN)
            if has_residual:
                r = r + res_ref[:].astype(jnp.float32)
            o_ref[:] = r.astype(out_dtype)

    return kernel


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------

# Measured weight-stream rate by block_k, relative to the best (v5e, >VMEM
# weights, K=8192: int4-W4A8 638/639/502/389 GB/s and int8 -/724/603/453 at
# bk 2048/1024/512/256) — the MXU/DMA pipeline starves below bk=1024.
_BK_RATE = {2048: 1.0, 1024: 1.0, 512: 0.80, 256: 0.62}


def _pick_block_k(k: int, want: int) -> int:
    """Pick block_k <= want for a (possibly ragged) K of `k` rows,
    maximizing predicted stream rate: the measured per-block_k base rate
    derated by the ragged-tail DMA waste k / round_up(k, d).

    Zero-padded activation columns make any tail legal (see _dispatch), so
    an ~11% pad at bk=2048 beats an exact tiny divisor by ~1.4x — earlier
    versions preferred exact divisors and collapsed K=11008 (= 256*43) to
    bk=256, running its matmuls at ~60% of the achievable rate.
    """
    best, best_score = min(want, 256), -1.0
    d = want
    while d >= 256:
        score = _BK_RATE.get(d, 1.0) * k / _round_up(k, d)
        if score > best_score + 1e-9:
            best, best_score = d, score
        d //= 2
    return best


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "glu",
                     "act", "rms_eps", "int4_mode"))
def _dispatch(
    x: jnp.ndarray,
    qw: QuantizedTensor,
    rms_weight: Optional[jnp.ndarray],
    residual: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    *,
    glu: bool,
    act: str,
    rms_eps: float,
    out_dtype,
    block_m: Optional[int],
    block_n: int,
    block_k: int,
    int4_mode: str = "grouped",
) -> jnp.ndarray:
    if qw.zero_points is not None:
        raise NotImplementedError("pallas kernel: symmetric only")
    rms = rms_weight is not None
    if rms and glu:
        raise NotImplementedError("rms and glu fusion are mutually exclusive")
    k, n = qw.shape
    lead = x.shape[:-1]
    x_width = 2 * k if glu else k
    if x.shape[-1] != x_width:
        raise ValueError(f"x width {x.shape[-1]} != expected {x_width}")
    x2 = x.reshape(-1, x_width)
    m = x2.shape[0]

    bm = block_m or min(256, _round_up(m, 16))
    bn = min(block_n, _round_up(n, 128))
    g_eff = qw.group_size if qw.group_size else k

    keff = k if qw.bits == 8 else k // 2     # stored weight rows (per plane)
    bk = _pick_block_k(keff, block_k)
    keff_pad = _round_up(keff, bk)
    if qw.bits == 8:
        # post-scale needs every K block inside ONE group: per-channel
        # (g == k, single group) or group-aligned blocks
        if g_eff == k or (g_eff % bk == 0 and k % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        elif g_eff % 256 == 0 and keff % g_eff == 0:
            bk, keff_pad, pre = g_eff, keff, False
        else:
            raise NotImplementedError(f"group {g_eff} vs block_k {bk}")
    else:
        k2 = k // 2
        # single group per nibble plane (per-channel or g == K/2), or
        # group-aligned blocks within aligned planes
        if g_eff in (k, k2) or (g_eff % bk == 0 and k2 % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs half-block {bk}")

    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    # Ragged K: zero-pad each activation SECTION's columns to keff_pad (and
    # each scale plane's rows) — the tail weight block then reads finite
    # garbage rows past the stored array that multiply against zeros. The
    # copies are tiny (activations are (M, K) at decode; scales K/g rows).
    n_planes = 2 if qw.bits == 4 else 1
    n_sections = n_planes * (2 if glu else 1)
    scales = qw.scales
    gvec = rms_weight
    if keff_pad != keff:
        if pre and keff % g_eff != 0:
            raise NotImplementedError(
                f"ragged K with group {g_eff} not dividing {keff}")
        pad_c = keff_pad - keff
        x2 = jnp.concatenate(
            [jnp.pad(x2[:, i * keff:(i + 1) * keff], ((0, 0), (0, pad_c)))
             for i in range(n_sections)], axis=1)
        if pre:
            gp = qw.scales.shape[0] // n_planes    # groups per plane
            scales = jnp.concatenate(
                [jnp.pad(qw.scales[i * gp:(i + 1) * gp],
                         ((0, pad_c // g_eff), (0, 0)))
                 for i in range(n_planes)], axis=0)
        if rms:
            gvec = jnp.concatenate(
                [jnp.pad(rms_weight[i * keff:(i + 1) * keff], (0, pad_c))
                 for i in range(n_planes)])

    # N need not divide evenly: edge blocks read garbage columns and write
    # them into the clipped region only.
    grid_m, grid_n = m_pad // bm, _cdiv(n, bn)
    # (G, N) -> (G, 1, N): Mosaic requires the last two block dims to be
    # (multiple of 8, multiple of 128) or equal to the array dims; a unit
    # middle axis satisfies that for single-row scale blocks.
    scales = scales[:, None, :]
    # `nkb` = K-blocks per plane; plane/section column offsets in x2 are in
    # units of nkb blocks (see qtypes half-split packing).
    grid_k = keff_pad // bk
    nkb = grid_k

    # --- activation specs --------------------------------------------------
    def xspec(section_blocks: int):
        return pl.BlockSpec((bm, bk),
                            lambda i, j, kk, o=section_blocks: (i, o + kk))

    x_specs = []
    if qw.bits == 8:
        x_specs.append(xspec(0))
        if glu:
            x_specs.append(xspec(nkb))           # up at cols [K, 2K)
    else:
        x_specs.append(xspec(0))                 # gate/x low plane
        x_specs.append(xspec(nkb))               # gate/x high plane
        if glu:
            x_specs.append(xspec(2 * nkb))       # up low plane
            x_specs.append(xspec(3 * nkb))       # up high plane

    # --- scale specs ---------------------------------------------------------
    s_specs = []
    if pre:
        s_specs.append(pl.BlockSpec((bk // g_eff, 1, bn),
                                    lambda i, j, kk: (kk, 0, j)))
        if qw.bits == 4:
            s_specs.append(pl.BlockSpec(
                (bk // g_eff, 1, bn),
                lambda i, j, kk, o=nkb: (o + kk, 0, j)))
    else:
        # clamp: a ragged tail block's row index may run past the scale
        # table; the clamped (wrong but finite) scale multiplies a partial
        # computed from zero-padded activations, i.e. zero
        last_row = qw.scales.shape[0] - 1
        s_specs.append(pl.BlockSpec(
            (1, 1, bn),
            lambda i, j, kk, g=g_eff, b=bk, lr=last_row: (
                jnp.minimum(jax.lax.div(kk * b, g), lr), 0, j)))
        if qw.bits == 4:
            h = k // 2
            s_specs.append(pl.BlockSpec(
                (1, 1, bn),
                lambda i, j, kk, g=g_eff, b=bk, hh=h, lr=last_row: (
                    jnp.minimum(jax.lax.div(hh + kk * b, g), lr), 0, j)))

    inputs = [x2] * len(x_specs) + [qw.data] + [scales] * len(s_specs)
    in_specs = x_specs + [
        pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))] + s_specs

    # --- fusion operand specs ----------------------------------------------
    if rms:
        gv = gvec.reshape(1, 1, gvec.shape[-1])
        inputs.append(gv)
        in_specs.append(pl.BlockSpec((1, 1, bk), lambda i, j, kk: (0, 0, kk)))
        if qw.bits == 4:
            inputs.append(gv)
            in_specs.append(pl.BlockSpec(
                (1, 1, bk), lambda i, j, kk, o=nkb: (0, 0, o + kk)))
    if residual is not None:
        res2 = residual.reshape(-1, n)
        if m_pad != m:
            res2 = jnp.pad(res2, ((0, m_pad - m), (0, 0)))
        inputs.append(res2)
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)))
    if bias is not None:
        inputs.append(bias.reshape(1, 1, n))
        in_specs.append(pl.BlockSpec((1, 1, bn), lambda i, j, kk: (0, 0, j)))

    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
    if rms:
        scratch.append(pltpu.VMEM((bm, 128), jnp.float32))

    kernel = _make_kernel(
        bits=qw.bits, pre_scale=pre, rms=rms, glu=glu, act=act,
        has_residual=residual is not None, has_bias=bias is not None,
        out_dtype=out_dtype, k_total=k, eps=rms_eps,
        act_i8=qw.act_bits == 8, int4_mode=int4_mode)

    w_bytes = k * n if qw.bits == 8 else k * n // 2
    out = pl.pallas_call(
        kernel,
        grid=(grid_m, grid_n, grid_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget is 16 MiB; large (bk, bn) blocks
            # (the DMA-efficient regime: >=1 KiB bursts need bn >= 1024)
            # plus the unpack temporaries exceed it — raise to half of v5e's
            # 128 MiB VMEM, leaving the other half for XLA's arena
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=w_bytes + m_pad * x_width * 2 + m_pad * n * 2,
            transcendentals=m_pad * k if glu else 0),
        interpret=_interpret(),
    )(*inputs)

    if m_pad != m:
        out = out[:m]
    return out.reshape(lead + (n,))


def dequant_matmul(
    x: jnp.ndarray,
    qw: QuantizedTensor,
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: int = 1024,
    block_k: int = 1024,
    int4_mode: Optional[str] = None,
) -> jnp.ndarray:
    """x @ dequant(qw). x: (..., K); returns (..., N) in out_dtype.

    Symmetric quantization only (zero_points unsupported here — the XLA path
    in ops/matmul.py covers asymmetric). Defaults tuned on v5e: bn=bk=1024
    streams int8 weights at ~515 GB/s and int4 at ~320 GB/s for (32, 4096) x
    (4096, 11008).

    int4_mode picks the in-block group-scaling strategy for int4 with g | bk
    ("grouped" sub-dots vs "scale" row-scaled single dot — see module notes);
    None defers to the DPT_INT4_PRE env default.
    """
    block_n, block_k = _resolve_blocks(qw, block_n, block_k)
    return _dispatch(x, qw, None, None, None, glu=False, act="silu",
                     rms_eps=1e-6, out_dtype=out_dtype, block_m=block_m,
                     block_n=block_n, block_k=block_k,
                     int4_mode=_resolve_int4_mode(qw, int4_mode))


def dequant_matmul_fused(
    x: jnp.ndarray,
    qw: QuantizedTensor,
    *,
    rms_weight: Optional[jnp.ndarray] = None,
    rms_eps: float = 1e-6,
    glu: bool = False,
    act: str = "silu",
    residual: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: int = 1024,
    block_k: int = 1024,
    int4_mode: Optional[str] = None,
) -> jnp.ndarray:
    """dequant_matmul with decode-loop neighbours folded into the kernel.

    rms_weight g: computes rmsnorm(x; g, rms_eps) @ dequant(qw) with the norm
      entirely in-kernel (see module docstring for the identity used).
    glu: x is (..., 2K) = gate|up; computes (act(gate) * up) @ dequant(qw).
    residual/bias: added to the f32 accumulator before the output cast.
    """
    block_n, block_k = _resolve_blocks(qw, block_n, block_k)
    return _dispatch(x, qw, rms_weight, residual, bias, glu=glu, act=act,
                     rms_eps=rms_eps, out_dtype=out_dtype, block_m=block_m,
                     block_n=block_n, block_k=block_k,
                     int4_mode=_resolve_int4_mode(qw, int4_mode))


# ---------------------------------------------------------------------------
# Grouped (MoE) dispatcher: expert-stacked quantized weights
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k",
                     "int4_mode"))
def grouped_dequant_matmul(
    xs: jnp.ndarray,                 # (M_pad, K) rows sorted + bm-aligned
    qw: QuantizedTensor,             # stacked (E, K[/2], N) + (E, G, N)
    tile_expert: jnp.ndarray,        # (M_pad / block_m,) expert per row tile
    *,
    out_dtype=jnp.bfloat16,
    block_m: int = 128,
    block_n: int = 1024,
    block_k: int = 1024,
    int4_mode: str = "grouped",
) -> jnp.ndarray:
    """Ragged grouped matmul over PACKED expert weights — the Pallas twin of
    `lax.ragged_dot` for quantized MoE (reference gap: the reference's MoE
    never ran; its quantization kernels dequantized to fp tensors first,
    src/core/execution/models/quantization_kernels.cu). xs rows are expert-
    sorted with each expert's segment padded to a block_m multiple, so every
    row tile belongs to EXACTLY ONE expert: the kernel is the dense fused
    dequant kernel with the weight/scale index maps taking the tile's expert
    from a scalar-prefetch table. Weights stream packed from HBM once per
    (tile, n-block) — no (E, K, N) bf16 materialization (the XLA path's
    dequantize-stacked reads+writes 4-8x the packed bytes).

    Pad rows multiply garbage weights into garbage outputs; callers drop
    them at the combine scatter (sentinel destinations).
    """
    if qw.zero_points is not None:
        raise NotImplementedError("grouped kernel: symmetric only")
    if qw.data.ndim != 3:
        raise ValueError("grouped_dequant_matmul expects stacked (E,K,N)")
    e, _, n = qw.data.shape
    k = qw.data.shape[1] * (2 if qw.bits == 4 else 1)
    m, xw = xs.shape
    if xw != k:
        raise ValueError(f"xs width {xw} != K {k}")
    bm = block_m
    if m % bm:
        raise ValueError(f"xs rows {m} not a block_m={bm} multiple")
    g_eff = qw.group_size if qw.group_size else k

    keff = qw.data.shape[1]                  # stored rows per expert plane
    bk = _pick_block_k(keff, block_k)
    keff_pad = _round_up(keff, bk)
    if qw.bits == 8:
        if g_eff == k or (g_eff % bk == 0 and k % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs block_k {bk}")
    else:
        k2 = k // 2
        if g_eff in (k, k2) or (g_eff % bk == 0 and k2 % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs half-block {bk}")

    x2 = xs
    n_planes = 2 if qw.bits == 4 else 1
    scales = qw.scales
    if keff_pad != keff:
        if pre and keff % g_eff != 0:
            raise NotImplementedError(
                f"ragged K with group {g_eff} not dividing {keff}")
        pad_c = keff_pad - keff
        x2 = jnp.concatenate(
            [jnp.pad(x2[:, i * keff:(i + 1) * keff], ((0, 0), (0, pad_c)))
             for i in range(n_planes)], axis=1)
        if pre:
            gp = qw.scales.shape[1] // n_planes
            scales = jnp.concatenate(
                [jnp.pad(qw.scales[:, i * gp:(i + 1) * gp],
                         ((0, 0), (0, pad_c // g_eff), (0, 0)))
                 for i in range(n_planes)], axis=1)

    grid_m, grid_n = m // bm, _cdiv(n, bn := min(block_n, _round_up(n, 128)))
    scales = scales[:, :, None, :]           # (E, G, 1, N)
    grid_k = keff_pad // bk
    nkb = grid_k

    def xspec(section_blocks: int):
        return pl.BlockSpec(
            (bm, bk),
            lambda i, j, kk, te, o=section_blocks: (i, o + kk))

    x_specs = [xspec(0)]
    if qw.bits == 4:
        x_specs.append(xspec(nkb))

    s_specs = []
    if pre:
        s_specs.append(pl.BlockSpec(
            (None, bk // g_eff, 1, bn),
            lambda i, j, kk, te: (te[i], kk, 0, j)))
        if qw.bits == 4:
            s_specs.append(pl.BlockSpec(
                (None, bk // g_eff, 1, bn),
                lambda i, j, kk, te, o=nkb: (te[i], o + kk, 0, j)))
    else:
        last_row = qw.scales.shape[1] - 1
        s_specs.append(pl.BlockSpec(
            (None, 1, 1, bn),
            lambda i, j, kk, te, g=g_eff, b=bk, lr=last_row: (
                te[i], jnp.minimum(jax.lax.div(kk * b, g), lr), 0, j)))
        if qw.bits == 4:
            h = k // 2
            s_specs.append(pl.BlockSpec(
                (None, 1, 1, bn),
                lambda i, j, kk, te, g=g_eff, b=bk, hh=h, lr=last_row: (
                    te[i], jnp.minimum(jax.lax.div(hh + kk * b, g), lr),
                    0, j)))

    w_spec = pl.BlockSpec((None, bk, bn),
                          lambda i, j, kk, te: (te[i], kk, j))

    inputs = [x2] * len(x_specs) + [qw.data] + [scales] * len(s_specs)
    in_specs = x_specs + [w_spec] + s_specs

    inner = _make_kernel(
        bits=qw.bits, pre_scale=pre, rms=False, glu=False, act="silu",
        has_residual=False, has_bias=False, out_dtype=out_dtype,
        k_total=k, eps=1e-6, act_i8=qw.act_bits == 8, int4_mode=int4_mode)

    def kernel(te_ref, *refs):      # drop the scalar-prefetch ref (index
        return inner(*refs)         # maps consume it; the body doesn't)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_m, grid_n, grid_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, te: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    w_bytes = m // bm * bk * grid_k * bn * grid_n  # rough stream estimate
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=w_bytes + m * xw * 2 + m * n * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(tile_expert.astype(jnp.int32), *inputs)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("n_per_expert", "out_dtype", "block_m", "block_n",
                     "block_k", "int4_mode"))
def grouped_dequant_matmul_ncat(
    xs: jnp.ndarray,                 # (M_pad, K) rows sorted + bm-aligned
    qw: QuantizedTensor,             # 2-D cat (K[/2], E * n_per_expert)
    tile_expert: jnp.ndarray,        # (M_pad / block_m,)
    n_per_expert: int,
    *,
    out_dtype=jnp.bfloat16,
    block_m: int = 128,
    block_n: int = 0,
    block_k: int = 1024,
    int4_mode: str = "grouped",
) -> jnp.ndarray:
    """Grouped matmul where experts live along the N axis of ONE wide 2-D
    cat matrix (the cat-fused w_gu layout, expert-major columns): each row
    tile reads only its expert's n_per_expert column block. Returns
    (M_pad, n_per_expert). The K-side packing is the standard global
    half-split (columns never interact with nibble pairing), so the cat
    decode matmul and this grouped path share the array byte-for-byte."""
    if qw.zero_points is not None:
        raise NotImplementedError("grouped kernel: symmetric only")
    k, n_total = qw.shape
    ne = n_per_expert
    if n_total % ne:
        raise ValueError(f"cat N {n_total} not a multiple of {ne}")
    m, xw = xs.shape
    if xw != k:
        raise ValueError(f"xs width {xw} != K {k}")
    bm = block_m
    if m % bm:
        raise ValueError(f"xs rows {m} not a block_m={bm} multiple")
    if block_n == 0:
        block_n = next(b for b in (1024, 512, 256, 128) if ne % b == 0)
    bn = block_n
    if ne % bn:
        raise ValueError(f"n_per_expert {ne} not a multiple of bn {bn}")
    nb_e = ne // bn                  # n-blocks per expert
    g_eff = qw.group_size if qw.group_size else k

    keff = k if qw.bits == 8 else k // 2
    bk = _pick_block_k(keff, block_k)
    keff_pad = _round_up(keff, bk)
    if qw.bits == 8:
        if g_eff == k or (g_eff % bk == 0 and k % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs block_k {bk}")
    else:
        k2 = k // 2
        if g_eff in (k, k2) or (g_eff % bk == 0 and k2 % g_eff == 0):
            pre = False
        elif bk % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs half-block {bk}")

    x2 = xs
    n_planes = 2 if qw.bits == 4 else 1
    scales = qw.scales
    if keff_pad != keff:
        if pre and keff % g_eff != 0:
            raise NotImplementedError(
                f"ragged K with group {g_eff} not dividing {keff}")
        pad_c = keff_pad - keff
        x2 = jnp.concatenate(
            [jnp.pad(x2[:, i * keff:(i + 1) * keff], ((0, 0), (0, pad_c)))
             for i in range(n_planes)], axis=1)
        if pre:
            gp = qw.scales.shape[0] // n_planes
            scales = jnp.concatenate(
                [jnp.pad(qw.scales[i * gp:(i + 1) * gp],
                         ((0, pad_c // g_eff), (0, 0)))
                 for i in range(n_planes)], axis=0)

    grid_m, grid_n = m // bm, nb_e
    scales = scales[:, None, :]
    grid_k = keff_pad // bk
    nkb = grid_k

    def xspec(section_blocks: int):
        return pl.BlockSpec(
            (bm, bk),
            lambda i, j, kk, te, o=section_blocks: (i, o + kk))

    x_specs = [xspec(0)]
    if qw.bits == 4:
        x_specs.append(xspec(nkb))

    s_specs = []
    if pre:
        s_specs.append(pl.BlockSpec(
            (bk // g_eff, 1, bn),
            lambda i, j, kk, te, nb=nb_e: (kk, 0, te[i] * nb + j)))
        if qw.bits == 4:
            s_specs.append(pl.BlockSpec(
                (bk // g_eff, 1, bn),
                lambda i, j, kk, te, o=nkb, nb=nb_e: (
                    o + kk, 0, te[i] * nb + j)))
    else:
        last_row = qw.scales.shape[0] - 1
        s_specs.append(pl.BlockSpec(
            (1, 1, bn),
            lambda i, j, kk, te, g=g_eff, b=bk, lr=last_row, nb=nb_e: (
                jnp.minimum(jax.lax.div(kk * b, g), lr), 0,
                te[i] * nb + j)))
        if qw.bits == 4:
            h = k // 2
            s_specs.append(pl.BlockSpec(
                (1, 1, bn),
                lambda i, j, kk, te, g=g_eff, b=bk, hh=h, lr=last_row,
                nb=nb_e: (
                    jnp.minimum(jax.lax.div(hh + kk * b, g), lr), 0,
                    te[i] * nb + j)))

    w_spec = pl.BlockSpec(
        (bk, bn), lambda i, j, kk, te, nb=nb_e: (kk, te[i] * nb + j))

    inputs = [x2] * len(x_specs) + [qw.data] + [scales] * len(s_specs)
    in_specs = x_specs + [w_spec] + s_specs

    inner = _make_kernel(
        bits=qw.bits, pre_scale=pre, rms=False, glu=False, act="silu",
        has_residual=False, has_bias=False, out_dtype=out_dtype,
        k_total=k, eps=1e-6, act_i8=qw.act_bits == 8, int4_mode=int4_mode)

    def kernel(te_ref, *refs):
        return inner(*refs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_m, grid_n, grid_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, te: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, ne), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * ne * k,
            bytes_accessed=m // bm * grid_k * bk * ne + m * xw * 2
            + m * ne * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(tile_expert.astype(jnp.int32), *inputs)
    return out
