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


def set_dqmm_blocks(k: int, n: int, bits: int, block_n: int,
                    block_k: int) -> None:
    _DQMM_BLOCKS[(k, n, bits)] = (block_n, block_k)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# int8 kernel
# ---------------------------------------------------------------------------

def _kernel_i8(x_ref, w_ref, s_ref, o_ref, acc_ref, *, pre_scale: bool,
               out_dtype):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    if pre_scale:
        # scales block: (BK/g, BN) -> expand each row g times over the weight
        # block rows, scale in f32, feed MXU in bf16.
        bk, bn = w_ref.shape
        rows = s_ref.shape[0]
        g = bk // rows
        s = jnp.broadcast_to(s_ref[:], (rows, g, bn)).reshape(bk, bn)
        w = (w_ref[:].astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    else:
        part = jnp.dot(x, w_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc_ref[:] += part * s_ref[0].astype(jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# int4 kernel (half-split packed: plane lo = rows [0, K/2), hi = [K/2, K))
# ---------------------------------------------------------------------------

def _kernel_i4(x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, acc_ref,
               *, pre_scale: bool, out_dtype):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic has no i8 vector shifts — unpack nibbles in i32.
    p32 = w_ref[:].astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)    # sign-extended low nibble
    hi = jnp.right_shift(p32, 4)                         # arithmetic: high nibble

    x_lo = x_lo_ref[:].astype(jnp.bfloat16)
    x_hi = x_hi_ref[:].astype(jnp.bfloat16)
    if pre_scale:
        bk2, bn = w_ref.shape
        rows = s_lo_ref.shape[0]
        g = bk2 // rows

        def expand(s_ref):
            return jnp.broadcast_to(s_ref[:], (rows, g, bn)).reshape(bk2, bn)

        lo_w = (lo.astype(jnp.float32) * expand(s_lo_ref)).astype(jnp.bfloat16)
        hi_w = (hi.astype(jnp.float32) * expand(s_hi_ref)).astype(jnp.bfloat16)
        acc_ref[:] += (jnp.dot(x_lo, lo_w, preferred_element_type=jnp.float32)
                       + jnp.dot(x_hi, hi_w, preferred_element_type=jnp.float32))
    else:
        part_lo = jnp.dot(x_lo, lo.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        part_hi = jnp.dot(x_hi, hi.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        acc_ref[:] += (part_lo * s_lo_ref[0].astype(jnp.float32)
                       + part_hi * s_hi_ref[0].astype(jnp.float32))

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------

def _pick_block_k(k: int, want: int) -> int:
    """Largest power-of-two divisor of k that is <= want (>=256 if possible).

    K must be covered exactly — out-of-bounds K reads would accumulate garbage
    into valid outputs. N edge blocks are safe (clipped on write), so bn only
    needs 128 alignment, not divisibility.
    """
    d = want
    while d > 256 and k % d != 0:
        d //= 2
    while k % d != 0 and d > 8:
        d //= 2
    return d


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m", "block_n",
                                             "block_k"))
def dequant_matmul(
    x: jnp.ndarray,
    qw: QuantizedTensor,
    *,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """x @ dequant(qw). x: (..., K); returns (..., N) in out_dtype.

    Symmetric quantization only (zero_points unsupported here — the XLA path
    in ops/matmul.py covers asymmetric). Defaults tuned on v5e: bn=bk=1024
    streams int8 weights at ~515 GB/s and int4 at ~320 GB/s for (32, 4096) x
    (4096, 11008).
    """
    if qw.zero_points is not None:
        raise NotImplementedError("pallas kernel: symmetric only")
    k, n = qw.shape
    tuned = _DQMM_BLOCKS.get((k, n, qw.bits))
    if tuned is not None and block_n == 1024 and block_k == 1024:
        block_n, block_k = tuned
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    bm = block_m or min(256, _round_up(m, 16))
    bn = min(block_n, _round_up(n, 128))
    g_eff = qw.group_size if qw.group_size else k

    if qw.bits == 8:
        bk = _pick_block_k(k, block_k)
        if g_eff % bk == 0:
            pre = False
        elif bk % g_eff == 0:
            pre = True
        elif g_eff % 256 == 0:
            bk, pre = g_eff, False
        else:
            raise NotImplementedError(f"group {g_eff} vs block_k {bk}")
    else:
        k2 = k // 2
        bk2 = _pick_block_k(k2, block_k)
        if g_eff % bk2 == 0 and (k2 % g_eff == 0 or g_eff % k2 == 0 or g_eff == k):
            pre = False
        elif bk2 % g_eff == 0:
            pre = True
        else:
            raise NotImplementedError(f"group {g_eff} vs half-block {bk2}")

    m_pad = _round_up(m, bm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    # N need not divide evenly: edge blocks read garbage columns and write
    # them into the clipped region only.
    grid_m, grid_n = m_pad // bm, _cdiv(n, bn)
    # (G, N) -> (G, 1, N): Mosaic requires the last two block dims to be
    # (multiple of 8, multiple of 128) or equal to the array dims; a unit
    # middle axis satisfies that for single-row scale blocks.
    scales = qw.scales[:, None, :]

    if qw.bits == 8:
        grid_k = k // bk
        if pre:
            s_spec = pl.BlockSpec((bk // g_eff, 1, bn),
                                  lambda i, j, kk: (kk, 0, j))
        else:
            s_spec = pl.BlockSpec(
                (1, 1, bn),
                lambda i, j, kk, g=g_eff, b=bk: (jax.lax.div(kk * b, g), 0, j))
        out = pl.pallas_call(
            functools.partial(_kernel_i8, pre_scale=pre, out_dtype=out_dtype),
            grid=(grid_m, grid_n, grid_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
                s_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n * k,
                bytes_accessed=k * n + m_pad * k * 2 + m_pad * n * 2,
                transcendentals=0),
            interpret=_interpret(),
        )(x2, qw.data, scales)
    else:
        k2 = k // 2
        grid_k = k2 // bk2
        nkb = grid_k
        if pre:
            s_lo = pl.BlockSpec((bk2 // g_eff, 1, bn),
                                lambda i, j, kk: (kk, 0, j))
            s_hi = pl.BlockSpec((bk2 // g_eff, 1, bn),
                                lambda i, j, kk, o=nkb: (o + kk, 0, j))
        else:
            s_lo = pl.BlockSpec(
                (1, 1, bn),
                lambda i, j, kk, g=g_eff, b=bk2: (jax.lax.div(kk * b, g), 0, j))
            s_hi = pl.BlockSpec(
                (1, 1, bn),
                lambda i, j, kk, g=g_eff, b=bk2, h=k2: (
                    jax.lax.div(h + kk * b, g), 0, j))
        out = pl.pallas_call(
            functools.partial(_kernel_i4, pre_scale=pre, out_dtype=out_dtype),
            grid=(grid_m, grid_n, grid_k),
            in_specs=[
                pl.BlockSpec((bm, bk2), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bm, bk2), lambda i, j, kk, o=nkb: (i, o + kk)),
                pl.BlockSpec((bk2, bn), lambda i, j, kk: (kk, j)),
                s_lo,
                s_hi,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * n * k,
                bytes_accessed=k * n // 2 + m_pad * k * 2 + m_pad * n * 2,
                transcendentals=0),
            interpret=_interpret(),
        )(x2, x2, qw.data, scales, scales)

    if m_pad != m:
        out = out[:m]
    return out.reshape(lead + (n,))
