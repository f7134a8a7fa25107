"""Quantized matmul: the framework's central op.

Replaces the reference's separated dequantize-pass + fp matmul (SURVEY.md §3.4
notes the reference has *no* fused dequant-matmul — dequantization is a
separate kernel: src/core/execution/models/quantization_kernels.cu vs
gpt_kernels.cu ffn/qkv kernels consuming only float/half). Here the weights
stay packed in HBM and are dequantized on the fly:

- Pallas path (TPU): fused in-VMEM int8/int4 dequant -> bf16 MXU matmul
  (ops/pallas/dequant_matmul.py).
- XLA path (any backend): unpack + scale + jnp.dot — XLA fuses the dequant
  into the matmul's operand read; used for CPU tests and as fallback for
  shapes the kernel doesn't cover.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..quant.qtypes import QuantizedTensor, unpack_int4

Array = jnp.ndarray


def _dequant_weights(qw: QuantizedTensor, dtype) -> Array:
    """Unpack + dequantize to a (K, N) matrix of `dtype` (XLA fuses this)."""
    q = unpack_int4(qw.data) if qw.bits == 4 else qw.data
    if qw.group_size and qw.group_size > 0:
        k, n = qw.shape
        g = qw.group_size
        qg = q.reshape(k // g, g, n)
        if qw.zero_points is not None:
            qg = qg.astype(jnp.int32) - qw.zero_points[:, None, :]
        w = qg.astype(dtype) * qw.scales[:, None, :].astype(dtype)
        return w.reshape(k, n)
    if qw.zero_points is not None:
        q = q.astype(jnp.int32) - qw.zero_points
    return q.astype(dtype) * qw.scales.astype(dtype)


def _w8a8_matmul(x: Array, qw: QuantizedTensor, out_dtype) -> Array:
    """Dynamic per-row int8 activations x int8 weights -> int32 MXU dots.

    The int8 MXU rate is 2x bf16 on v5e+, so this wins on compute-bound
    shapes (prefill). int4 weights unpack to int8 first (W4A8: the nibble
    unpack is VPU work, the dots still run at the int8 rate). Per-group
    scales split the contraction into G int32 dots so each partial is
    scaled before summation — exact w.r.t. the quantized values.
    Symmetric weights only.
    """
    k, n = qw.shape
    lead = x.shape[:-1]
    xf = x.astype(jnp.float32).reshape(-1, k)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    wq = unpack_int4(qw.data) if qw.bits == 4 else qw.data
    g = qw.group_size
    if g and g > 0:
        xg = xq.reshape(-1, k // g, g)
        wg = wq.reshape(k // g, g, n)
        acc = jnp.einsum("tgk,gkn->tgn", xg, wg,
                         preferred_element_type=jnp.int32)
        y = jnp.sum(acc.astype(jnp.float32) * qw.scales[None], axis=1)
    else:
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * qw.scales
    y = y * xs
    return y.reshape(lead + (n,)).astype(out_dtype)


def quantized_matmul(
    x: Array,
    w: Union[QuantizedTensor, Array],
    *,
    out_dtype=None,
    prefer_pallas: Optional[bool] = None,
) -> Array:
    """Compute x @ w where w may be quantized. x: (..., K), w: (K, N).

    Accumulation is always f32 on the MXU (preferred_element_type), output cast
    to out_dtype (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    if not isinstance(w, QuantizedTensor):
        return jnp.dot(x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(out_dtype)

    if w.act_bits == 8 and w.zero_points is None and w.data.ndim == 2:
        # W8A8/W4A8: the Pallas kernel quantizes activations per (row,
        # group-block) IN-KERNEL and runs int8 x int8 MXU dots (i32
        # accumulate) — no weight-side converts at all; XLA path otherwise
        use = prefer_pallas if prefer_pallas is not None \
            else _pallas_eligible(x, w)
        if use:
            from .pallas.dequant_matmul import dequant_matmul as _pallas_mm
            try:
                return _pallas_mm(x, w, out_dtype=out_dtype)
            except NotImplementedError:
                pass
        return _w8a8_matmul(x, w, out_dtype)
    use_pallas = prefer_pallas
    if use_pallas is None:
        use_pallas = _pallas_eligible(x, w)
    if use_pallas:
        from .pallas.dequant_matmul import dequant_matmul as _pallas_mm
        try:
            return _pallas_mm(x, w, out_dtype=out_dtype)
        except NotImplementedError:
            pass
    wd = _dequant_weights(w, jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32)
    return jnp.dot(x.astype(wd.dtype), wd,
                   preferred_element_type=jnp.float32).astype(out_dtype)


# ---------------------------------------------------------------------------
# Decode-loop fused ops
#
# Small-batch decode is launch-count-bound (~6-10us fixed cost per fused op on
# this runtime; docs/benchmarks.md), so each matmul's neighbours fold INTO the
# Pallas kernel on TPU. The XLA fallbacks compute the same math as separate
# (XLA-fused) ops — CPU tests and ineligible shapes keep exact semantics.
# ---------------------------------------------------------------------------

def _fused_eligible(x: Array, w) -> bool:
    return (isinstance(w, QuantizedTensor) and w.act_bits in (0, 8)
            and w.zero_points is None and w.data.ndim == 2
            and _pallas_eligible(x, w))


def rms_matmul(x: Array, rms_weight: Array, w, *, eps: float = 1e-6,
               bias: Optional[Array] = None, out_dtype=None) -> Array:
    """rmsnorm(x; rms_weight, eps) @ w (+ bias) in one kernel when possible.

    The Pallas path dots the raw x (g-scaled per block) and row-scales the
    output by rsqrt(mean(x^2)+eps) — exact up to bf16 rounding order."""
    out_dtype = out_dtype or x.dtype
    if _fused_eligible(x, w):
        from .pallas.dequant_matmul import dequant_matmul_fused
        try:
            return dequant_matmul_fused(x, w, rms_weight=rms_weight,
                                        rms_eps=eps, bias=bias,
                                        out_dtype=out_dtype)
        except NotImplementedError:
            pass
    from .normalization import rms_norm
    y = quantized_matmul(rms_norm(x, rms_weight, eps=eps), w,
                         out_dtype=out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def glu_matmul(gu: Array, w, *, act: str = "silu",
               residual: Optional[Array] = None,
               bias: Optional[Array] = None, out_dtype=None) -> Array:
    """(act(gate) * up) @ w (+ bias) (+ residual), gu = gate|up on the last
    axis. Folds the GLU elementwise and the residual add into the kernel."""
    out_dtype = out_dtype or gu.dtype
    if _fused_eligible(gu[..., :gu.shape[-1] // 2], w):
        from .pallas.dequant_matmul import dequant_matmul_fused
        try:
            return dequant_matmul_fused(gu, w, glu=True, act=act,
                                        residual=residual, bias=bias,
                                        out_dtype=out_dtype)
        except NotImplementedError:
            pass
    gate, up = jnp.split(gu, 2, axis=-1)
    a = jax.nn.silu(gate) if act == "silu" else jax.nn.gelu(gate,
                                                            approximate=True)
    y = quantized_matmul(a * up, w, out_dtype=out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return y


def matmul_residual(x: Array, w, residual: Array, *,
                    bias: Optional[Array] = None, out_dtype=None) -> Array:
    """x @ w (+ bias) + residual with the adds folded into the kernel."""
    out_dtype = out_dtype or x.dtype
    if _fused_eligible(x, w):
        from .pallas.dequant_matmul import dequant_matmul_fused
        try:
            return dequant_matmul_fused(x, w, residual=residual, bias=bias,
                                        out_dtype=out_dtype)
        except NotImplementedError:
            pass
    y = quantized_matmul(x, w, out_dtype=out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y + residual.astype(y.dtype)


def _pallas_eligible(x: Array, w: QuantizedTensor) -> bool:
    """Pallas kernel constraints: TPU backend, aligned K/N, 2-D-able x."""
    try:
        platform = jax.default_backend()
    except RuntimeError:  # pragma: no cover
        return False
    if platform not in ("tpu", "axon"):
        return False
    k, n = w.shape
    keff = k // 2 if w.bits == 4 else k    # int4 blocks over packed rows
    # keff need not divide the block size — the kernel zero-pads activation
    # sections for ragged K (an XLA fallback here is catastrophic in the
    # decode loop: XLA hoists the dequant out of the loop and the step then
    # streams bf16 weights at 2-4x the bytes)
    if keff % 128 != 0 or n % 128 != 0:
        return False
    g = w.group_size
    if g:
        if w.bits == 4 and (k // 2) % g != 0 and g % (k // 2) != 0:
            return False
        if g % 128 != 0 and 128 % g != 0:
            return False
    if w.zero_points is not None:
        return False  # symmetric only in the kernel for now
    return True
