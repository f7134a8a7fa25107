"""Quantize / dequantize primitives (pure JAX, CPU-testable).

TPU-native reimplementation of the reference's quantizer semantics
(reference: src/core/model/quantization.cpp:120-189 — symmetric scale =
absmax/(2^(b-1)-1), asymmetric zero-point clamped; round + clamp to
[-128, 127] / [-8, 7]) generalized to per-group scales along the contraction
axis, which is the INT4 accuracy recipe the reference lacks (SURVEY.md §3.4).

Conventions for weight matrices: shape (K, N) with K the contraction axis
(input features) and N the output channels. "Per-channel" means one scale per
output channel n; "per-group" additionally splits K into groups of g.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import QuantConfig, QuantMode
from .qtypes import INT4_QMAX, INT8_QMAX, QuantizedTensor, pack_int4, unpack_int4


def _qmax(bits: int) -> int:
    return INT8_QMAX if bits == 8 else INT4_QMAX


def _qmin(bits: int) -> int:
    return -128 if bits == 8 else -8


def _grouped(w: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Reshape (K, N) -> (G, g, N) for per-group reductions."""
    k, n = w.shape
    if k % group_size != 0:
        raise ValueError(f"K={k} not divisible by group_size={group_size}")
    return w.reshape(k // group_size, group_size, n)


@partial(jax.jit, static_argnames=("bits", "group_size", "symmetric"))
def compute_scales(
    w: jnp.ndarray,
    *,
    bits: int = 8,
    group_size: int = 0,
    symmetric: bool = True,
):
    """Compute (scales, zero_points) for a (K, N) weight matrix.

    Symmetric: scale = absmax / qmax, zero_points None-sentinel (zeros).
    Asymmetric: scale = (max - min) / (qmax - qmin), zp = round(qmin - min/scale)
    (reference: src/core/execution/models/quantization_manager.cpp:262-288).
    Returns scales of shape (1, N) (per-channel) or (G, N) (per-group), and
    int32 zero_points of the same shape (all-zero when symmetric).
    """
    qmax = _qmax(bits)
    qmin = _qmin(bits)
    if group_size and group_size > 0:
        wg = _grouped(w, group_size)          # (G, g, N)
        wmax = jnp.max(wg, axis=1)            # (G, N)
        wmin = jnp.min(wg, axis=1)
    else:
        wmax = jnp.max(w, axis=0, keepdims=True)   # (1, N)
        wmin = jnp.min(w, axis=0, keepdims=True)
    if symmetric:
        absmax = jnp.maximum(jnp.abs(wmax), jnp.abs(wmin))
        scales = jnp.maximum(absmax, 1e-8) / qmax
        zps = jnp.zeros_like(scales, dtype=jnp.int32)
    else:
        scales = jnp.maximum(wmax - wmin, 1e-8) / (qmax - qmin)
        # zp stays int32 and unclipped: it only enters dequant arithmetic, and
        # clamping it to the int8 range would saturate shifted distributions.
        zps = jnp.round(qmin - wmin / scales).astype(jnp.int32)
    return scales.astype(jnp.float32), zps


def quantize(
    w: jnp.ndarray,
    config: Optional[QuantConfig] = None,
    *,
    bits: Optional[int] = None,
    group_size: Optional[int] = None,
    symmetric: Optional[bool] = None,
    scales: Optional[jnp.ndarray] = None,
    zero_points: Optional[jnp.ndarray] = None,
) -> QuantizedTensor:
    """Quantize a 2-D (K, N) float matrix to a QuantizedTensor.

    Either pass a QuantConfig or explicit bits/group_size/symmetric. Scales may
    be supplied (from a calibrator) or computed minmax from the data itself.
    """
    if config is not None:
        bits = {QuantMode.INT8: 8, QuantMode.INT4: 4}[config.mode]
        group_size = config.group_size
        symmetric = config.symmetric
    bits = int(bits or 8)
    group_size = int(group_size or 0)
    symmetric = True if symmetric is None else bool(symmetric)
    if w.ndim != 2:
        raise ValueError(f"quantize expects 2-D (K, N) weights, got {w.shape}")
    if bits == 4 and w.shape[0] % 2 != 0:
        raise ValueError(f"INT4 needs even K for nibble packing, got K={w.shape[0]}")

    w = w.astype(jnp.float32)
    if scales is None:
        scales, zps = compute_scales(
            w, bits=bits, group_size=group_size, symmetric=symmetric)
    else:
        zps = zero_points if zero_points is not None else jnp.zeros_like(
            scales, dtype=jnp.int32)

    q = _quantize_values(w, scales, zps, bits=bits, group_size=group_size)
    data = pack_int4(q) if bits == 4 else q
    return QuantizedTensor(
        data=data,
        scales=scales,
        zero_points=None if symmetric else zps,
        bits=bits,
        group_size=group_size,
    )


@partial(jax.jit, static_argnames=("bits", "group_size"))
def _quantize_values(w, scales, zps, *, bits: int, group_size: int) -> jnp.ndarray:
    qmax, qmin = _qmax(bits), _qmin(bits)
    if group_size and group_size > 0:
        wg = _grouped(w, group_size)                      # (G, g, N)
        q = jnp.round(wg / scales[:, None, :]) + zps[:, None, :]
        q = q.reshape(w.shape)
    else:
        q = jnp.round(w / scales) + zps
    return jnp.clip(q, qmin, qmax).astype(jnp.int8)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Exact inverse transform: packed ints -> float (K, N).

    Round-trip tolerance spec follows the reference's device test (reference:
    src/core/execution/models/quantization_manager_test.cpp:83-100 — INT8
    round-trip within 0.1 for unit-scale data).
    """
    q = unpack_int4(qt.data) if qt.bits == 4 else qt.data
    q = q.astype(jnp.float32)
    zps = qt.zero_points
    if qt.group_size and qt.group_size > 0:
        g = qt.group_size
        qg = _grouped(q, g)                               # (G, g, N)
        if zps is not None:
            qg = qg - zps[:, None, :].astype(jnp.float32)
        w = (qg * qt.scales[:, None, :]).reshape(qt.shape)
    else:
        if zps is not None:
            q = q - zps.astype(jnp.float32)
        w = q * qt.scales
    return w.astype(dtype)


def quantize_stacked(w3: jnp.ndarray, *, bits: int = 8, group_size: int = 0,
                     symmetric: bool = True) -> QuantizedTensor:
    """Quantize a stacked weight tensor (E, K, N) — one quantization per
    leading slice (MoE experts, parallel/moe EP sharding). data is
    (E, K, N) int8 or (E, K/2, N) packed int4; scales (E, G, N)."""
    if w3.ndim != 3:
        raise ValueError(f"quantize_stacked expects (E, K, N), got {w3.shape}")
    e, k, n = w3.shape
    per_slice = jax.vmap(
        lambda w: _stacked_one(w, bits, group_size, symmetric))
    data, scales = per_slice(w3.astype(jnp.float32))
    return QuantizedTensor(
        data=data, scales=scales, zero_points=None,
        bits=bits, group_size=group_size)


def _stacked_one(w, bits, group_size, symmetric):
    scales, zps = compute_scales(w, bits=bits, group_size=group_size,
                                 symmetric=True)
    q = _quantize_values(w, scales, zps, bits=bits, group_size=group_size)
    if bits == 4:
        q = pack_int4(q)
    return q, scales


def dequantize_stacked(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of quantize_stacked: -> (E, K, N) float."""
    e, k, n = qt.shape
    def one(data, scales):
        sub = QuantizedTensor(data=data, scales=scales, zero_points=None,
                              bits=qt.bits, group_size=qt.group_size)
        return dequantize(sub, dtype)
    return jax.vmap(one)(qt.data, qt.scales)


# ---------------------------------------------------------------------------
# Activation (dynamic) quantization — per-row absmax, used for A8 paths and
# the int8 KV cache (reference: DYNAMIC method, quantization_manager.cpp:131-158).
# ---------------------------------------------------------------------------

def quantize_dynamic(x: jnp.ndarray, *, bits: int = 8, axis: int = -1):
    """Symmetric dynamic quantization along `axis`.

    Returns (int8 values, f32 scales with keepdims). Not packed — dynamic int4
    stays nibble-per-byte since it is short-lived.
    """
    qmax = _qmax(bits)
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scales = (jnp.maximum(absmax, 1e-8) / qmax).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scales), _qmin(bits), qmax).astype(jnp.int8)
    return q, scales


def dequantize_dynamic(q: jnp.ndarray, scales: jnp.ndarray, dtype=jnp.float32):
    return (q.astype(jnp.float32) * scales).astype(dtype)
