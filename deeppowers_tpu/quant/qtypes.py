"""Quantized tensor container.

A `QuantizedTensor` is a JAX pytree holding packed integer data plus scale
(and optional zero-point) metadata. It is the TPU-native replacement for the
reference's device-side quantized buffers (reference:
src/core/execution/models/quantization_manager.hpp:74-82 QuantParams
{scales, zero_points, min/max}) — but here the packed values travel *with*
their scales as one functional value, so every consumer (fused dequant-matmul,
KV cache, checkpointing) sees a self-describing array.

INT4 packing: two signed 4-bit values per int8 byte along the *first* axis
(the contraction axis for weights) in **half-split** layout:
  packed[i, n] = (v[i + K/2, n] << 4) | (v[i, n] & 0x0F),  i in [0, K/2)
i.e. the low nibbles hold the first half of the rows and the high nibbles the
second half. Same 2x density as the reference's adjacent-row packing
(reference: src/core/execution/models/gpt_kernels.cu:531-558 packs
(high<<4)|(low&0x0F)) but chosen TPU-first: unpacking is a sublane concat —
no lane interleave — so the Pallas dequant-matmul kernel consumes each nibble
plane with a plain MXU dot and zero shuffles. Sign extension on unpack uses
arithmetic shifts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INT8_QMAX = 127
INT4_QMAX = 7


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedTensor:
    """Packed quantized array with quantization metadata.

    Attributes:
      data: int8 array. For bits=8 this has the logical shape; for bits=4 the
        second-to-last... the K axis (axis 0 for (K, N); axis 1 for stacked
        (E, K, N)) is halved (two nibbles per byte).
      scales: f32 scales. Shape broadcasts against the logical array:
        per-tensor -> (1, 1); per-channel -> (1, N); per-group -> (G, N) where
        G = K // group_size; stacked experts -> (E, G, N).
      zero_points: optional int32 zero points, same shape as scales
        (asymmetric mode only).
      bits: 4 or 8.
      group_size: 0 for per-channel/per-tensor, else the group length along
        the K axis of the logical array.

    `shape` is *derived* from data (not stored): inside shard_map the local
    shard's logical shape is then automatically correct.
    """

    data: jnp.ndarray
    scales: jnp.ndarray
    zero_points: Optional[jnp.ndarray]
    bits: int
    group_size: int
    # Activation quantization at the matmul: 0 = float activations (weight-
    # only quant), 8 = dynamic per-row int8 activations -> int8 MXU dot with
    # int32 accumulation (W8A8 / W4A8; 2x the bf16 MXU rate on v5e+).
    act_bits: int = 0

    @property
    def shape(self) -> Tuple[int, ...]:
        s = list(self.data.shape)
        if self.bits == 4:
            s[-2] = s[-2] * 2
        return tuple(s)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.data, self.scales, self.zero_points)
        aux = (self.bits, self.group_size, self.act_bits)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scales, zero_points = children
        bits, group_size, act_bits = aux
        return cls(data=data, scales=scales, zero_points=zero_points,
                   bits=bits, group_size=group_size, act_bits=act_bits)

    # -- convenience --------------------------------------------------------
    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nbytes(self) -> int:
        n = self.data.size * self.data.dtype.itemsize
        n += self.scales.size * self.scales.dtype.itemsize
        if self.zero_points is not None:
            n += self.zero_points.size * self.zero_points.dtype.itemsize
        return n

    @property
    def is_symmetric(self) -> bool:
        return self.zero_points is None

    def __repr__(self) -> str:  # keep short: shows in jit traces
        return (f"QuantizedTensor(shape={self.shape}, bits={self.bits}, "
                f"group_size={self.group_size}, sym={self.is_symmetric}, "
                f"act_bits={self.act_bits})")


def pack_int4(values: jnp.ndarray) -> jnp.ndarray:
    """Pack int8-held int4 values (range [-8, 7]) half-split along axis 0.

    packed[i] = (values[i + K/2] << 4) | (values[i] & 0x0F).
    Result has shape (K//2, ...). K must be even.
    """
    if values.shape[0] % 2 != 0:
        raise ValueError(f"int4 packing needs even leading dim, got {values.shape}")
    half = values.shape[0] // 2
    lo = values[:half].astype(jnp.uint8) & 0x0F
    hi = values[half:].astype(jnp.uint8) & 0x0F
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4: (K//2, ...) int8 -> (K, ...) int8 in [-8, 7].

    Sign extension: shift the nibble into the top of the byte then
    arithmetic-shift back down. Half-split layout makes this a concat.
    """
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: extends sign
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=0)
