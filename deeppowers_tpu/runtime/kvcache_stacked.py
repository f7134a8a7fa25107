"""Stacked KV cache: all layers in one flat (L, B, S, K*D) buffer, for
scan-over-layers forwards.

With per-layer caches, a model's forward unrolls L copies of the layer body
into the compiled program — compile time and program size scale with depth
(80 layers x several engine variants is minutes of XLA time per shape). The
scan path (models/transformer.py, RuntimeConfig.scan_layers) compiles the
layer body ONCE and `lax.scan`s over stacked per-layer params.

The cache must then be indexable by a *traced* layer index. This module
stores all layers stacked FLAT on the feature axis ((L, B, S, K*D) values,
(L, B, S, K) scales — see runtime/kvcache.py for why flat: small (K, D)
minor dims are physically padded by XLA's tiled layouts and relayout-copied
at Pallas boundaries). Decode appends go through the in-place Pallas row
scatter (ops/pallas/kv_append.py, scatter_rows_stacked) with the traced
layer index as a prefetched scalar; prefill writes are jnp scatters at
[layer, ...]. Reads are dynamic-slices at the layer index returning
(B, W, K, D) views, fused into the attention consumers.

Quantization semantics are identical to runtime/kvcache.py (per
(slot, position, kv-head) symmetric int8 with f32 scales).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import functools

from .kvcache import _dequant_kv, _dequant_kv4, _flat, _quant_kv, _quant_kv4


@jax.tree_util.register_pytree_node_class
@dataclass
class StackedKVCache:
    """KV storage for ALL layers: k/v (L, B, S, K*D) flat ((L, B, S, K*D/2)
    when bits == 4); scales (L, B, S, K)."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    bits: int = 8
    head_width: int = 1    # stored per-head K width (D, or D/2 packed int4);
                           # invariant under kv-head sharding (see kvcache)
    #: V bits when != K (0 = same): the mixed "k8v4" mode on the scan
    #: layout (int8 K + packed int4 V — the quality-gated int4-class
    #: default, round-4 KV gate)
    v_bits: int = 0

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale),
                (self.bits, self.head_width, self.v_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, bits=aux[0], head_width=aux[1],
                   v_bits=aux[2] if len(aux) > 2 else 0)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def vbits(self) -> int:
        return self.v_bits or self.bits

    @property
    def v_width(self) -> int:
        d = self.head_width * 2 if self.bits == 4 else self.head_width
        return d // 2 if self.vbits == 4 else d

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    def _view4(self, arr, width=None):
        w = width or self.head_width
        return arr.reshape(arr.shape[:-1] + (arr.shape[-1] // w, w))


def _quant_fns(cache):
    """(k_quantizer, v_quantizer) for a stacked cache — per-side bits with
    2 sub-block scales per head on packed-int4 sides."""
    q4 = functools.partial(_quant_kv4, nh=2)
    return (q4 if cache.bits == 4 else _quant_kv,
            q4 if cache.vbits == 4 else _quant_kv)


def init_cache(num_layers: int, batch_slots: int, max_seq: int,
               num_kv_heads: int, head_dim: int, *, dtype=jnp.bfloat16,
               kv_cache_dtype: str = "bf16") -> StackedKVCache:
    f = num_kv_heads * head_dim
    shape = (num_layers, batch_slots, max_seq, f)
    sshape = (num_layers, batch_slots, num_kv_heads, max_seq)
    if kv_cache_dtype == "int8":
        return StackedKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            k_scale=jnp.zeros(sshape, dtype=jnp.float32),
            v_scale=jnp.zeros(sshape, dtype=jnp.float32),
            head_width=head_dim)
    if kv_cache_dtype == "int4":
        if head_dim % 2:
            raise ValueError("int4 KV needs an even head_dim")
        # two sub-block scales per head for K and V (rows 2*head+half) —
        # the half-scale int4 layout the round-4 Δppl gate demanded; same
        # grid as the contiguous layout so results stay bit-equal
        s2 = sshape[:2] + (2 * sshape[2],) + sshape[3:]
        return StackedKVCache(
            k=jnp.zeros(shape[:3] + (f // 2,), dtype=jnp.int8),
            v=jnp.zeros(shape[:3] + (f // 2,), dtype=jnp.int8),
            k_scale=jnp.zeros(s2, dtype=jnp.float32),
            v_scale=jnp.zeros(s2, dtype=jnp.float32),
            bits=4, head_width=head_dim // 2)
    if kv_cache_dtype == "k8v4":
        if head_dim % 2:
            raise ValueError("k8v4 KV needs an even head_dim")
        s2 = sshape[:2] + (2 * sshape[2],) + sshape[3:]
        return StackedKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape[:3] + (f // 2,), dtype=jnp.int8),
            k_scale=jnp.zeros(sshape, dtype=jnp.float32),
            v_scale=jnp.zeros(s2, dtype=jnp.float32),
            bits=8, v_bits=4, head_width=head_dim)
    if kv_cache_dtype != "bf16":
        raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r}")
    return StackedKVCache(k=jnp.zeros(shape, dtype=dtype),
                          v=jnp.zeros(shape, dtype=dtype),
                          k_scale=None, v_scale=None,
                          head_width=head_dim)


def write_prompt_layer(cache: StackedKVCache, layer, k_new, v_new, slot
                       ) -> StackedKVCache:
    """Write a padded prompt's K/V into [layer, slot]. k_new/v_new: (S, K, D).

    Scatter semantics: an out-of-range `slot` drops the write — the data-
    parallel prefill passes slot=B for shards that don't own the request."""
    return write_chunk_layer(cache, layer, k_new, v_new, slot, 0)


def write_prompts_layer(cache: StackedKVCache, layer, k_new, v_new, slots
                        ) -> StackedKVCache:
    """Batched prompt write for layer `layer`: B prompts into B slots.
    k_new/v_new: (B, S_pad, K, D); slots: (B,) — out-of-range slots drop
    (batched-admission groups pad with slot=B)."""
    s_pad = k_new.shape[1]
    if cache.quantized:
        qfk, qfv = _quant_fns(cache)
        qk, sk = jax.vmap(qfk)(k_new)
        qv, sv = jax.vmap(qfv)(v_new)
        return StackedKVCache(
            k=cache.k.at[layer, slots, :s_pad].set(qk, mode="drop"),
            v=cache.v.at[layer, slots, :s_pad].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[layer, slots, :, :s_pad].set(
                jnp.swapaxes(sk, 1, 2), mode="drop"),
            v_scale=cache.v_scale.at[layer, slots, :, :s_pad].set(
                jnp.swapaxes(sv, 1, 2), mode="drop"),
            bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)
    return StackedKVCache(
        k=cache.k.at[layer, slots, :s_pad].set(
            jax.vmap(_flat)(k_new).astype(cache.k.dtype), mode="drop"),
        v=cache.v.at[layer, slots, :s_pad].set(
            jax.vmap(_flat)(v_new).astype(cache.v.dtype), mode="drop"),
        k_scale=None, v_scale=None, bits=cache.bits,
        head_width=cache.head_width, v_bits=cache.v_bits)


def write_chunk_layer(cache: StackedKVCache, layer, k_new, v_new, slot, start
                      ) -> StackedKVCache:
    """Write a prefill chunk at [layer, slot, start:start+C]. k_new: (C, K, D).
    Out-of-range slot/positions drop (scatter semantics)."""
    c = k_new.shape[0]
    pos = start + jnp.arange(c)
    if cache.quantized:
        qfk, qfv = _quant_fns(cache)
        qk, sk = qfk(k_new)
        qv, sv = qfv(v_new)
        return StackedKVCache(
            k=cache.k.at[layer, slot, pos].set(qk, mode="drop"),
            v=cache.v.at[layer, slot, pos].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[layer, slot, :, pos].set(
                sk, mode="drop"),
            v_scale=cache.v_scale.at[layer, slot, :, pos].set(
                sv, mode="drop"),
            bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)
    return StackedKVCache(
        k=cache.k.at[layer, slot, pos].set(
            _flat(k_new).astype(cache.k.dtype), mode="drop"),
        v=cache.v.at[layer, slot, pos].set(
            _flat(v_new).astype(cache.v.dtype), mode="drop"),
        k_scale=None, v_scale=None, bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)


def _append(cache: StackedKVCache, layer, k_new, v_new, positions
            ) -> StackedKVCache:
    """Shared append body: Pallas in-place scatter on TPU (see
    kvcache._scatter_rows_cache for why), jnp scatter elsewhere."""
    use_pallas = (jax.default_backend() == "tpu"
                  and cache.k.shape[2] % 8 == 0)
    multi = positions.ndim == 2
    slots = (jnp.arange(k_new.shape[0])[:, None] if multi
             else jnp.arange(k_new.shape[0]))
    if cache.quantized:
        qfk, qfv = _quant_fns(cache)
        qk, sk = qfk(k_new)
        qv, sv = qfv(v_new)
        if use_pallas:
            from ..ops.pallas.kv_append import scatter_rows_stacked
            k, v, ks, vs = scatter_rows_stacked(
                [cache.k, cache.v], [qk, qv], layer, positions,
                scales=[cache.k_scale, cache.v_scale],
                scale_rows=[sk, sv])
            return StackedKVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                                  bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)
        return StackedKVCache(
            k=cache.k.at[layer, slots, positions].set(qk, mode="drop"),
            v=cache.v.at[layer, slots, positions].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[layer, slots, :, positions].set(
                sk, mode="drop"),
            v_scale=cache.v_scale.at[layer, slots, :, positions].set(
                sv, mode="drop"),
            bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)
    kf = _flat(k_new).astype(cache.k.dtype)
    vf = _flat(v_new).astype(cache.v.dtype)
    if use_pallas:
        from ..ops.pallas.kv_append import scatter_rows_stacked
        k, v = scatter_rows_stacked([cache.k, cache.v], [kf, vf], layer,
                                    positions)[:2]
        return StackedKVCache(k=k, v=v, k_scale=None, v_scale=None,
                              bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)
    return StackedKVCache(
        k=cache.k.at[layer, slots, positions].set(kf, mode="drop"),
        v=cache.v.at[layer, slots, positions].set(vf, mode="drop"),
        k_scale=None, v_scale=None, bits=cache.bits, head_width=cache.head_width, v_bits=cache.v_bits)


def append_token_layer(cache: StackedKVCache, layer, k_new, v_new, positions
                       ) -> StackedKVCache:
    """Append one token per slot at [layer, slot, position]. k_new: (B, K, D)."""
    return _append(cache, layer, k_new, v_new, positions)


def append_tokens_layer(cache: StackedKVCache, layer, k_new, v_new, positions
                        ) -> StackedKVCache:
    """Write T tokens per slot (speculative verify). k_new: (B, T, K, D);
    positions: (B, T). Out-of-range positions are dropped."""
    return _append(cache, layer, k_new, v_new, positions)


def _slice_layer(arr, layer, window: Optional[int], pos_axis: int = 1):
    if arr is None:
        return None
    out = jax.lax.dynamic_index_in_dim(arr, layer, axis=0, keepdims=False)
    if window is not None:
        out = (out[:, :window] if pos_axis == 1 else out[:, :, :window])
    return out


def read_layer(cache: StackedKVCache, layer, dtype=jnp.bfloat16,
               window: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize layer `layer`'s (B, W, K, D) K/V in compute dtype."""
    k = cache._view4(_slice_layer(cache.k, layer, window))
    v = cache._view4(_slice_layer(cache.v, layer, window), cache.v_width)
    if cache.quantized:
        ks = _slice_layer(cache.k_scale, layer, window, pos_axis=2)
        vs = _slice_layer(cache.v_scale, layer, window, pos_axis=2)
        dqk = _dequant_kv4 if cache.bits == 4 else _dequant_kv
        dqv = _dequant_kv4 if cache.vbits == 4 else _dequant_kv
        return dqk(k, ks, dtype), dqv(v, vs, dtype)
    return k.astype(dtype), v.astype(dtype)


def read_raw_layer(cache: StackedKVCache, layer,
                   window: Optional[int] = None):
    """Raw (k, v, k_scale, v_scale) views of one layer for scale-folded
    quantized attention — k/v as (B, W, K, D) views, scales HEAD-major
    (B, K, W)."""
    return (cache._view4(_slice_layer(cache.k, layer, window)),
            cache._view4(_slice_layer(cache.v, layer, window),
                         cache.v_width),
            _slice_layer(cache.k_scale, layer, window, pos_axis=2),
            _slice_layer(cache.v_scale, layer, window, pos_axis=2))


def read_slot_layer(cache: StackedKVCache, layer, slot, dtype=jnp.bfloat16,
                    window: Optional[int] = None):
    """One slot's (1, W, K, D) K/V of one layer in compute dtype (chunked-
    prefill attention reads only the prefilling request's row)."""
    def one(arr, pos_axis=1):
        if arr is None:
            return None
        lay = jax.lax.dynamic_index_in_dim(arr, layer, axis=0, keepdims=False)
        row = jax.lax.dynamic_slice_in_dim(lay, slot, 1, axis=0)
        if window is None:
            return row
        return row[:, :window] if pos_axis == 1 else row[:, :, :window]
    k = cache._view4(one(cache.k))
    v = cache._view4(one(cache.v), cache.v_width)
    if cache.quantized:
        dqk = _dequant_kv4 if cache.bits == 4 else _dequant_kv
        dqv = _dequant_kv4 if cache.vbits == 4 else _dequant_kv
        return (dqk(k, one(cache.k_scale, 2), dtype),
                dqv(v, one(cache.v_scale, 2), dtype))
    return k.astype(dtype), v.astype(dtype)


def copy_prefix(cache: StackedKVCache, src, dst, n) -> StackedKVCache:
    """Copy rows [0, n) of slot `src` into slot `dst` across ALL layers
    (prefix-cache reuse for the scan layout; see kvcache.copy_prefix)."""
    def one(arr, pos_axis=2):
        if arr is None:
            return None
        shp = [1] * (arr.ndim - 1)
        shp[pos_axis - 1] = arr.shape[pos_axis]
        pos = jnp.arange(arr.shape[pos_axis]).reshape(shp)
        row = jnp.where(pos < n, arr[:, src], arr[:, dst])
        return arr.at[:, dst].set(row)
    return StackedKVCache(k=one(cache.k), v=one(cache.v),
                          k_scale=one(cache.k_scale, 3),
                          v_scale=one(cache.v_scale, 3), bits=cache.bits,
                          head_width=cache.head_width, v_bits=cache.v_bits)


def nbytes(cache: StackedKVCache) -> int:
    total = 0
    for arr in (cache.k, cache.v, cache.k_scale, cache.v_scale):
        if arr is not None:
            total += arr.size * arr.dtype.itemsize
    return total
