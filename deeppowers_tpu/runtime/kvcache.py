"""KV cache: fixed-shape, slot-based, optionally int8-quantized.

TPU-native replacement for the reference's per-layer K/V cache
(reference: src/core/execution/models/gpt_model.cpp:362-430 init/update/clear,
and INT8 KV compression under memory pressure at :532-545). Differences by
design:

- One preallocated buffer per layer of shape (B, S_max, K, D) — B is the
  fixed number of batch slots (continuous batching), S_max the max sequence.
  Fixed shapes mean the decode step compiles once; growth is masking, not
  reallocation.
- Buffers are *donated* across decode steps (jax.jit donate_argnums) so XLA
  updates them in place in HBM.
- int8 mode stores values quantized per (slot, position, kv-head) with f32
  scales — always on, not a memory-pressure fallback, selected by
  QuantConfig.kv_cache_dtype.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class LayerKVCache:
    """KV storage for one layer.

    k/v: (B, S, K, D) in store_dtype (bf16 or int8), or (B, S, K, D/2)
    packed when bits == 4 (half-split along D: low nibbles hold the first
    D/2 features).
    k_scale/v_scale: (B, S, K, 1) f32 when quantized, else None.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    bits: int = 8          # 8 (or 16 = float store) | 4 packed

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), (self.bits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, bits=aux[0])

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    num_layers: int,
    batch_slots: int,
    max_seq: int,
    num_kv_heads: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    kv_cache_dtype: str = "bf16",
) -> Tuple[LayerKVCache, ...]:
    """Allocate zeroed caches for all layers (tuple => pytree)."""
    shape = (batch_slots, max_seq, num_kv_heads, head_dim)
    caches = []
    for _ in range(num_layers):
        if kv_cache_dtype == "int8":
            caches.append(LayerKVCache(
                k=jnp.zeros(shape, dtype=jnp.int8),
                v=jnp.zeros(shape, dtype=jnp.int8),
                k_scale=jnp.zeros(shape[:3] + (1,), dtype=jnp.float32),
                v_scale=jnp.zeros(shape[:3] + (1,), dtype=jnp.float32),
            ))
        elif kv_cache_dtype == "int4":
            if head_dim % 2:
                raise ValueError("int4 KV needs an even head_dim")
            pshape = shape[:3] + (head_dim // 2,)
            caches.append(LayerKVCache(
                k=jnp.zeros(pshape, dtype=jnp.int8),
                v=jnp.zeros(pshape, dtype=jnp.int8),
                k_scale=jnp.zeros(shape[:3] + (1,), dtype=jnp.float32),
                v_scale=jnp.zeros(shape[:3] + (1,), dtype=jnp.float32),
                bits=4,
            ))
        elif kv_cache_dtype == "bf16":
            caches.append(LayerKVCache(
                k=jnp.zeros(shape, dtype=dtype),
                v=jnp.zeros(shape, dtype=dtype),
                k_scale=None, v_scale=None,
            ))
        else:
            raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r}")
    return tuple(caches)


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per (slot, pos, head) symmetric int8. x: (..., D)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    return q, scale


def _dequant_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _quant_kv4(x: jnp.ndarray):
    """Per (..., head) symmetric int4, packed 2/byte half-split along D."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, 7)
    d = q.shape[-1]
    lo = q[..., :d // 2].astype(jnp.int32) & 0x0F
    hi = q[..., d // 2:].astype(jnp.int32) & 0x0F
    return ((hi << 4) | lo).astype(jnp.int8), scale


def _dequant_kv4(packed: jnp.ndarray, scale: jnp.ndarray, dtype):
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.float32)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(jnp.float32)
    vals = jnp.concatenate([lo, hi], axis=-1)
    return (vals * scale).astype(dtype)


def _quant_for(cache, x):
    return _quant_kv4(x) if cache.bits == 4 else _quant_kv(x)


def _is_paged(cache) -> bool:
    from . import kvcache_paged
    return isinstance(cache, kvcache_paged.PagedLayerKVCache)


def write_prompt(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 slot: jnp.ndarray | int):
    """Write a whole (padded) prompt's K/V into one slot.

    k_new/v_new: (S_pad, K, D). The padded region carries garbage — masked at
    read time by `lengths`.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.write_prompt(cache, k_new, v_new, slot)
    s = k_new.shape[0]
    if cache.quantized:
        qk, sk = _quant_for(cache, k_new)
        qv, sv = _quant_for(cache, v_new)
        return LayerKVCache(
            k=jax.lax.dynamic_update_slice(cache.k, qk[None], (slot, 0, 0, 0)),
            v=jax.lax.dynamic_update_slice(cache.v, qv[None], (slot, 0, 0, 0)),
            k_scale=jax.lax.dynamic_update_slice(
                cache.k_scale, sk[None], (slot, 0, 0, 0)),
            v_scale=jax.lax.dynamic_update_slice(
                cache.v_scale, sv[None], (slot, 0, 0, 0)),
            bits=cache.bits,
        )
    return LayerKVCache(
        k=jax.lax.dynamic_update_slice(
            cache.k, k_new[None].astype(cache.k.dtype), (slot, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            cache.v, v_new[None].astype(cache.v.dtype), (slot, 0, 0, 0)),
        k_scale=None, v_scale=None,
    )


def write_chunk(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                slot: jnp.ndarray | int, start: jnp.ndarray | int):
    """Write a prefill chunk's K/V at [slot, start:start+C] (chunked
    prefill). k_new/v_new: (C, K, D).

    Scatter with drop semantics, NOT dynamic_update_slice: d_u_s CLAMPS the
    start index so the update fits, which silently shifts a tail chunk (or a
    prefix-cache suffix starting at an arbitrary `matched` offset) backwards
    over valid rows. With the scatter, out-of-range positions are dropped
    (they're beyond the request's length anyway). Paged caches require
    page-aligned start (the engine's chunk size is a page multiple)."""
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.write_chunk(cache, k_new, v_new, slot, start)
    pos = start + jnp.arange(k_new.shape[0])
    if cache.quantized:
        qk, sk = _quant_for(cache, k_new)
        qv, sv = _quant_for(cache, v_new)
        return LayerKVCache(
            k=cache.k.at[slot, pos].set(qk, mode="drop"),
            v=cache.v.at[slot, pos].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[slot, pos].set(sk, mode="drop"),
            v_scale=cache.v_scale.at[slot, pos].set(sv, mode="drop"),
            bits=cache.bits,
        )
    return LayerKVCache(
        k=cache.k.at[slot, pos].set(k_new.astype(cache.k.dtype), mode="drop"),
        v=cache.v.at[slot, pos].set(v_new.astype(cache.v.dtype), mode="drop"),
        k_scale=None, v_scale=None,
    )


def slice_slot(cache, slot: jnp.ndarray | int):
    """View of one slot's row (batch dim kept, size 1)."""
    if _is_paged(cache):
        from . import kvcache_paged
        import dataclasses
        tab = jax.lax.dynamic_slice(
            cache.table, (slot, 0), (1, cache.table.shape[1]))
        return dataclasses.replace(cache, table=tab)
    def one(arr):
        if arr is None:
            return None
        return jax.lax.dynamic_slice_in_dim(arr, slot, 1, axis=0)
    return LayerKVCache(k=one(cache.k), v=one(cache.v),
                        k_scale=one(cache.k_scale),
                        v_scale=one(cache.v_scale), bits=cache.bits)


def append_token(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 positions: jnp.ndarray):
    """Append one token's K/V for every slot at its own position.

    k_new/v_new: (B, K, D); positions: (B,) write index per slot. Inactive
    slots should pass a valid (ignored) position — their data is never read.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.append_token(cache, k_new, v_new, positions)
    b = k_new.shape[0]
    slots = jnp.arange(b)
    if cache.quantized:
        qk, sk = _quant_for(cache, k_new)
        qv, sv = _quant_for(cache, v_new)
        return LayerKVCache(
            k=cache.k.at[slots, positions].set(qk),
            v=cache.v.at[slots, positions].set(qv),
            k_scale=cache.k_scale.at[slots, positions].set(sk),
            v_scale=cache.v_scale.at[slots, positions].set(sv),
            bits=cache.bits,
        )
    return LayerKVCache(
        k=cache.k.at[slots, positions].set(k_new.astype(cache.k.dtype)),
        v=cache.v.at[slots, positions].set(v_new.astype(cache.v.dtype)),
        k_scale=None, v_scale=None,
    )


def append_tokens(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                  positions: jnp.ndarray):
    """Write T tokens' K/V per slot at per-slot positions (speculative
    verification window). k_new/v_new: (B, T, K, D); positions: (B, T).
    Out-of-range positions are dropped (JAX scatter semantics) — the engine
    relies on this near the cache end."""
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.append_tokens(cache, k_new, v_new, positions)
    b = k_new.shape[0]
    slots = jnp.arange(b)[:, None]
    if cache.quantized:
        qk, sk = _quant_for(cache, k_new)
        qv, sv = _quant_for(cache, v_new)
        return LayerKVCache(
            k=cache.k.at[slots, positions].set(qk),
            v=cache.v.at[slots, positions].set(qv),
            k_scale=cache.k_scale.at[slots, positions].set(sk),
            v_scale=cache.v_scale.at[slots, positions].set(sv),
            bits=cache.bits,
        )
    return LayerKVCache(
        k=cache.k.at[slots, positions].set(k_new.astype(cache.k.dtype)),
        v=cache.v.at[slots, positions].set(v_new.astype(cache.v.dtype)),
        k_scale=None, v_scale=None,
    )


def slice_window(cache, window: int):
    """View of the first `window` positions (static size). Decode attention
    over the sliced cache reads only the live context from HBM instead of
    max_seq (the engine buckets `window` to bound recompiles). For paged
    caches this slices the page table (window must be a page multiple)."""
    if _is_paged(cache):
        import dataclasses
        wp = -(-window // cache.page_size)
        return dataclasses.replace(cache, table=cache.table[:, :wp])
    return LayerKVCache(
        k=cache.k[:, :window],
        v=cache.v[:, :window],
        k_scale=None if cache.k_scale is None else cache.k_scale[:, :window],
        v_scale=None if cache.v_scale is None else cache.v_scale[:, :window],
        bits=cache.bits,
    )


def copy_prefix(cache: LayerKVCache, src, dst, n) -> LayerKVCache:
    """Copy rows [0, n) of slot `src` into slot `dst` (prefix-cache reuse for
    the contiguous layout; serving/engine host logic finds the match).

    `n` is a traced int32 — one compiled program for every prefix length
    (masked full-row copy; a slot row is ~1 MB/layer, so the copy is a few
    hundred us of HBM traffic vs recomputing the prefill). Exact: causal K/V
    rows depend only on tokens [0, n), and quantized caches copy rows +
    scales bit-identically."""
    def one(arr):
        if arr is None:
            return None
        pos = jnp.arange(arr.shape[1]).reshape(
            (arr.shape[1],) + (1,) * (arr.ndim - 2))
        row = jnp.where(pos < n, arr[src], arr[dst])
        return arr.at[dst].set(row)
    return LayerKVCache(k=one(cache.k), v=one(cache.v),
                        k_scale=one(cache.k_scale),
                        v_scale=one(cache.v_scale), bits=cache.bits)


def read(cache, dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize (B, S, K, D) K/V in compute dtype (dequantizing if int8).

    XLA fuses the dequant (and the page gather, for paged caches) into the
    attention matmul's operand read.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.read(cache, dtype)
    if cache.quantized and cache.bits == 4:
        return (_dequant_kv4(cache.k, cache.k_scale, dtype),
                _dequant_kv4(cache.v, cache.v_scale, dtype))
    if cache.quantized:
        return (_dequant_kv(cache.k, cache.k_scale, dtype),
                _dequant_kv(cache.v, cache.v_scale, dtype))
    return cache.k.astype(dtype), cache.v.astype(dtype)


def read_raw(cache):
    """Raw (k, v, k_scale, v_scale) views for scale-folded quantized
    attention (ops.attention.attention_decode_quantized) — the int8 arrays
    reach the consumer without a dequantized copy. Paged caches gather
    pages (int8 gather = half the bytes of a dequantized gather)."""
    if _is_paged(cache):
        from . import kvcache_paged
        tab = cache.table
        k = kvcache_paged._gather(cache.k_pool, tab)
        v = kvcache_paged._gather(cache.v_pool, tab)
        ks = kvcache_paged._gather(cache.k_scale, tab)
        vs = kvcache_paged._gather(cache.v_scale, tab)
        return k, v, ks, vs
    return cache.k, cache.v, cache.k_scale, cache.v_scale


def nbytes(caches) -> int:
    total = 0
    for c in caches:
        arrs = ((c.k_pool, c.v_pool, c.k_scale, c.v_scale, c.table)
                if _is_paged(c) else (c.k, c.v, c.k_scale, c.v_scale))
        for arr in arrs:
            if arr is not None:
                total += arr.size * arr.dtype.itemsize
    return total
