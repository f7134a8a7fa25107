"""KV cache: fixed-shape, slot-based, optionally int8-quantized.

TPU-native replacement for the reference's per-layer K/V cache
(reference: src/core/execution/models/gpt_model.cpp:362-430 init/update/clear,
and INT8 KV compression under memory pressure at :532-545). Differences by
design:

- One preallocated buffer per layer of shape (B, S_max, F) with F = K*D —
  B is the fixed number of batch slots (continuous batching), S_max the max
  sequence. Fixed shapes mean the decode step compiles once; growth is
  masking, not reallocation.
- Storage is FLAT on the feature axis. A (B, S, K, D) array with small
  (K, D) minor dims is physically PADDED by XLA's tiled layouts (T(4,128)
  for K=4, D=64 — 2x the HBM bytes) and every kernel boundary pays a
  relayout copy; (B, S, K*D) tiles (8, 128) compactly and is the exact
  operand shape the Pallas decode-attention and append kernels want.
  `read`/`read_raw` return free (B, S, K, D) reshape VIEWS for the einsum
  consumers.
- Buffers are *donated* across decode steps (jax.jit donate_argnums) and the
  decode append writes rows in place via a Pallas scatter
  (ops/pallas/kv_append.py).
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

    k/v: (B, S, K*D) flat in store_dtype (bf16 or int8), or (B, S, K*D/2)
    packed when bits == 4 (half-split along D: low nibbles hold the first
    D/2 features of each head).
    k_scale/v_scale: (B, K, S) f32 when quantized, else None — HEAD-major:
    a (B, S, K) array with K minor is lane-padded K -> 128 by XLA's tiled
    HBM layout (32x the storage and stream traffic at K=4); S-minor tiles
    compactly and is the exact orientation the decode kernel consumes.
    head_width: the STORED per-head feature width (D, or D/2 packed int4) —
    invariant under kv-head sharding, so (B, S, K_local, width) views stay
    correct inside shard_map where the flat axis holds K/tp heads.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    bits: int = 8          # K store: 8 (or 16 = float) | 4 packed
    head_width: int = 1
    #: V store bits when different from K (0 = same). The shipped mixed
    #: mode is "k8v4": int8 K + packed int4 V — K drives attention scores
    #: through the softmax and is ~2.5x more ppl-sensitive than V
    #: (measured on the trained 124M: K-int4 +0.076, V-int4 +0.030,
    #: K8V4 +0.027 — docs/benchmarks.md round-4 KV gate).
    v_bits: int = 0
    #: Chunk-TRANSPOSED mirror of k: (B, S/128, K*D, 128) int8, chunk c =
    #: positions [c*128, (c+1)*128) feature-major. A derived acceleration
    #: mirror for the flat-loop decode-attention kernel
    #: (ops/pallas/decode_attention.decode_attention_kt): per-head score
    #: dots want K in (d, s) orientation, and the kernel reads live context
    #: at 128-row granularity (measured 2x the head-folded kernel at
    #: serving lengths). Maintained by the prefill writers (transposes at
    #: write time) and by the kernel itself (in-place flush of each chunk
    #: its row-major tail completes); k stays the source of truth, so every
    #: non-kernel path is unchanged. Costs the K bytes once more — the
    #: paged layout remains the capacity-bound serving path.
    kt: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale, self.kt),
                (self.bits, self.head_width, self.v_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   bits=aux[0], head_width=aux[1],
                   v_bits=aux[2] if len(aux) > 2 else 0,
                   kt=children[4] if len(children) > 4 else None)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def vbits(self) -> int:
        return self.v_bits or self.bits

    @property
    def kv_heads(self) -> int:
        return self.k.shape[-1] // self.head_width

    @property
    def head_dim(self) -> int:
        return self.head_width * 2 if self.bits == 4 else self.head_width

    @property
    def v_width(self) -> int:
        """Stored per-head width of the V tensor."""
        return self.head_dim // 2 if self.vbits == 4 else self.head_dim

    def _view4(self, arr, width: Optional[int] = None):
        b, s, f = arr.shape
        w = width or self.head_width
        return arr.reshape(b, s, f // w, w)


def init_cache(
    num_layers: int,
    batch_slots: int,
    max_seq: int,
    num_kv_heads: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
    kv_cache_dtype: str = "bf16",
    kv_kt: bool = False,
) -> Tuple[LayerKVCache, ...]:
    """Allocate zeroed caches for all layers (tuple => pytree).

    kv_kt: also allocate the chunk-transposed K mirror (int8 K stores with
    max_seq % 128 == 0 only — see LayerKVCache.kt)."""
    f = num_kv_heads * head_dim
    shape = (batch_slots, max_seq, f)
    sshape = (batch_slots, num_kv_heads, max_seq)
    kv_kt = kv_kt and kv_cache_dtype in ("int8", "k8v4") and max_seq % 128 == 0
    caches = []
    for _ in range(num_layers):
        # one buffer per layer — a shared zeros array would alias under the
        # decode loop's donation
        kt0 = (jnp.zeros((batch_slots, max_seq // 128, f, 128), jnp.int8)
               if kv_kt else None)
        if kv_cache_dtype == "int8":
            caches.append(LayerKVCache(
                k=jnp.zeros(shape, dtype=jnp.int8),
                v=jnp.zeros(shape, dtype=jnp.int8),
                k_scale=jnp.zeros(sshape, dtype=jnp.float32),
                v_scale=jnp.zeros(sshape, dtype=jnp.float32),
                head_width=head_dim, kt=kt0,
            ))
        elif kv_cache_dtype == "int4":
            if head_dim % 2:
                raise ValueError("int4 KV needs an even head_dim")
            # TWO scales per head for BOTH K and V (per D/2 sub-block,
            # sub-minor rows 2*head+half): one-scale int4 KV fails the
            # trained-weights Δppl gate (K +0.076 / total +0.13); K2+V2
            # half-scales pass at +0.036 total for a tiny scale table.
            # Round-4 KV gate, docs/benchmarks.md.
            caches.append(LayerKVCache(
                k=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                v=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                k_scale=jnp.zeros((batch_slots, 2 * num_kv_heads, max_seq),
                                  dtype=jnp.float32),
                v_scale=jnp.zeros((batch_slots, 2 * num_kv_heads, max_seq),
                                  dtype=jnp.float32),
                bits=4,
                head_width=head_dim // 2,
            ))
        elif kv_cache_dtype == "k8v4":
            # mixed: int8 K (score-side, ppl-sensitive) + packed int4 V —
            # 1.5 bytes/value at int8-K quality (see LayerKVCache.v_bits)
            if head_dim % 2:
                raise ValueError("k8v4 KV needs an even head_dim")
            caches.append(LayerKVCache(
                k=jnp.zeros(shape, dtype=jnp.int8),
                v=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                k_scale=jnp.zeros(sshape, dtype=jnp.float32),
                v_scale=jnp.zeros((batch_slots, 2 * num_kv_heads, max_seq),
                                  dtype=jnp.float32),
                bits=8, v_bits=4, head_width=head_dim, kt=kt0,
            ))
        elif kv_cache_dtype == "bf16":
            caches.append(LayerKVCache(
                k=jnp.zeros(shape, dtype=dtype),
                v=jnp.zeros(shape, dtype=dtype),
                k_scale=None, v_scale=None,
                head_width=head_dim,
            ))
        else:
            raise ValueError(f"unknown kv_cache_dtype {kv_cache_dtype!r}")
    return tuple(caches)


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per (slot, pos, head) symmetric int8. x: (..., K, D) ->
    ((..., K*D) int8, (..., K) f32 scales)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -128, 127).astype(jnp.int8)
    return _flat(q), scale[..., 0]


def _dequant_kv(q4: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """q4: (..., S, K, D) int8 view; scale: (..., K, S) head-major."""
    sc = jnp.swapaxes(scale, -1, -2)[..., None]             # (..., S, K, 1)
    return (q4.astype(jnp.float32) * sc).astype(dtype)


def _quant_kv4(x: jnp.ndarray, nh: int = 1):
    """Per (..., head[, D/nh sub-block]) symmetric int4, packed 2/byte
    half-split along D. x: (..., K, D) -> ((..., K*D/2) int8,
    (..., K*nh) f32 scales, sub-block-minor rows = head*nh + sub).

    nh=2 is the contiguous K-cache layout: int4 K with ONE scale per head
    costs +0.076 ppl on the trained 124M (K drives scores through the
    softmax); per-HALF scales cut that to +0.018 for 2x a tiny scale table
    (round-4 KV gate, docs/benchmarks.md)."""
    *lead, k, d = x.shape
    xr = x.astype(jnp.float32).reshape(*lead, k, nh, d // nh)
    absmax = jnp.max(jnp.abs(xr), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = (jnp.clip(jnp.round(xr / scale), -8, 7)
         .reshape(*lead, k, d))
    lo = q[..., :d // 2].astype(jnp.int32) & 0x0F
    hi = q[..., d // 2:].astype(jnp.int32) & 0x0F
    return (_flat(((hi << 4) | lo).astype(jnp.int8)),
            scale[..., 0].reshape(*lead, k * nh))


def _dequant_kv4(packed4: jnp.ndarray, scale: jnp.ndarray, dtype):
    """packed4: (..., S, K, D/2) int8 view; scale: (..., K*nh, S)
    head-major (nh sub-block scales per head, sub-minor)."""
    p32 = packed4.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.float32)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(jnp.float32)
    k = packed4.shape[-2]
    nh = scale.shape[-2] // k
    sc = jnp.swapaxes(scale, -1, -2)               # (..., S, K*nh)
    if nh == 1:
        vals = jnp.concatenate([lo, hi], axis=-1)
        return (vals * sc[..., None]).astype(dtype)
    # nh == 2: lo nibbles = D/2 sub-block 0 (scale row 2k), hi = sub 1
    sc = sc.reshape(sc.shape[:-1] + (k, nh))
    vals = jnp.concatenate([lo * sc[..., 0:1], hi * sc[..., 1:2]], axis=-1)
    return vals.astype(dtype)


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    """(..., K, D) -> (..., K*D)."""
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _quant_for(cache, x, which: str = "k"):
    bits = cache.bits if which == "k" else cache.vbits
    if bits != 4:
        return _quant_kv(x)
    # contiguous int4 K carries nh sub-block scales per head (the scale
    # table rows tell us the layout)
    sc = cache.k_scale if which == "k" else cache.v_scale
    nh = sc.shape[-2] // cache.kv_heads if sc is not None else 1
    return _quant_kv4(x, nh=max(nh, 1))


def _is_paged(cache) -> bool:
    from . import kvcache_paged
    return isinstance(cache, kvcache_paged.PagedLayerKVCache)


def kt_auto(kv_cache_dtype: str, num_kv_heads: int, head_dim: int) -> bool:
    """Default policy for the chunk-transposed K mirror: int8-K caches on
    TPU with a wide-enough feature axis. At F = Kh*D >= 2048 a 128-row K
    chunk is a >=256 KB DMA and the flat-loop kernel wins big (7B MHA:
    1026 -> 1145 tok/s in-model); at F = 512 (1.1B GQA) the per-chunk DMAs
    are issue-overhead-bound and the head-folded block kernel stays ahead
    (4057 -> 3618 measured) — so narrow caches keep the old path.
    DPT_KV_KT=0/1 overrides the width policy (A/B escape hatch; the
    alignment constraint below still applies)."""
    import os

    import jax as _jax
    # hard eligibility: int8 K store, and per-head scale DMA alignment —
    # Mosaic rejects (kh, 128) DMA slices when kh crosses a sublane tile
    # unaligned (kh=12 fails; kh<=8 and multiples of 8 compile)
    if kv_cache_dtype not in ("int8", "k8v4"):
        return False
    if not (num_kv_heads <= 8 or num_kv_heads % 8 == 0):
        return False
    env = os.environ.get("DPT_KV_KT", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return (_jax.default_backend() == "tpu"
            and num_kv_heads * head_dim >= 2048)


def _kt_write_prompts(kt, qk, slots):
    """Transpose a batch of written prompt rows into the kt mirror.

    qk: (B, S_pad, F) quantized flat rows (pad garbage included — readers
    mask by length, so transposing it is free of semantics)."""
    b, s_pad, f = qk.shape
    pad = (-s_pad) % 128
    if pad:
        qk = jnp.pad(qk, ((0, 0), (0, pad), (0, 0)))
    nch = qk.shape[1] // 128
    nch = min(nch, kt.shape[1])
    ch = jnp.swapaxes(qk[:, :nch * 128].reshape(b, nch, 128, f), 2, 3)
    return kt.at[slots, :nch].set(ch.astype(kt.dtype), mode="drop")


def _kt_refresh_chunks(kt, k_full, slot, start, c_len):
    """Re-derive the kt chunks a [start, start+c_len) row write touched,
    from the UPDATED row-major k (the source of truth) — correct for any
    alignment (chunked prefill, prefix-cache suffixes)."""
    s, f = k_full.shape[1], k_full.shape[2]
    nch_aff = min((c_len + 254) // 128, kt.shape[1])
    n128 = nch_aff * 128
    sc = jnp.clip((start // 128) * 128, 0, max(s - n128, 0))
    rows = jax.lax.dynamic_slice(
        k_full, (slot, sc, jnp.int32(0)), (1, n128, f))[0]
    ch = jnp.swapaxes(rows.reshape(nch_aff, 128, f), 1, 2)
    return kt.at[slot, sc // 128 + jnp.arange(nch_aff)].set(
        ch.astype(kt.dtype), mode="drop")


def write_prompt(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 slot: jnp.ndarray | int):
    """Write a whole (padded) prompt's K/V into one slot.

    k_new/v_new: (S_pad, K, D). The padded region carries garbage — masked at
    read time by `lengths`.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.write_prompt(cache, k_new, v_new, slot)
    # B=1 of the batched writer — ONE contiguous prompt-write code path
    # (VERDICT r3 item 9). Semantics note: out-of-range slots now DROP
    # (scatter) instead of clamping; every caller passes valid or
    # deliberately-dropping slots (engine _prefill_core masks ownership).
    return write_prompts(cache, k_new[None], v_new[None],
                         jnp.asarray(slot, jnp.int32)[None])


def write_prompts(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                  slots: jnp.ndarray):
    """Batched write_prompt: B prompts' K/V into B slots in one scatter.

    k_new/v_new: (B, S_pad, K, D); slots: (B,) int32 — out-of-range slots
    DROP (the batched-admission flush pads groups with slot=num_slots).
    Contiguous caches only (the batched admission path gates on layout)."""
    if _is_paged(cache):
        raise NotImplementedError("write_prompts: contiguous caches only")
    s_pad = k_new.shape[1]
    if cache.quantized:
        qk, sk = jax.vmap(lambda t: _quant_for(cache, t, "k"))(k_new)
        qv, sv = jax.vmap(lambda t: _quant_for(cache, t, "v"))(v_new)
        return LayerKVCache(
            k=cache.k.at[slots, :s_pad].set(qk, mode="drop"),
            v=cache.v.at[slots, :s_pad].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[slots, :, :s_pad].set(
                jnp.swapaxes(sk, 1, 2), mode="drop"),
            v_scale=cache.v_scale.at[slots, :, :s_pad].set(
                jnp.swapaxes(sv, 1, 2), mode="drop"),
            bits=cache.bits, v_bits=cache.v_bits, head_width=cache.head_width,
            kt=(None if cache.kt is None
                else _kt_write_prompts(cache.kt, qk, slots)),
        )
    return LayerKVCache(
        k=cache.k.at[slots, :s_pad].set(
            jax.vmap(_flat)(k_new).astype(cache.k.dtype), mode="drop"),
        v=cache.v.at[slots, :s_pad].set(
            jax.vmap(_flat)(v_new).astype(cache.v.dtype), mode="drop"),
        k_scale=None, v_scale=None, head_width=cache.head_width,
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
        qk, sk = _quant_for(cache, k_new, "k")
        qv, sv = _quant_for(cache, v_new, "v")
        k_upd = cache.k.at[slot, pos].set(qk, mode="drop")
        return LayerKVCache(
            k=k_upd,
            v=cache.v.at[slot, pos].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[slot, :, pos].set(sk, mode="drop"),
            v_scale=cache.v_scale.at[slot, :, pos].set(sv, mode="drop"),
            bits=cache.bits, v_bits=cache.v_bits, head_width=cache.head_width,
            kt=(None if cache.kt is None else _kt_refresh_chunks(
                cache.kt, k_upd, slot, start, k_new.shape[0])),
        )
    return LayerKVCache(
        k=cache.k.at[slot, pos].set(
            _flat(k_new).astype(cache.k.dtype), mode="drop"),
        v=cache.v.at[slot, pos].set(
            _flat(v_new).astype(cache.v.dtype), mode="drop"),
        k_scale=None, v_scale=None, head_width=cache.head_width,
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
                        v_scale=one(cache.v_scale), bits=cache.bits, v_bits=cache.v_bits,
                        head_width=cache.head_width, kt=one(cache.kt))


def append_token(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                 positions: jnp.ndarray):
    """Append one token's K/V for every slot at its own position.

    k_new/v_new: (B, K, D); positions: (B,) write index per slot. Inactive
    slots should pass a valid (ignored) position — their data is never read.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.append_token(cache, k_new, v_new, positions)
    return _scatter_rows_cache(cache, k_new, v_new, positions)


def append_tokens(cache, k_new: jnp.ndarray, v_new: jnp.ndarray,
                  positions: jnp.ndarray):
    """Write T tokens' K/V per slot at per-slot positions (speculative
    verification window). k_new/v_new: (B, T, K, D); positions: (B, T).
    Out-of-range positions are dropped (JAX scatter semantics) — the engine
    relies on this near the cache end."""
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.append_tokens(cache, k_new, v_new, positions)
    return _scatter_rows_cache(cache, k_new, v_new, positions)


def _scatter_rows_cache(cache, k_new, v_new, positions):
    """Shared append body. On TPU the write is a Pallas in-place row scatter
    (ops/pallas/kv_append.py) — the jnp scatter made XLA pick an S-minor
    layout for the cache loop carry, and relayout copies at the Pallas
    decode-attention boundary then cost ~950us/step on the 1.1B loop. Both
    paths share JAX drop semantics for out-of-range positions."""
    use_pallas = jax.default_backend() == "tpu" and cache.k.shape[1] % 8 == 0
    multi = positions.ndim == 2
    slots = (jnp.arange(k_new.shape[0])[:, None] if multi
             else jnp.arange(k_new.shape[0]))
    if cache.quantized:
        qk, sk = _quant_for(cache, k_new, "k")
        qv, sv = _quant_for(cache, v_new, "v")
        if use_pallas:
            from ..ops.pallas.kv_append import scatter_rows
            k, v, ks, vs = scatter_rows(
                [cache.k, cache.v], [qk, qv], positions,
                scales=[cache.k_scale, cache.v_scale],
                scale_rows=[sk, sv])
            # kt passes through unchanged: the decode-attention kernel reads
            # appended rows from k directly and flushes completed chunks
            # into the mirror itself
            return LayerKVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                                bits=cache.bits, v_bits=cache.v_bits, head_width=cache.head_width,
                                kt=cache.kt)
        return LayerKVCache(
            k=cache.k.at[slots, positions].set(qk, mode="drop"),
            v=cache.v.at[slots, positions].set(qv, mode="drop"),
            k_scale=cache.k_scale.at[slots, :, positions].set(
                sk, mode="drop"),
            v_scale=cache.v_scale.at[slots, :, positions].set(
                sv, mode="drop"),
            bits=cache.bits, v_bits=cache.v_bits, head_width=cache.head_width,
            kt=cache.kt,
        )
    kf = _flat(k_new).astype(cache.k.dtype)
    vf = _flat(v_new).astype(cache.v.dtype)
    if use_pallas:
        from ..ops.pallas.kv_append import scatter_rows
        k, v = scatter_rows([cache.k, cache.v], [kf, vf], positions)[:2]
        return LayerKVCache(k=k, v=v, k_scale=None, v_scale=None,
                            head_width=cache.head_width)
    return LayerKVCache(
        k=cache.k.at[slots, positions].set(kf, mode="drop"),
        v=cache.v.at[slots, positions].set(vf, mode="drop"),
        k_scale=None, v_scale=None, head_width=cache.head_width,
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
    # kt is dropped from windowed views: the kt kernel takes the FULL cache
    # (its flat loop self-bounds to live rows finer than any window bucket),
    # so a windowed cache falling back to the non-kt paths is correct.
    return LayerKVCache(
        k=cache.k[:, :window],
        v=cache.v[:, :window],
        k_scale=(None if cache.k_scale is None
                 else cache.k_scale[:, :, :window]),
        v_scale=(None if cache.v_scale is None
                 else cache.v_scale[:, :, :window]),
        bits=cache.bits, v_bits=cache.v_bits, head_width=cache.head_width,
    )


def copy_prefix(cache: LayerKVCache, src, dst, n) -> LayerKVCache:
    """Copy rows [0, n) of slot `src` into slot `dst` (prefix-cache reuse for
    the contiguous layout; serving/engine host logic finds the match).

    `n` is a traced int32 — one compiled program for every prefix length
    (masked full-row copy; a slot row is ~1 MB/layer, so the copy is a few
    hundred us of HBM traffic vs recomputing the prefill). Exact: causal K/V
    rows depend only on tokens [0, n), and quantized caches copy rows +
    scales bit-identically."""
    def one(arr, pos_axis):
        if arr is None:
            return None
        shp = [1] * (arr.ndim - 1)
        shp[pos_axis - 1] = arr.shape[pos_axis]
        pos = jnp.arange(arr.shape[pos_axis]).reshape(shp)
        row = jnp.where(pos < n, arr[src], arr[dst])
        return arr.at[dst].set(row)

    def one_kt(arr):
        if arr is None:
            return None
        # position axis of kt splits across (chunk, lane): chunk*128 + lane.
        # The partially-covered boundary chunk may copy src rows that are
        # stale in src's mirror — self-healing (the kernel re-flushes the
        # chunk from k before it becomes readable; see decode_attention_kt).
        c, lanes = arr.shape[1], arr.shape[3]
        pos = (jnp.arange(c)[:, None, None] * lanes
               + jnp.arange(lanes)[None, None, :])
        row = jnp.where(pos < n, arr[src], arr[dst])
        return arr.at[dst].set(row)
    return LayerKVCache(k=one(cache.k, 1), v=one(cache.v, 1),
                        k_scale=one(cache.k_scale, 2),
                        v_scale=one(cache.v_scale, 2), bits=cache.bits, v_bits=cache.v_bits,
                        head_width=cache.head_width, kt=one_kt(cache.kt))


def read(cache, dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize (B, S, K, D) K/V in compute dtype (dequantizing if int8).

    XLA fuses the dequant (and the page gather, for paged caches) into the
    attention matmul's operand read.
    """
    if _is_paged(cache):
        from . import kvcache_paged
        return kvcache_paged.read(cache, dtype)
    if cache.quantized:
        dq_k = _dequant_kv4 if cache.bits == 4 else _dequant_kv
        dq_v = _dequant_kv4 if cache.vbits == 4 else _dequant_kv
        return (dq_k(cache._view4(cache.k), cache.k_scale, dtype),
                dq_v(cache._view4(cache.v, cache.v_width), cache.v_scale,
                     dtype))
    return (cache._view4(cache.k).astype(dtype),
            cache._view4(cache.v).astype(dtype))


def read_raw(cache):
    """Raw (k, v, k_scale, v_scale) views for scale-folded quantized
    attention — k/v as (B, S, K, D) int8 views of the flat store, scales
    HEAD-major (B, K, S) f32 (the orientation every consumer wants); the
    int8 arrays reach the consumer without a dequantized copy. Paged caches
    gather pages (int8 gather = half the bytes of a dequantized gather)."""
    if _is_paged(cache):
        from . import kvcache_paged
        tab = cache.table
        k = cache._view4(kvcache_paged._gather(cache.k_pool, tab))
        v = cache._view4(kvcache_paged._gather(cache.v_pool, tab),
                         cache.v_width)
        ks = kvcache_paged._gather_scale_hm(cache.k_scale, tab)
        vs = kvcache_paged._gather_scale_hm(cache.v_scale, tab)
        return k, v, ks, vs
    return (cache._view4(cache.k), cache._view4(cache.v, cache.v_width),
            cache.k_scale, cache.v_scale)


def nbytes(caches) -> int:
    total = 0
    for c in caches:
        arrs = ((c.k_pool, c.v_pool, c.k_scale, c.v_scale, c.table)
                if _is_paged(c) else (c.k, c.v, c.k_scale, c.v_scale, c.kt))
        for arr in arrs:
            if arr is not None:
                total += arr.size * arr.dtype.itemsize
    return total
