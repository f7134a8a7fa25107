"""Paged KV cache: fixed-size HBM pages + per-slot page tables.

The SURVEY.md §5.7 plan item: "KV-cache paging in HBM via fixed-size pages
indexed per request". Slots no longer reserve max_seq each — they draw pages
from a shared pool as their context grows, so a pool sized for the *expected*
total context serves more concurrent requests than contiguous reservation
(vLLM's PagedAttention insight, expressed functionally for XLA).

Layout (per layer), FLAT on the feature axis (see runtime/kvcache.py for
why: small (Kh, D) minor dims are physically padded by XLA's tiled layouts
and relayout-copied at Pallas kernel boundaries):
  k_pool/v_pool: (P, page, Kh*D) — P pages shared by all slots
  k_scale/v_scale: (P, Kh, page) f32 when int8/int4 — head-major so a
      page's scale slice is lane-aligned (page=128 lanes) for kernel DMA;
      the decode kernel consumes (Kh, rows) directly. int4 pools store
      nibble-packed half-split heads (width D/2, kvcache._quant_kv4) and
      the paged MXU kernel unpacks in two folded half-spaces
  table: (B, max_pages) int32 — page id per (slot, virtual page); shared
         values across layers (small; replicated into each layer's pytree so
         the cache stays a self-contained donated value)

Decode attention walks the page table inside a Pallas kernel
(ops/pallas/decode_attention.decode_attention_paged_mxu) — the jnp.take
gather path (read/read_raw) materializes the whole gathered view and is
kept for prefill/CPU/fallback consumers. Decode appends are in-place Pallas
row scatters on the flat (P*page, F) pool view. The page *allocator* is
host-side (engine); all device code is functional.

Round 2: composes with TP (kv-head-sharded pools), DP (per-data-shard pools
+ ShardedPageAllocator), EP, speculation, chunked and context-parallel
prefill, and int4/int8 KV quantization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .kvcache import _dequant_kv, _dequant_kv4, _flat, _quant_kv, _quant_kv4


def _quant_side(cache, x, which: str):
    """Quantize (…, Kh, D) rows for the K or V side of a paged cache —
    int8, or packed int4 with the sub-block scale count the scale pool
    declares (2 rows/head since the round-4 half-scale gate)."""
    bits = cache.bits if which == "k" else cache.vbits
    if bits != 4:
        return _quant_kv(x)
    sc = cache.k_scale if which == "k" else cache.v_scale
    kh = (cache.k_pool.shape[-1] // cache.head_width)
    nh = sc.shape[1] // kh if sc is not None else 1
    return _quant_kv4(x, nh=max(nh, 1))


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedLayerKVCache:
    k_pool: jnp.ndarray                  # (P, page, Kh*D) flat
    v_pool: jnp.ndarray
    k_scale: Optional[jnp.ndarray]       # (P, Kh|2Kh, page) | None
    v_scale: Optional[jnp.ndarray]
    table: jnp.ndarray                   # (B, max_pages) int32
    head_width: int = 1                  # STORED per-head K width (D, or D/2
                                         # nibble-packed when bits == 4)
    bits: int = 8                        # K store: 8 | 4 (packed half-split)
    #: V store bits when different from K (0 = same): the "k8v4" mixed mode
    #: (int8 K + packed int4 V, the quality-gated int4-class default —
    #: round-4 KV gate, docs/benchmarks.md) on the paged layout. int4 sides
    #: carry TWO sub-block scales per head (rows 2*head+half), same as the
    #: contiguous layout since round 4.
    v_bits: int = 0

    def tree_flatten(self):
        return ((self.k_pool, self.v_pool, self.k_scale, self.v_scale,
                 self.table), (self.head_width, self.bits, self.v_bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, head_width=aux[0], bits=aux[1],
                   v_bits=aux[2] if len(aux) > 2 else 0)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def vbits(self) -> int:
        return self.v_bits or self.bits

    @property
    def v_width(self) -> int:
        """Stored per-head width of the V pool."""
        d = self.head_width * 2 if self.bits == 4 else self.head_width
        return d // 2 if self.vbits == 4 else d

    @property
    def page_size(self) -> int:
        return self.k_pool.shape[1]

    @property
    def num_slots(self) -> int:
        return self.table.shape[0]

    @property
    def max_seq(self) -> int:
        return self.table.shape[1] * self.page_size

    def _view4(self, arr, width: Optional[int] = None):
        w = width or self.head_width
        return arr.reshape(arr.shape[:-1] + (arr.shape[-1] // w, w))


def init_paged_cache(
    num_layers: int,
    batch_slots: int,
    max_seq: int,
    num_kv_heads: int,
    head_dim: int,
    *,
    page_size: int = 128,
    total_pages: Optional[int] = None,
    dtype=jnp.bfloat16,
    kv_cache_dtype: str = "bf16",
) -> Tuple[PagedLayerKVCache, ...]:
    """Pool-backed caches. total_pages defaults to full reservation
    (B * max_seq / page); size it smaller for memory-oversubscribed serving.
    Page id 0 is a reserved scratch page (unallocated table entries point at
    it); the allocator never hands it out."""
    if max_seq % page_size:
        raise ValueError(f"max_seq {max_seq} % page_size {page_size} != 0")
    max_pages = max_seq // page_size
    pages = total_pages or (batch_slots * max_pages + 1)
    f = num_kv_heads * head_dim
    shape = (pages, page_size, f)
    sshape = (pages, num_kv_heads, page_size)
    caches = []
    for _ in range(num_layers):
        # each layer owns a distinct table buffer: the whole cache tuple is
        # donated per step, and a shared buffer cannot be donated twice
        table = jnp.zeros((batch_slots, max_pages), dtype=jnp.int32)
        sshape2 = (pages, 2 * num_kv_heads, page_size)
        if kv_cache_dtype == "int8":
            caches.append(PagedLayerKVCache(
                k_pool=jnp.zeros(shape, dtype=jnp.int8),
                v_pool=jnp.zeros(shape, dtype=jnp.int8),
                k_scale=jnp.zeros(sshape, dtype=jnp.float32),
                v_scale=jnp.zeros(sshape, dtype=jnp.float32),
                table=table, head_width=head_dim,
            ))
        elif kv_cache_dtype == "int4":
            if head_dim % 2:
                raise ValueError("int4 KV needs an even head_dim")
            # TWO sub-block scales per head for both sides — the one-scale
            # int4 layout fails the trained-weights Δppl gate (round 4);
            # paged now matches the contiguous half-scale layout
            caches.append(PagedLayerKVCache(
                k_pool=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                v_pool=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                k_scale=jnp.zeros(sshape2, dtype=jnp.float32),
                v_scale=jnp.zeros(sshape2, dtype=jnp.float32),
                table=table, head_width=head_dim // 2, bits=4,
            ))
        elif kv_cache_dtype == "k8v4":
            if head_dim % 2:
                raise ValueError("k8v4 KV needs an even head_dim")
            caches.append(PagedLayerKVCache(
                k_pool=jnp.zeros(shape, dtype=jnp.int8),
                v_pool=jnp.zeros(shape[:2] + (f // 2,), dtype=jnp.int8),
                k_scale=jnp.zeros(sshape, dtype=jnp.float32),
                v_scale=jnp.zeros(sshape2, dtype=jnp.float32),
                table=table, head_width=head_dim, bits=8, v_bits=4,
            ))
        else:
            caches.append(PagedLayerKVCache(
                k_pool=jnp.zeros(shape, dtype=dtype),
                v_pool=jnp.zeros(shape, dtype=dtype),
                k_scale=None, v_scale=None, table=table,
                head_width=head_dim,
            ))
    return tuple(caches)


def write_prompt(cache: PagedLayerKVCache, k_new: jnp.ndarray,
                 v_new: jnp.ndarray, slot) -> PagedLayerKVCache:
    """Write a padded prompt (S_pad, Kh, D) into `slot`'s pages."""
    return write_chunk(cache, k_new, v_new, slot, 0)


def write_chunk(cache: PagedLayerKVCache, k_new: jnp.ndarray,
                v_new: jnp.ndarray, slot, start) -> PagedLayerKVCache:
    """Write a prefill chunk (C, Kh, D) at positions start..start+C for
    `slot`. C must be a multiple of page_size OR start page-aligned with the
    tail padded (engine guarantees page-aligned chunk sizes)."""
    ps = cache.page_size
    c = k_new.shape[0]
    n_pages = -(-c // ps)
    pad = n_pages * ps - c
    if pad:
        k_new = jnp.pad(k_new, ((0, pad), (0, 0), (0, 0)))
        v_new = jnp.pad(v_new, ((0, pad), (0, 0), (0, 0)))
    first_page = start // ps     # start is page-aligned (engine invariant)
    page_ids = jax.lax.dynamic_slice(
        cache.table, (slot, first_page), (1, n_pages))[0]

    def scatter(pool, vals):
        vals = vals.reshape(n_pages, ps, vals.shape[-1]).astype(pool.dtype)
        return pool.at[page_ids].set(vals)

    def scatter_scale(pool, vals):     # (C, K) -> (n_pages, K, ps)
        vals = vals.reshape(n_pages, ps, vals.shape[-1])
        return pool.at[page_ids].set(jnp.swapaxes(vals, 1, 2))

    if cache.quantized:
        qk, sk = _quant_side(cache, k_new, "k")
        qv, sv = _quant_side(cache, v_new, "v")
        return PagedLayerKVCache(
            k_pool=scatter(cache.k_pool, qk),
            v_pool=scatter(cache.v_pool, qv),
            k_scale=scatter_scale(cache.k_scale, sk),
            v_scale=scatter_scale(cache.v_scale, sv),
            table=cache.table, head_width=cache.head_width,
            bits=cache.bits, v_bits=cache.v_bits)
    return PagedLayerKVCache(
        k_pool=scatter(cache.k_pool, _flat(k_new)),
        v_pool=scatter(cache.v_pool, _flat(v_new)),
        k_scale=None, v_scale=None, table=cache.table,
        head_width=cache.head_width)


def _row_ids(cache: PagedLayerKVCache, positions: jnp.ndarray) -> jnp.ndarray:
    """positions (B,) or (B, T) -> absolute row index into the (P*page, F)
    flat pool view. Out-of-range positions redirect into the reserved
    scratch page 0; those rewrites are content-preserving so concurrent
    redirected slots racing on page-0 tile groups are benign."""
    ps = cache.page_size
    if positions.ndim == 1:
        slots = jnp.arange(positions.shape[0])
        in_range = positions < cache.max_seq
        vpage = jnp.where(in_range, positions // ps, 0)
        page_ids = jnp.where(in_range, cache.table[slots, vpage], 0)
    else:
        slots = jnp.arange(positions.shape[0])[:, None]
        in_range = positions < cache.max_seq
        vpage = jnp.where(in_range, positions // ps, 0)
        page_ids = jnp.where(in_range, cache.table[slots, vpage], 0)
    # invalid rows land in page 0 (never read); validity is enforced by the
    # kernel writing the old content back
    return jnp.where(in_range, page_ids * ps + positions % ps, 0), in_range


def _append(cache: PagedLayerKVCache, k_new, v_new, positions
            ) -> PagedLayerKVCache:
    """Shared append body (one or T tokens per slot): Pallas in-place row
    scatter into the flat pool view on TPU (see kvcache._scatter_rows_cache
    for why), jnp scatter elsewhere."""
    rows, valid = _row_ids(cache, positions)
    use_pallas = (jax.default_backend() == "tpu"
                  and cache.page_size % 8 == 0)
    ps = cache.page_size
    if cache.quantized:
        qk, sk = _quant_side(cache, k_new, "k")
        qv, sv = _quant_side(cache, v_new, "v")
        vals = [(cache.k_pool, qk), (cache.v_pool, qv)]
        scals = [(cache.k_scale, sk), (cache.v_scale, sv)]
    else:
        vals = [(cache.k_pool, _flat(k_new).astype(cache.k_pool.dtype)),
                (cache.v_pool, _flat(v_new).astype(cache.v_pool.dtype))]
        scals = []
    if use_pallas:
        from ..ops.pallas.kv_append import scatter_pool_rows
        outs = scatter_pool_rows(
            [a for a, _ in vals], [r for _, r in vals],
            [a for a, _ in scals], [r for _, r in scals], rows, valid)
    else:
        pid, off = rows // ps, rows % ps
        outs = [pool.at[pid, off].set(
                    jnp.where(valid[..., None], r.astype(pool.dtype),
                              pool[pid, off]))
                for pool, r in vals]
        outs += [pool.at[pid, :, off].set(
                    jnp.where(valid[..., None], r.astype(pool.dtype),
                              pool[pid, :, off]))
                 for pool, r in scals]
    if cache.quantized:
        return PagedLayerKVCache(k_pool=outs[0], v_pool=outs[1],
                                 k_scale=outs[2], v_scale=outs[3],
                                 table=cache.table,
                                 head_width=cache.head_width,
                                 bits=cache.bits, v_bits=cache.v_bits)
    return PagedLayerKVCache(k_pool=outs[0], v_pool=outs[1],
                             k_scale=None, v_scale=None, table=cache.table,
                             head_width=cache.head_width, bits=cache.bits)


def append_token(cache: PagedLayerKVCache, k_new: jnp.ndarray,
                 v_new: jnp.ndarray, positions: jnp.ndarray
                 ) -> PagedLayerKVCache:
    """Append one token per slot at its position. k_new/v_new: (B, Kh, D)."""
    return _append(cache, k_new, v_new, positions)


def append_tokens(cache: PagedLayerKVCache, k_new: jnp.ndarray,
                  v_new: jnp.ndarray, positions: jnp.ndarray
                  ) -> PagedLayerKVCache:
    """Write T tokens per slot (speculative verification window).
    k_new/v_new: (B, T, Kh, D); positions: (B, T).

    The engine reserves the speculative margin at admission, so in-range
    positions always map to allocated pages; positions >= max_seq redirect
    to the reserved scratch page 0 (never read)."""
    return _append(cache, k_new, v_new, positions)


def _gather(pool, table_slice):
    """(P, page, F) gathered by (B, W_pages) -> (B, W_pages*page, F)."""
    b, wp = table_slice.shape
    g = jnp.take(pool, table_slice.reshape(-1), axis=0)
    g = g.reshape(b, wp * pool.shape[1], *pool.shape[2:])
    return g


def _gather_scale_hm(pool, table_slice):
    """(P, Kh, page) gathered by (B, W_pages) -> HEAD-major (B, Kh, W)."""
    b, wp = table_slice.shape
    g = jnp.take(pool, table_slice.reshape(-1), axis=0)   # (B*wp, Kh, page)
    g = jnp.swapaxes(g.reshape(b, wp, *pool.shape[1:]), 1, 2)
    return g.reshape(b, pool.shape[1], wp * pool.shape[2])


def _gather_scale(pool, table_slice):
    """(P, Kh, page) gathered by (B, W_pages) -> (B, W_pages*page, Kh, 1)."""
    b, wp = table_slice.shape
    g = jnp.take(pool, table_slice.reshape(-1), axis=0)   # (B*wp, Kh, page)
    g = jnp.swapaxes(g.reshape(b, wp, *pool.shape[1:]), 2, 3)
    return g.reshape(b, wp * pool.shape[2], pool.shape[1])[..., None]


def _unpack_last(packed):
    """Nibble-packed (…, D/2) int8 -> sign-extended f32 (…, D) half-split."""
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _dequant_gathered(cache, pool, scale_pool, tab, which, dtype):
    """Gather a pool through the table and dequantize one side (int8,
    packed int4 with 1 or 2 sub-block scales/head, or mixed k8v4)."""
    bits = cache.bits if which == "k" else cache.vbits
    width = cache.head_width if which == "k" else cache.v_width
    x4 = cache._view4(_gather(pool, tab), width)          # (B, W, Kh, w)
    sc = _gather_scale_hm(scale_pool, tab)                # (B, rows, W)
    if bits == 4:
        return _dequant_kv4(x4, sc, dtype)
    return _dequant_kv(x4, sc, dtype)


def read(cache: PagedLayerKVCache, dtype=jnp.bfloat16,
         window: Optional[int] = None):
    """Materialize the virtual (B, W, Kh, D) K/V view (XLA fuses the page
    gather into the consumer)."""
    ps = cache.page_size
    wp = cache.table.shape[1] if window is None else -(-window // ps)
    tab = cache.table[:, :wp]
    if cache.quantized:
        return (_dequant_gathered(cache, cache.k_pool, cache.k_scale, tab,
                                  "k", dtype),
                _dequant_gathered(cache, cache.v_pool, cache.v_scale, tab,
                                  "v", dtype))
    return (cache._view4(_gather(cache.k_pool, tab)).astype(dtype),
            cache._view4(_gather(cache.v_pool, tab)).astype(dtype))


def slot_view(cache: PagedLayerKVCache, slot, dtype=jnp.bfloat16,
              window: Optional[int] = None):
    """One slot's virtual K/V (1, W, Kh, D) — chunked-prefill attention."""
    ps = cache.page_size
    wp = cache.table.shape[1] if window is None else -(-window // ps)
    tab = jax.lax.dynamic_slice(cache.table, (slot, 0), (1, wp))
    if cache.quantized:
        return (_dequant_gathered(cache, cache.k_pool, cache.k_scale, tab,
                                  "k", dtype),
                _dequant_gathered(cache, cache.v_pool, cache.v_scale, tab,
                                  "v", dtype))
    return (cache._view4(_gather(cache.k_pool, tab)).astype(dtype),
            cache._view4(_gather(cache.v_pool, tab)).astype(dtype))


def with_table(caches: Tuple[PagedLayerKVCache, ...],
               table: jnp.ndarray) -> Tuple[PagedLayerKVCache, ...]:
    """Replace the (host-updated) page table in every layer's cache — one
    distinct device buffer per layer (donation cannot alias)."""
    import numpy as _np
    host = _np.asarray(table)
    return tuple(PagedLayerKVCache(
        k_pool=c.k_pool, v_pool=c.v_pool, k_scale=c.k_scale,
        v_scale=c.v_scale, table=jnp.asarray(host.copy()),
        head_width=c.head_width, bits=c.bits, v_bits=c.v_bits)
        for c in caches)


class PageAllocator:
    """Host-side free-list allocator. Page 0 is reserved (the zero page every
    unallocated table entry points to)."""

    def __init__(self, total_pages: int, batch_slots: int, max_pages: int):
        self.free = list(range(total_pages - 1, 0, -1))     # stack; excludes 0
        self.per_slot = [[] for _ in range(batch_slots)]
        self.max_pages = max_pages

    @property
    def free_pages(self) -> int:
        return len(self.free)

    def ensure(self, table_host, slot: int, upto_len: int, page_size: int
               ) -> bool:
        """Allocate pages so `slot` can hold upto_len tokens; updates
        table_host in place. Returns False when the pool is exhausted."""
        need = -(-upto_len // page_size)
        have = len(self.per_slot[slot])
        while have < need:
            if not self.free:
                return False
            page = self.free.pop()
            table_host[slot, have] = page
            self.per_slot[slot].append(page)
            have += 1
        return True

    def release(self, table_host, slot: int) -> None:
        for page in self.per_slot[slot]:
            self.free.append(page)
        self.per_slot[slot] = []
        table_host[slot, :] = 0


class _SlotRouter:
    """Routes `alloc.per_slot[slot]`-style reads to the owning shard's inner
    allocator (inner allocators are full-width in slots, so global slot
    indices pass straight through)."""

    def __init__(self, sharded: "ShardedPageAllocator", attr: str):
        self._s = sharded
        self._attr = attr

    def __getitem__(self, slot: int):
        return getattr(self._s._alloc_for(slot), self._attr)[slot]


class ShardedPageAllocator:
    """Per-data-shard page pools behind the single-pool allocator interface
    (VERDICT round 1 item 2: paged KV x data parallelism).

    The global pool array is (D * pages_per_shard, page, F), sharded over
    the data axis; shard d's rows are [d*pps, (d+1)*pps). Page ids handed
    out are shard-LOCAL (each inner allocator spans [1, pps); local row 0 is
    that shard's reserved scratch page), and the page table is data-sharded
    by slot rows — so inside shard_map every shard indexes its local pool
    with its local table, no translation needed anywhere on device."""

    def __init__(self, alloc_cls, pages_per_shard: int, batch_slots: int,
                 max_pages: int, n_shards: int):
        if batch_slots % n_shards:
            raise ValueError(
                f"batch_slots {batch_slots} not divisible by data shards "
                f"{n_shards}")
        self.n_shards = n_shards
        self.pages_per_shard = pages_per_shard
        self.slots_per_shard = batch_slots // n_shards
        self.max_pages = max_pages
        self.inner = [alloc_cls(pages_per_shard, batch_slots, max_pages)
                      for _ in range(n_shards)]
        self.per_slot = _SlotRouter(self, "per_slot")
        if hasattr(self.inner[0], "shared_per_slot"):
            self.shared_per_slot = _SlotRouter(self, "shared_per_slot")

    def _alloc_for(self, slot: int):
        return self.inner[slot // self.slots_per_shard]

    @property
    def free_pages(self) -> int:
        return sum(a.free_pages for a in self.inner)

    def ensure(self, table_host, slot: int, upto_len: int, page_size: int
               ) -> bool:
        return self._alloc_for(slot).ensure(table_host, slot, upto_len,
                                            page_size)

    def release(self, table_host, slot: int) -> None:
        self._alloc_for(slot).release(table_host, slot)

    # prefix-caching surface (present when inner is PrefixCachingAllocator;
    # sharing is shard-local — pages cannot cross pools)
    def match_prefix(self, table_host, slot: int, prompt, page_size: int
                     ) -> int:
        return self._alloc_for(slot).match_prefix(table_host, slot, prompt,
                                                  page_size)

    def register_prefix(self, slot: int, prompt, page_size: int) -> None:
        self._alloc_for(slot).register_prefix(slot, prompt, page_size)

    @property
    def hits(self) -> int:
        return sum(a.hits for a in self.inner)

    @property
    def hit_tokens(self) -> int:
        return sum(a.hit_tokens for a in self.inner)

    @property
    def cached_pages(self) -> int:
        return sum(a.cached_pages for a in self.inner)


class PrefixCachingAllocator(PageAllocator):
    """PageAllocator with page-granular prompt-prefix sharing.

    A page that holds a FULL page of prompt tokens is registered under the
    exact byte-key of the whole token prefix up to and including that page
    (no hash collisions). Later prompts that share the prefix map the same
    physical pages into their tables (refcounted) and skip prefilling them.
    Unreferenced cached pages stay resident and are evicted LRU only when
    the free list runs dry — cache capacity costs nothing until pressure.

    New capability beyond the reference (and beyond round-1): the standard
    shared-system-prompt serving optimization (vLLM-style automatic prefix
    caching, expressed over this pool).
    """

    def __init__(self, total_pages: int, batch_slots: int, max_pages: int):
        super().__init__(total_pages, batch_slots, max_pages)
        self.refcount = {}                  # page_id -> int
        self.by_key = {}                    # prefix bytes -> page_id
        self.key_of = {}                    # page_id -> prefix bytes
        self.lru = []                       # unreferenced cached pages, LRU
        self.shared_per_slot = [[] for _ in range(batch_slots)]
        self.hits = 0
        self.hit_tokens = 0

    @property
    def cached_pages(self) -> int:
        return len(self.by_key)

    def _take_free(self):
        if self.free:
            return self.free.pop()
        if self.lru:                        # evict oldest unreferenced page
            page = self.lru.pop(0)
            key = self.key_of.pop(page)
            del self.by_key[key]
            return page
        return None

    def ensure(self, table_host, slot: int, upto_len: int, page_size: int
               ) -> bool:
        """Like PageAllocator.ensure but draws from free + evictable pages."""
        need = -(-upto_len // page_size)
        base = len(self.shared_per_slot[slot])
        have = base + len(self.per_slot[slot])
        while have < need:
            page = self._take_free()
            if page is None:
                return False
            table_host[slot, have] = page
            self.per_slot[slot].append(page)
            have += 1
        return True

    def match_prefix(self, table_host, slot: int, prompt, page_size: int
                     ) -> int:
        """Map shared pages for the longest cached full-page prefix of
        `prompt` into `slot`'s table. Returns the number of matched TOKENS
        (a multiple of page_size, capped at len(prompt)-1 so at least one
        suffix token remains to produce first-token logits)."""
        import numpy as np
        n = len(prompt)
        max_full = (n - 1) // page_size
        ids = np.asarray(prompt, dtype=np.int32)
        matched = 0
        for i in range(max_full):
            key = ids[:(i + 1) * page_size].tobytes()
            page = self.by_key.get(key)
            if page is None:
                break
            table_host[slot, i] = page
            self.shared_per_slot[slot].append(page)
            self.refcount[page] = self.refcount.get(page, 0) + 1
            if page in self.lru:
                self.lru.remove(page)
            matched = (i + 1) * page_size
        if matched:
            self.hits += 1
            self.hit_tokens += matched
        return matched

    def register_prefix(self, slot: int, prompt, page_size: int) -> None:
        """After the slot's prompt is fully prefilled, publish its private
        full-prompt pages into the cache so later prompts can share them."""
        import numpy as np
        n = len(prompt)
        base = len(self.shared_per_slot[slot])
        max_full = (n - 1) // page_size
        ids = np.asarray(prompt, dtype=np.int32)
        # table-position -> page mapping, snapshotted BEFORE the loop mutates
        # per_slot (removing while indexing registered the wrong pages)
        combined = list(self.shared_per_slot[slot]) + list(self.per_slot[slot])
        for i in range(base, max_full):
            if i >= len(combined):
                break
            page = combined[i]
            key = ids[:(i + 1) * page_size].tobytes()
            if key in self.by_key:
                continue
            self.by_key[key] = page
            self.key_of[page] = key
            self.refcount[page] = self.refcount.get(page, 0) + 1
            # ownership moves from the slot to the cache: on release the
            # refcount drops and the page becomes evictable, not free
            self.per_slot[slot].remove(page)
            self.shared_per_slot[slot].append(page)

    def release(self, table_host, slot: int) -> None:
        for page in self.shared_per_slot[slot]:
            self.refcount[page] -= 1
            if self.refcount[page] == 0:
                del self.refcount[page]
                if page in self.key_of:
                    self.lru.append(page)   # cached, evictable
                else:
                    self.free.append(page)
        self.shared_per_slot[slot] = []
        super().release(table_host, slot)
