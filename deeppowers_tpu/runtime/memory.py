"""HBM budgeting and capacity planning.

Replaces the reference's memory pools + GPU-memory-pressure handling
(reference: src/core/memory/memory_pool.* chunked device pool;
gpt_model.cpp:508-545 — <20% free triggers KV compression; scheduler
ResourceConstraints min_free_mem 1GB) the TPU way: XLA owns allocation, so
the framework's job is *planning* — estimate footprints up front, pick the
largest safe batch-slot count, and choose the KV dtype — rather than
reacting to OOM mid-flight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax

from ..models.transformer import TransformerConfig, param_nbytes


@dataclass
class MemoryPlan:
    hbm_bytes: int
    param_bytes: int
    kv_bytes_per_slot: int
    activation_bytes: int
    max_slots: int
    kv_cache_dtype: str
    headroom_bytes: int

    def summary(self) -> dict:
        gb = 1 << 30
        return {
            "hbm_gb": round(self.hbm_bytes / gb, 2),
            "params_gb": round(self.param_bytes / gb, 2),
            "kv_per_slot_mb": round(self.kv_bytes_per_slot / (1 << 20), 1),
            "max_slots": self.max_slots,
            "kv_cache_dtype": self.kv_cache_dtype,
            "headroom_gb": round(self.headroom_bytes / gb, 2),
        }


def device_hbm_bytes(device: Optional[jax.Device] = None) -> int:
    """Total HBM of the target device; falls back to 16 GiB (v5e) when the
    runtime doesn't report it."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * (1 << 30)


def kv_bytes_per_slot(cfg: TransformerConfig, max_seq: int,
                      kv_cache_dtype: str = "bf16") -> int:
    per_tok = cfg.num_layers * cfg.kv_heads * cfg.dim_head * 2  # K and V
    if kv_cache_dtype == "int8":
        return max_seq * per_tok * 1 + max_seq * cfg.num_layers * \
            cfg.kv_heads * 2 * 4     # + f32 scales per (pos, head)
    return max_seq * per_tok * 2     # bf16


def plan(params: Any, cfg: TransformerConfig, *, max_seq: int,
         kv_cache_dtype: str = "bf16", want_slots: int = 32,
         hbm_bytes: Optional[int] = None,
         reserve_fraction: float = 0.15) -> MemoryPlan:
    """Pick the largest slot count <= want_slots that fits with headroom.

    reserve_fraction mirrors the reference's <20%-free pressure threshold
    (gpt_model.cpp:508-530): we simply never plan into that zone.
    """
    hbm = hbm_bytes or device_hbm_bytes()
    p_bytes = param_nbytes(params)
    kv_slot = kv_bytes_per_slot(cfg, max_seq, kv_cache_dtype)
    # rough activation envelope: logits (B, V) f32 x2 + hidden few MB
    act_per_slot = cfg.vocab_size * 4 * 3 + cfg.hidden_size * 4 * 64
    budget = int(hbm * (1 - reserve_fraction)) - p_bytes
    slots = max(0, min(want_slots, budget // max(kv_slot + act_per_slot, 1)))
    used = p_bytes + slots * (kv_slot + act_per_slot)
    return MemoryPlan(
        hbm_bytes=hbm,
        param_bytes=p_bytes,
        kv_bytes_per_slot=kv_slot,
        activation_bytes=slots * act_per_slot,
        max_slots=int(slots),
        kv_cache_dtype=kv_cache_dtype,
        headroom_bytes=hbm - used,
    )


def plan_or_shrink(params: Any, cfg: TransformerConfig, *, max_seq: int,
                   want_slots: int = 32,
                   hbm_bytes: Optional[int] = None) -> MemoryPlan:
    """Planning cascade: bf16 KV at want_slots -> int8 KV (the reference's
    compress_kv_cache response) -> fewer slots."""
    p = plan(params, cfg, max_seq=max_seq, kv_cache_dtype="bf16",
             want_slots=want_slots, hbm_bytes=hbm_bytes)
    if p.max_slots >= want_slots:
        return p
    p8 = plan(params, cfg, max_seq=max_seq, kv_cache_dtype="int8",
              want_slots=want_slots, hbm_bytes=hbm_bytes)
    return p8 if p8.max_slots > p.max_slots else p
