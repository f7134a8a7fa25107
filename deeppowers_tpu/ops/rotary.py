"""Rotary position embeddings (RoPE).

Replaces the reference's rotary_embedding_kernel (reference:
src/core/execution/models/gpt_kernels.cu:236-280). Uses the Llama/NeoX
half-split convention: the head dim is split into two halves rotated against
each other (matches HF `transformers` llama, so imported weights line up).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_frequencies(head_dim: int, *, theta: float = 10000.0) -> jnp.ndarray:
    """Inverse frequencies, shape (head_dim // 2,), f32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, *,
               theta: float = 10000.0) -> jnp.ndarray:
    """Rotate q or k. x: (..., S, H, D) or (..., S, D); positions: (..., S).

    positions broadcasts against x's sequence axis; computed in f32, returned
    in x.dtype.
    """
    d = x.shape[-1]
    inv_freq = rope_frequencies(d, theta=theta)            # (D/2,)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (..., S, D/2)
    if x.ndim == angles.ndim + 1:                          # (..., S, H, D): add head axis
        angles = angles[..., None, :]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
