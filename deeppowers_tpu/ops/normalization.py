"""LayerNorm / RMSNorm.

Replaces the reference's two-pass shared-memory layer_norm_kernel
(reference: src/core/execution/models/gpt_kernels.cu:21-90) with jnp ops that
XLA fuses into neighbors on the VPU; a Pallas fused variant is unnecessary —
norms are bandwidth-trivial next to the matmuls they precede.

Reductions run in f32 regardless of activation dtype (bf16-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, weight, bias=None, *, eps: float = 1e-5):
    """GPT-2 style LayerNorm over the last axis. x: (..., H)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, weight, *, eps: float = 1e-6):
    """Llama-style RMSNorm over the last axis."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)
