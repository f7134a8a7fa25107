"""Activation-aware weight smoothing (AWQ/SmoothQuant-lite) for low-bit
quantization.

Low-bit weight quantization loses most of its accuracy to a few input
channels with outsized activations (AWQ's observation; PAPERS.md lists the
QServe/AWQ line). The fix: per-input-channel scales s_j — divide the
activation path by s_j and multiply weight rows by s_j, which is exact in
fp and concentrates quantization resolution where activations are large:

    y = (x / s) @ (diag(s) W)

For pre-norm transformers the division folds for free into the preceding
RMSNorm/LayerNorm weight (and bias), so runtime cost is zero. Applied to the
norm->qkv and norm->mlp-in edges (the wo / w_out edges have no free folding
point and stay plain).

Calibration: per-channel activation absmax of each norm output, collected by
a layer-by-layer instrumented forward over sample prompts.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..models import transformer as tf
from ..models.transformer import TransformerConfig
from ..ops.attention import attention_prefill
from ..ops.rotary import apply_rope


def collect_norm_stats(params: Any, cfg: TransformerConfig,
                       sample_ids: Sequence[Sequence[int]],
                       *, dtype=jnp.float32) -> List[Dict[str, np.ndarray]]:
    """Per-layer per-channel absmax of ln1/ln2 outputs over sample prompts.

    Returns [{"ln1": (H,), "ln2": (H,)} per layer].
    """
    pad_to = max(len(s) for s in sample_ids)
    b = len(sample_ids)
    ids = np.zeros((b, pad_to), dtype=np.int32)
    lens = np.zeros((b,), dtype=np.int32)
    for i, s in enumerate(sample_ids):
        ids[i, :len(s)] = s
        lens[i] = len(s)
    input_ids = jnp.asarray(ids)
    lengths = jnp.asarray(lens)

    positions = jnp.broadcast_to(jnp.arange(pad_to), (b, pad_to))
    valid = (jnp.arange(pad_to)[None, :] < lengths[:, None])[..., None]
    x = tf._embed(params, cfg, input_ids, positions, dtype)

    stats: List[Dict[str, np.ndarray]] = []
    for layer in params["layers"]:
        ap = layer["attn"]
        xn = tf._norm(x, layer["ln1"], cfg)
        ln1_max = jnp.max(jnp.abs(jnp.where(valid, xn, 0.0)), axis=(0, 1))
        q, k, v = tf._qkv(xn, ap, cfg)
        if cfg.positions == "rope":
            q = apply_rope(q, positions, theta=cfg.rope_theta)
            k = apply_rope(k, positions, theta=cfg.rope_theta)
        attn = attention_prefill(q, k, v, lengths=lengths, use_flash=False)
        attn = attn.reshape(b, pad_to, cfg.q_size)
        x = x + tf._dense(attn, ap["wo"])
        xn2 = tf._norm(x, layer["ln2"], cfg)
        ln2_max = jnp.max(jnp.abs(jnp.where(valid, xn2, 0.0)), axis=(0, 1))
        x = x + tf._ffn(xn2, layer, cfg)
        stats.append({"ln1": np.asarray(ln1_max, dtype=np.float32),
                      "ln2": np.asarray(ln2_max, dtype=np.float32)})
    return stats


def _smooth_scales(act_absmax: np.ndarray, w_absmax: np.ndarray,
                   alpha: float) -> jnp.ndarray:
    """AWQ-style balance: s_j = act^alpha / w^(1-alpha), clipped for
    stability."""
    act = np.maximum(act_absmax, 1e-5)
    w = np.maximum(w_absmax, 1e-5)
    s = act ** alpha / w ** (1 - alpha)
    s = s / np.sqrt(s.max() * s.min())   # center in log space
    return jnp.asarray(np.clip(s, 1e-3, 1e3), dtype=jnp.float32)


def smooth_params(params: Any, cfg: TransformerConfig,
                  stats: List[Dict[str, np.ndarray]],
                  *, alpha: float = 0.5) -> Any:
    """Fold smoothing scales into norm weights and the following projections.

    Exact in fp: model(smooth(params)) == model(params). Quantizing the
    smoothed weights afterwards (quantize_params) gives the accuracy win.
    Requires unfused projections (apply before engine fusion).
    """
    out = dict(params)
    out["layers"] = []
    for layer, st in zip(params["layers"], stats):
        layer = dict(layer)
        ap = dict(layer["attn"])
        if "wqkv" in ap:
            raise ValueError("smooth_params must run before fuse_params")

        # ln1 -> wq/wk/wv
        w_absmax = np.maximum.reduce([
            np.abs(np.asarray(ap[k]["w"], dtype=np.float32)).max(axis=1)
            for k in ("wq", "wk", "wv")])
        s1 = _smooth_scales(st["ln1"], w_absmax, alpha)
        ln1 = dict(layer["ln1"])
        ln1["w"] = (layer["ln1"]["w"].astype(jnp.float32) / s1).astype(
            layer["ln1"]["w"].dtype)
        if "b" in ln1:
            ln1["b"] = (layer["ln1"]["b"].astype(jnp.float32) / s1).astype(
                layer["ln1"]["b"].dtype)
        for key in ("wq", "wk", "wv"):
            d = dict(ap[key])
            d["w"] = (ap[key]["w"].astype(jnp.float32)
                      * s1[:, None]).astype(ap[key]["w"].dtype)
            ap[key] = d
        layer["ln1"] = ln1
        layer["attn"] = ap

        # ln2 -> w_in (+w_gate)
        if "mlp" in layer:
            mlp = dict(layer["mlp"])
            keys = [k for k in ("w_in", "w_gate") if k in mlp]
            w_absmax = np.maximum.reduce([
                np.abs(np.asarray(mlp[k]["w"], dtype=np.float32)).max(axis=1)
                for k in keys])
            s2 = _smooth_scales(st["ln2"], w_absmax, alpha)
            ln2 = dict(layer["ln2"])
            ln2["w"] = (layer["ln2"]["w"].astype(jnp.float32) / s2).astype(
                layer["ln2"]["w"].dtype)
            if "b" in ln2:
                ln2["b"] = (layer["ln2"]["b"].astype(jnp.float32) / s2).astype(
                    layer["ln2"]["b"].dtype)
            for key in keys:
                d = dict(mlp[key])
                d["w"] = (mlp[key]["w"].astype(jnp.float32)
                          * s2[:, None]).astype(mlp[key]["w"].dtype)
                mlp[key] = d
            layer["ln2"] = ln2
            layer["mlp"] = mlp
        out["layers"].append(layer)
    return out


def smooth_quantize(params: Any, cfg: TransformerConfig,
                    sample_ids: Sequence[Sequence[int]], qcfg,
                    *, alpha: float = 0.5) -> Any:
    """Calibrate -> smooth -> quantize in one call."""
    from ..models.transformer import quantize_params
    stats = collect_norm_stats(params, cfg, sample_ids)
    smoothed = smooth_params(params, cfg, stats, alpha=alpha)
    return quantize_params(smoothed, qcfg)
