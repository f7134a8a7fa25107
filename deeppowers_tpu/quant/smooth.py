"""Activation-aware weight smoothing (AWQ/SmoothQuant-lite) for low-bit
quantization.

Low-bit weight quantization loses most of its accuracy to a few input
channels with outsized activations (AWQ's observation; PAPERS.md lists the
QServe/AWQ line). The fix: per-input-channel scales s_j — divide the
activation path by s_j and multiply weight rows by s_j, which is exact in
fp and concentrates quantization resolution where activations are large:

    y = (x / s) @ (diag(s) W)

For pre-norm transformers the division folds for free into the preceding
RMSNorm/LayerNorm weight (and bias), so runtime cost is zero. Four edges:

  ln1 -> wq/wk/wv      (fold into the norm weight)
  ln2 -> w_in/w_gate   (fold into the norm weight)
  v   -> wo            (fold into wv's output columns; GQA-constrained so
                        q-heads sharing a kv head share scales — exact)
  up  -> w_out         (GLU models only: fold into w_in's output columns —
                        the gate path is nonlinear and stays untouched)

plus AWQ's second ingredient, per-(group, column) weight CLIP SEARCH:
scan clip ratios of the quantization range and keep, per cell, the ratio
minimizing activation-weighted reconstruction error.

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


# ---------------------------------------------------------------------------
# Full AWQ recipe: 4-edge smoothing + per-(group, column) clip search
# ---------------------------------------------------------------------------

def collect_awq_stats(params: Any, cfg: TransformerConfig,
                      sample_ids: Sequence[Sequence[int]],
                      *, dtype=jnp.float32, max_rows: int = 64
                      ) -> List[Dict[str, np.ndarray]]:
    """Per-layer activation stats for smoothing AND clip search.

    Returns [{"ln1","ln2","wo_in","wout_in": absmax vectors,
              "rows_ln1","rows_wo","rows_ln2","rows_wout": (R, ·) sampled
              activation rows} per layer]. wout_in/rows_wout only for GLU.
    """
    pad_to = max(len(s) for s in sample_ids)
    b = len(sample_ids)
    ids = np.zeros((b, pad_to), dtype=np.int32)
    lens = np.zeros((b,), dtype=np.int32)
    for i, sq in enumerate(sample_ids):
        ids[i, :len(sq)] = sq
        lens[i] = len(sq)
    input_ids = jnp.asarray(ids)
    lengths = jnp.asarray(lens)
    positions = jnp.broadcast_to(jnp.arange(pad_to), (b, pad_to))
    valid2 = jnp.arange(pad_to)[None, :] < lengths[:, None]   # (B, S)
    valid = valid2[..., None]
    x = tf._embed(params, cfg, input_ids, positions, dtype)
    flat_valid = np.asarray(valid2).reshape(-1)
    take = np.nonzero(flat_valid)[0][:max_rows]

    def absmax_rows(t):
        t = jnp.where(valid, t, 0.0)
        amax = np.asarray(jnp.max(jnp.abs(t), axis=(0, 1)), np.float32)
        rows = np.asarray(t.reshape(-1, t.shape[-1]), np.float32)[take]
        return amax, rows

    stats: List[Dict[str, np.ndarray]] = []
    for layer in params["layers"]:
        ap = layer["attn"]
        st: Dict[str, np.ndarray] = {}
        xn = tf._norm(x, layer["ln1"], cfg)
        st["ln1"], st["rows_ln1"] = absmax_rows(xn)
        q, k, v = tf._qkv(xn, ap, cfg)
        if cfg.positions == "rope":
            q = apply_rope(q, positions, theta=cfg.rope_theta)
            k = apply_rope(k, positions, theta=cfg.rope_theta)
        attn = attention_prefill(q, k, v, lengths=lengths, use_flash=False)
        attn = attn.reshape(b, pad_to, cfg.q_size)
        st["wo_in"], st["rows_wo"] = absmax_rows(attn)
        x = x + tf._dense(attn, ap["wo"])
        xn2 = tf._norm(x, layer["ln2"], cfg)
        st["ln2"], st["rows_ln2"] = absmax_rows(xn2)
        if "mlp" in layer and cfg.glu and "w_gate" in layer["mlp"]:
            mlp = layer["mlp"]
            up = tf._dense(xn2, mlp["w_in"])
            gate = tf._act(tf._dense(xn2, mlp["w_gate"]), cfg)
            inter = gate * up
            st["wout_in"], st["rows_wout"] = absmax_rows(inter)
            x = x + tf._dense(inter, mlp["w_out"])
        else:
            x = x + tf._ffn(xn2, layer, cfg)
        stats.append(st)
    return stats


def _fold_dense_cols(node, inv_s):
    """Scale a dense param dict's output columns (and bias) by inv_s."""
    d = dict(node)
    d["w"] = (node["w"].astype(jnp.float32) * inv_s[None, :]).astype(
        node["w"].dtype)
    if "b" in d:
        d["b"] = (node["b"].astype(jnp.float32) * inv_s).astype(
            node["b"].dtype)
    return d


def _fold_dense_rows(node, s):
    d = dict(node)
    d["w"] = (node["w"].astype(jnp.float32) * s[:, None]).astype(
        node["w"].dtype)
    return d


def smooth_params_ex(params: Any, cfg: TransformerConfig,
                     stats: List[Dict[str, np.ndarray]],
                     *, alpha: float = 0.5,
                     extended: bool = True):
    """smooth_params + the wo / w_out edges. Returns (params, per-layer
    smoothing scales {"s1","s2","s_wo","s_out"}) — the scales let the clip
    search divide its sampled activation rows to match the smoothed model.
    Exact in fp (see module docstring for the folding identities)."""
    base = smooth_params(params, cfg, stats, alpha=alpha)
    scales_out: List[Dict[str, np.ndarray]] = []
    # recompute s1/s2 exactly as smooth_params did (cheap, host-side)
    out = dict(base)
    out["layers"] = []
    for layer, raw_layer, st in zip(base["layers"], params["layers"], stats):
        ap = dict(layer["attn"])
        w_absmax = np.maximum.reduce([
            np.abs(np.asarray(raw_layer["attn"][k]["w"], np.float32)).max(axis=1)
            for k in ("wq", "wk", "wv")])
        s1 = np.asarray(_smooth_scales(st["ln1"], w_absmax, alpha))
        sc: Dict[str, np.ndarray] = {"s1": s1}
        if "mlp" in layer:
            keys = [k for k in ("w_in", "w_gate") if k in raw_layer["mlp"]]
            w_absmax = np.maximum.reduce([
                np.abs(np.asarray(raw_layer["mlp"][k]["w"], np.float32)).max(axis=1)
                for k in keys])
            sc["s2"] = np.asarray(_smooth_scales(st["ln2"], w_absmax, alpha))

        if extended and "wo_in" in st:
            # v -> wo: s per wo input channel, constrained so q-heads that
            # share a kv head share scales (exactness under GQA)
            hq, kv, d = cfg.num_heads, cfg.kv_heads, cfg.dim_head
            w_absmax = np.abs(np.asarray(ap["wo"]["w"], np.float32)).max(axis=1)
            s_raw = np.asarray(_smooth_scales(st["wo_in"], w_absmax, alpha))
            rep = hq // kv
            s_kv = np.exp(np.log(s_raw.reshape(kv, rep, d)).mean(axis=1))
            s_exp = np.repeat(s_kv[:, None, :], rep, axis=1).reshape(hq * d)
            ap["wv"] = _fold_dense_cols(ap["wv"], 1.0 / s_kv.reshape(-1))
            ap["wo"] = _fold_dense_rows(ap["wo"], jnp.asarray(s_exp))
            sc["s_wo"] = s_exp
        layer = dict(layer)
        layer["attn"] = ap

        if (extended and "wout_in" in st and "mlp" in layer
                and "w_gate" in layer["mlp"]):
            # up -> w_out (GLU): fold into w_in's output columns
            mlp = dict(layer["mlp"])
            w_absmax = np.abs(np.asarray(mlp["w_out"]["w"], np.float32)).max(axis=1)
            s_out = np.asarray(_smooth_scales(st["wout_in"], w_absmax, alpha))
            mlp["w_in"] = _fold_dense_cols(mlp["w_in"], 1.0 / s_out)
            mlp["w_out"] = _fold_dense_rows(mlp["w_out"], jnp.asarray(s_out))
            layer["mlp"] = mlp
            sc["s_out"] = s_out
        out["layers"].append(layer)
        scales_out.append(sc)
    return out, scales_out


def search_clip_scales(w, x_rows: np.ndarray, *, bits: int, group_size: int,
                       n_grid: int = 10, min_ratio: float = 0.5):
    """AWQ clip search: per-(group, column) quantization scales from the clip
    ratio minimizing activation-weighted reconstruction error.

    w: (K, N) float; x_rows: (R, K) sampled inputs of this matmul (post-
    smoothing). Returns scales shaped like compute_scales' output
    ((G, N) grouped, (1, N) per-channel)."""
    w = np.asarray(w, np.float32)
    k, n = w.shape
    g = group_size if group_size else k
    if k % g:
        g = k
    ng = k // g
    x = np.asarray(x_rows, np.float32)
    qmax = 7 if bits == 4 else 127
    qmin = -qmax - 1
    wg = w.reshape(ng, g, n)
    xg = x.reshape(-1, ng, g).transpose(1, 0, 2)          # (G, R, g)
    absmax = np.maximum(np.abs(wg).max(axis=1), 1e-8)     # (G, N)
    best_err = None
    best_scales = None
    for i in range(n_grid):
        ratio = 1.0 - i * (1.0 - min_ratio) / max(n_grid - 1, 1)
        scales = absmax * ratio / qmax
        q = np.clip(np.round(wg / scales[:, None, :]), qmin, qmax)
        wq = q * scales[:, None, :]
        err = np.einsum("grk,gkn->grn", xg, wq - wg)
        err = np.mean(err * err, axis=1)                  # (G, N)
        if best_err is None:
            best_err, best_scales = err, scales
        else:
            better = err < best_err
            best_err = np.where(better, err, best_err)
            best_scales = np.where(better, scales, best_scales)
    return jnp.asarray(best_scales, dtype=jnp.float32)


def awq_quantize(params: Any, cfg: TransformerConfig,
                 sample_ids: Sequence[Sequence[int]], qcfg,
                 *, alpha: float = 0.5, clip: bool = True,
                 max_rows: int = 64, n_grid: int = 10) -> Any:
    """The full AWQ recipe: calibrate -> 4-edge smoothing -> per-group clip
    search -> quantize. Falls back to plain quantization for weights with no
    collected activations (embeddings, lm_head, MoE experts)."""
    from dataclasses import replace as _dc_replace

    from ..config import QuantMode
    from ..models.transformer import quantize_params
    from .quantize import quantize

    stats = collect_awq_stats(params, cfg, sample_ids, max_rows=max_rows)
    smoothed, sm_scales = smooth_params_ex(params, cfg, stats, alpha=alpha)
    if not clip:
        return quantize_params(smoothed, qcfg)

    bits_of = {QuantMode.INT8: 8, QuantMode.INT4: 4}

    def clip_quantize(node, kind, rows):
        mode = qcfg.mode_for_layer(kind)
        if mode not in bits_of:
            return node
        w = node["w"]
        bits = bits_of[mode]
        kdim = w.shape[0]
        gs = qcfg.group_size if (qcfg.group_size and
                                 kdim % qcfg.group_size == 0) else 0
        if bits == 4 and kdim % 2:
            return node
        scales = search_clip_scales(w, rows, bits=bits, group_size=gs,
                                    n_grid=n_grid)
        qt = quantize(w.astype(jnp.float32), bits=bits, group_size=gs,
                      symmetric=True, scales=scales)
        if qcfg.act_bits == 8:
            qt = _dc_replace(qt, act_bits=8)
        d = dict(node)
        d["w"] = qt
        return d

    out = dict(smoothed)
    out["layers"] = []
    for li, (layer, st, sc) in enumerate(zip(smoothed["layers"], stats,
                                             sm_scales)):
        name = f"layers/{li}"
        if any(frag in name for frag in qcfg.skip_layers):
            out["layers"].append(layer)
            continue
        layer = dict(layer)
        ap = dict(layer["attn"])
        rows1 = st["rows_ln1"] / sc["s1"][None, :]
        for key in ("wq", "wk", "wv"):
            ap[key] = clip_quantize(ap[key], "attention", rows1)
        if "s_wo" in sc:
            rows_wo = st["rows_wo"] / sc["s_wo"][None, :]
            ap["wo"] = clip_quantize(ap["wo"], "attention", rows_wo)
        else:
            ap["wo"] = clip_quantize(ap["wo"], "attention", st["rows_wo"])
        layer["attn"] = ap
        if "mlp" in layer and "s2" in sc:
            mlp = dict(layer["mlp"])
            rows2 = st["rows_ln2"] / sc["s2"][None, :]
            for key in ("w_in", "w_gate"):
                if key in mlp:
                    mlp[key] = clip_quantize(mlp[key], "mlp", rows2)
            if "s_out" in sc:
                rows_out = st["rows_wout"] / sc["s_out"][None, :]
                mlp["w_out"] = clip_quantize(mlp["w_out"], "mlp", rows_out)
            elif "rows_wout" in st:
                mlp["w_out"] = clip_quantize(mlp["w_out"], "mlp",
                                             st["rows_wout"])
            else:
                # non-GLU: no intermediate rows collected; plain quantize
                sub = quantize_params({"layers": [{"mlp": {"w_out": mlp["w_out"]}}]},
                                      qcfg)
                mlp["w_out"] = sub["layers"][0]["mlp"]["w_out"]
            layer["mlp"] = mlp
        out["layers"].append(layer)
    # non-layer weights (lm_head) via the generic path
    if "lm_head" in out:
        sub = quantize_params({"lm_head": out["lm_head"], "layers": []}, qcfg)
        out["lm_head"] = sub["lm_head"]
    return out
