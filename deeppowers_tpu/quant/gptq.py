"""GPTQ: second-order (Hessian-compensated) weight quantization.

Round-to-nearest int4 failed the Δppl ≤ 0.1 gate on real trained weights
(docs/benchmarks.md "Δppl gate on TRAINED weights": g128 RTN +0.164, +AWQ
+0.130) — per-element rounding ignores how errors propagate through the
layer's input correlations. GPTQ (Frantar et al., 2022; PAPERS.md) quantizes
the K (input) rows of each weight matrix in order, and after each row
redistributes its quantization error onto the not-yet-quantized rows via
the inverse Hessian H^-1 = (X^T X + λI)^-1 of that layer's calibration
inputs, minimizing ||XW - XQ||² rather than ||W - Q||².

Layout notes (this repo): weights are (K, N) with y = x @ W, so the GPTQ
recursion runs over ROWS k (the input dim), and per-group scales (g | K)
are recomputed from the *current, error-compensated* residual rows as the
walk enters each group. Output is the standard QuantizedTensor (half-split
int4 nibble packing, (K/g, N) f32 scales) — the Pallas dequant-matmul and
W4A8 paths consume GPTQ checkpoints unchanged.

The quantization error acceptance spec the reference left as a TODO is
tests/test_quantization.cpp:70-94; the measured gate lives in
scripts/eval_ppl.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantConfig, QuantMode
from ..models import transformer as tf
from ..models.transformer import TransformerConfig
from ..ops.attention import attention_prefill
from ..ops.rotary import apply_rope
from .qtypes import QuantizedTensor
from .quantize import pack_int4


def _qmax(bits: int) -> int:
    return (1 << (bits - 1)) - 1


def gptq_matrix(w: np.ndarray, xtx: np.ndarray, *, bits: int,
                group_size: int = 0, percdamp: float = 0.01
                ) -> QuantizedTensor:
    """Quantize one (K, N) matrix against its input second moments (K, K)."""
    w = np.array(w, dtype=np.float32)           # working copy (compensated)
    k_dim, n = w.shape
    qmax = _qmax(bits)
    g = group_size if (group_size and k_dim % group_size == 0) else 0
    n_groups = (k_dim // g) if g else 1

    H = np.array(xtx, dtype=np.float64)
    dead = np.diag(H) <= 0
    H[dead, dead] = 1.0
    w[dead, :] = 0.0
    damp = percdamp * float(np.mean(np.diag(H)))
    H[np.arange(k_dim), np.arange(k_dim)] += damp
    # upper-triangular U with H^-1 = U^T U; U[k, k:] drives the row-k update
    Hi = np.linalg.inv(H)
    U = np.linalg.cholesky(Hi).T.astype(np.float32)

    q_codes = np.zeros((k_dim, n), dtype=np.int8)
    scales = np.zeros((n_groups, n), dtype=np.float32)
    for k in range(k_dim):
        if g:
            gi = k // g
            if k % g == 0:
                # scale from the CURRENT residual rows of this group — they
                # already absorbed earlier rows' errors
                absmax = np.abs(w[k:k + g]).max(axis=0)
                scales[gi] = np.maximum(absmax, 1e-10) / qmax
            s = scales[gi]
        else:
            if k == 0:
                absmax = np.abs(w).max(axis=0)
                scales[0] = np.maximum(absmax, 1e-10) / qmax
            s = scales[0]
        q = np.clip(np.round(w[k] / s), -qmax - 1, qmax)
        q_codes[k] = q.astype(np.int8)
        err = (w[k] - q * s) / U[k, k]
        if k + 1 < k_dim:
            w[k + 1:] -= np.outer(U[k, k + 1:], err)

    data = (np.asarray(pack_int4(jnp.asarray(q_codes)))
            if bits == 4 else q_codes)
    return QuantizedTensor(
        data=jnp.asarray(data), scales=jnp.asarray(scales),
        zero_points=None, bits=bits, group_size=g)


def collect_xtx(params: Any, cfg: TransformerConfig,
                sample_ids: Sequence[Sequence[int]],
                *, dtype=jnp.float32) -> List[Dict[str, np.ndarray]]:
    """Per-layer input second moments X^T X for every quantized matmul.

    Returns [{"qkv","wo","mlp_in","mlp_out"} per layer] + a final
    {"lm_head"} entry. Keys match the weight groups sharing an input:
    wq/wk/wv share xn, w_in/w_gate share xn2."""
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
    valid = (jnp.arange(pad_to)[None, :] < lengths[:, None])[..., None]
    x = tf._embed(params, cfg, input_ids, positions, dtype)

    def xtx_of(t) -> np.ndarray:
        t = jnp.where(valid, t, 0.0).astype(jnp.float32)
        flat = t.reshape(-1, t.shape[-1])
        return np.asarray(flat.T @ flat, np.float32)

    stats: List[Dict[str, np.ndarray]] = []
    for layer in params["layers"]:
        ap = layer["attn"]
        st: Dict[str, np.ndarray] = {}
        xn = tf._norm(x, layer["ln1"], cfg)
        st["qkv"] = xtx_of(xn)
        q, k, v = tf._qkv(xn, ap, cfg)
        if cfg.positions == "rope":
            q = apply_rope(q, positions, theta=cfg.rope_theta)
            k = apply_rope(k, positions, theta=cfg.rope_theta)
        attn = attention_prefill(q, k, v, lengths=lengths, use_flash=False)
        attn = attn.reshape(b, pad_to, cfg.q_size)
        st["wo"] = xtx_of(attn)
        x = x + tf._dense(attn, ap["wo"])
        xn2 = tf._norm(x, layer["ln2"], cfg)
        st["mlp_in"] = xtx_of(xn2)
        if "mlp" in layer and cfg.glu and "w_gate" in layer["mlp"]:
            mlp = layer["mlp"]
            up = tf._dense(xn2, mlp["w_in"])
            gate = tf._act(tf._dense(xn2, mlp["w_gate"]), cfg)
            inter = gate * up
            st["mlp_out"] = xtx_of(inter)
            x = x + tf._dense(inter, mlp["w_out"])
        elif "moe" in layer:
            # Per-EXPERT Hessians, routing-weight weighted: expert e only
            # ever sees its routed tokens, so its quantization objective is
            # || X_e W_e - X_e Q_e || over those rows (weights from the
            # router's top-k softmax; unrouted rows weigh zero).
            moe = layer["moe"]
            xf = jnp.where(valid, xn2, 0.0).astype(jnp.float32)
            xf = xf.reshape(-1, xf.shape[-1])                    # (T, H)
            logits_r = xf @ np.asarray(moe["router"]["w"], np.float32)
            kk = cfg.num_experts_per_tok
            top_vals, top_idx = jax.lax.top_k(jnp.asarray(logits_r), kk)
            top_w = jax.nn.softmax(top_vals, axis=-1)
            t_rows = xf.shape[0]
            wts = np.zeros((t_rows, cfg.num_experts), np.float32)
            np.add.at(wts, (np.arange(t_rows)[:, None], np.asarray(top_idx)),
                      np.asarray(top_w))
            xf_np = np.asarray(xf, np.float32)
            w_in = np.asarray(moe["experts"]["w_in"]["w"], np.float32)
            w_gate = np.asarray(moe["experts"]["w_gate"]["w"], np.float32)
            h_in, h_out = [], []
            for e_i in range(cfg.num_experts):
                we = wts[:, e_i:e_i + 1]                          # (T, 1)
                xw = xf_np * we
                h_in.append(xf_np.T @ xw)                         # (H, H)
                up_e = xf_np @ w_in[e_i]
                gate_e = np.asarray(tf._act(jnp.asarray(xf_np @ w_gate[e_i]),
                                            cfg), np.float32)
                inter_e = gate_e * up_e                           # (T, I)
                h_out.append(inter_e.T @ (inter_e * we))
            st["moe_in"] = np.stack(h_in)                         # (E, H, H)
            st["moe_out"] = np.stack(h_out)                       # (E, I, I)
            x = x + tf._ffn(xn2, layer, cfg)
        else:
            if "mlp" in layer and "w_in" in layer.get("mlp", {}):
                mlp = layer["mlp"]
                inter = tf._act(tf._dense(xn2, mlp["w_in"]), cfg)
                st["mlp_out"] = xtx_of(inter)
            x = x + tf._ffn(xn2, layer, cfg)
        stats.append(st)
    final: Dict[str, np.ndarray] = {}
    if "lm_head" in params:
        xf = tf._norm(x, params["final_norm"], cfg) \
            if "final_norm" in params else x
        final["lm_head"] = xtx_of(xf)
    stats.append(final)
    return stats


_KEY_BY_NAME = {"wq": "qkv", "wk": "qkv", "wv": "qkv", "wo": "wo",
                "w_in": "mlp_in", "w_gate": "mlp_in", "w_out": "mlp_out"}


def gptq_quantize(params: Any, cfg: TransformerConfig,
                  sample_ids: Sequence[Sequence[int]],
                  qcfg: QuantConfig, *, percdamp: float = 0.01,
                  smooth: bool = False) -> Any:
    """quantize_params with GPTQ error compensation on every dense matrix
    whose calibration input is observable (attention + MLP projections +
    lm_head). MoE expert stacks and anything else fall back to RTN via
    quantize_params semantics. With smooth=True, AWQ 4-edge smoothing runs
    first and the Hessians are collected on the smoothed model."""
    from ..models.transformer import quantize_params

    if qcfg.mode not in (QuantMode.INT8, QuantMode.INT4):
        raise ValueError(
            f"gptq_quantize supports INT8/INT4, not {qcfg.mode.value!r} "
            "(per-layer MIXED calibrated quantization goes through "
            "method='awq' — api.apply_quantization routes it there)")
    if smooth:
        from .smooth import collect_awq_stats, smooth_params_ex
        aw_stats = collect_awq_stats(params, cfg, sample_ids)
        params, _ = smooth_params_ex(params, cfg, aw_stats)

    bits = {QuantMode.INT8: 8, QuantMode.INT4: 4}[qcfg.mode]
    stats = collect_xtx(params, cfg, sample_ids)
    layer_stats, final_stats = stats[:-1], stats[-1]

    def q_stacked(w3, hessians):
        """GPTQ each expert slice against its routed-token Hessian."""
        import dataclasses as _dc
        slices = [gptq_matrix(np.asarray(w3[e], np.float32), hessians[e],
                              bits=bits, group_size=qcfg.group_size,
                              percdamp=percdamp)
                  for e in range(w3.shape[0])]
        qt = QuantizedTensor(
            data=jnp.stack([s.data for s in slices]),
            scales=jnp.stack([s.scales for s in slices]),
            zero_points=None, bits=bits, group_size=slices[0].group_size)
        if qcfg.act_bits == 8:
            qt = _dc.replace(qt, act_bits=8)
        return qt

    out = dict(params)
    out["layers"] = []
    for layer, st in zip(params["layers"], layer_stats):
        new_layer = {}
        for part_name, part in layer.items():
            if not isinstance(part, dict):
                new_layer[part_name] = part
                continue
            if part_name == "moe" and "moe_in" in st:
                # MoE: router against the shared input Hessian; each expert
                # against its own routed-token Hessian (BASELINE config 5 —
                # Mixtral int4 EP — gets the same error compensation as the
                # dense path)
                moe = dict(part)
                r = dict(part["router"])
                rw = np.asarray(r["w"], np.float32)
                if not (bits == 4 and rw.shape[0] % 2):
                    import dataclasses as _dc
                    rq = gptq_matrix(rw, st["mlp_in"], bits=bits,
                                     group_size=qcfg.group_size,
                                     percdamp=percdamp)
                    if qcfg.act_bits == 8:
                        rq = _dc.replace(rq, act_bits=8)
                    r["w"] = rq
                moe["router"] = r
                ex = dict(part["experts"])
                for name, hess in (("w_in", st["moe_in"]),
                                   ("w_gate", st["moe_in"]),
                                   ("w_out", st["moe_out"])):
                    node = dict(ex[name])
                    w3 = node["w"]
                    if bits == 4 and w3.shape[1] % 2:
                        continue
                    node["w"] = q_stacked(w3, hess)
                    ex[name] = node
                moe["experts"] = ex
                new_layer[part_name] = moe
                continue
            new_part = {}
            for name, node in part.items():
                key = _KEY_BY_NAME.get(name)
                if (key is not None and key in st and isinstance(node, dict)
                        and "w" in node and hasattr(node["w"], "ndim")
                        and node["w"].ndim == 2):
                    w = np.asarray(node["w"], np.float32)
                    if bits == 4 and w.shape[0] % 2:
                        new_part[name] = node
                        continue
                    qt = gptq_matrix(w, st[key], bits=bits,
                                     group_size=qcfg.group_size,
                                     percdamp=percdamp)
                    if qcfg.act_bits == 8 and qt.zero_points is None:
                        import dataclasses as _dc
                        qt = _dc.replace(qt, act_bits=8)
                    nn = dict(node)
                    nn["w"] = qt
                    new_part[name] = nn
                else:
                    new_part[name] = node
            new_layer[part_name] = new_part
        out["layers"].append(new_layer)

    if "lm_head" in params and "lm_head" in final_stats:
        node = params["lm_head"]
        if isinstance(node, dict) and "w" in node \
                and getattr(node["w"], "ndim", 0) == 2:
            qt = gptq_matrix(np.asarray(node["w"], np.float32),
                             final_stats["lm_head"], bits=bits,
                             group_size=qcfg.group_size, percdamp=percdamp)
            if qcfg.act_bits == 8 and qt.zero_points is None:
                import dataclasses as _dc
                qt = _dc.replace(qt, act_bits=8)
            nn = dict(node)
            nn["w"] = qt
            out["lm_head"] = nn

    # anything not GPTQ'd above (MoE stacks, odd-K) still quantizes RTN so
    # the model is uniformly quantized
    rtn = quantize_params(out, qcfg)
    return rtn
