"""Import HuggingFace checkpoints into the params pytree.

Replaces the reference's placeholder format loaders (reference:
src/core/model/pytorch_loader.cpp:22-31, onnx_loader.cpp, tensorflow_loader.cpp
— all stubs returning empty shells) with working safetensors / torch
state-dict conversion for the supported families.

Sources accepted:
- a directory with HF `*.safetensors` (+ config.json)
- a HF `transformers` model object already in memory
- a raw state dict (numpy / torch tensors)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from .transformer import TransformerConfig

__all__ = ["load_checkpoint", "config_from_hf", "params_from_state_dict"]


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _read_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a directory (no torch needed)."""
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise ImportError("safetensors package required for this path") from e
    state = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".safetensors"):
            continue
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    if not state:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    return state


def config_from_hf(hf_cfg: Mapping[str, Any]) -> TransformerConfig:
    """Map an HF config.json dict to TransformerConfig."""
    mt = hf_cfg.get("model_type", "")
    if mt == "gpt2":
        return TransformerConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["n_embd"],
            num_layers=hf_cfg["n_layer"],
            num_heads=hf_cfg["n_head"],
            max_seq_len=hf_cfg.get("n_positions", 1024),
            norm="layernorm", activation="gelu", positions="learned",
            norm_eps=hf_cfg.get("layer_norm_epsilon", 1e-5),
            qkv_bias=True, attn_out_bias=True, mlp_bias=True,
            tie_embeddings=True,
        )
    if mt == "qwen2":
        # Llama-family geometry + biases on q/k/v only (Qwen2/Qwen2.5)
        return TransformerConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=hf_cfg["num_attention_heads"],
            num_kv_heads=hf_cfg.get("num_key_value_heads", 0),
            intermediate_size=hf_cfg["intermediate_size"],
            max_seq_len=hf_cfg.get("max_position_embeddings", 32768),
            norm="rmsnorm", activation="silu", glu=True, positions="rope",
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
            rope_theta=hf_cfg.get("rope_theta", 1e6),
            qkv_bias=True, attn_out_bias=False, mlp_bias=False,
            tie_embeddings=hf_cfg.get("tie_word_embeddings", False),
        )
    if mt in ("llama", "mistral"):
        return TransformerConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=hf_cfg["num_attention_heads"],
            num_kv_heads=hf_cfg.get("num_key_value_heads", 0),
            intermediate_size=hf_cfg["intermediate_size"],
            max_seq_len=hf_cfg.get("max_position_embeddings", 4096),
            norm="rmsnorm", activation="silu", glu=True, positions="rope",
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            qkv_bias=False, attn_out_bias=False, mlp_bias=False,
            tie_embeddings=hf_cfg.get("tie_word_embeddings", False),
        )
    if mt == "mixtral":
        return TransformerConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=hf_cfg["num_attention_heads"],
            num_kv_heads=hf_cfg.get("num_key_value_heads", 0),
            intermediate_size=hf_cfg["intermediate_size"],
            max_seq_len=hf_cfg.get("max_position_embeddings", 4096),
            norm="rmsnorm", activation="silu", glu=True, positions="rope",
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
            rope_theta=hf_cfg.get("rope_theta", 1e6),
            qkv_bias=False, attn_out_bias=False, mlp_bias=False,
            tie_embeddings=False,
            num_experts=hf_cfg.get("num_local_experts", 8),
            num_experts_per_tok=hf_cfg.get("num_experts_per_tok", 2),
        )
    raise ValueError(f"unsupported HF model_type: {mt!r}")


def params_from_state_dict(
    state: Mapping[str, Any],
    cfg: TransformerConfig,
    model_type: str,
    dtype=jnp.bfloat16,
):
    """Convert an HF state dict to the transformer params pytree."""
    if model_type == "gpt2":
        return _convert_gpt2(state, cfg, dtype)
    if model_type in ("llama", "mistral", "qwen2"):
        return _convert_llama(state, cfg, dtype)
    if model_type == "mixtral":
        return _convert_mixtral(state, cfg, dtype)
    raise ValueError(f"unsupported model_type: {model_type!r}")


def _get(state, *names) -> np.ndarray:
    for n in names:
        if n in state:
            return _to_np(state[n])
        # allow prefixes used by HF ("transformer.", "model.")
        for p in ("transformer.", "model."):
            if p + n in state:
                return _to_np(state[p + n])
    raise KeyError(f"none of {names} in checkpoint (have {len(state)} keys)")


def _convert_gpt2(state, cfg: TransformerConfig, dtype):
    """GPT-2: HF stores Conv1D weights as (in, out) already — no transpose.
    Fused c_attn (H, 3H) splits into wq/wk/wv."""
    j = lambda a: jnp.asarray(a, dtype=dtype)
    params = {
        "embedding": j(_get(state, "wte.weight")),
        "pos_embedding": j(_get(state, "wpe.weight")),
        "final_norm": {"w": j(_get(state, "ln_f.weight")),
                       "b": j(_get(state, "ln_f.bias"))},
        "layers": [],
    }
    h = cfg.hidden_size
    for i in range(cfg.num_layers):
        p = f"h.{i}."
        c_attn_w = _get(state, p + "attn.c_attn.weight")     # (H, 3H)
        c_attn_b = _get(state, p + "attn.c_attn.bias")       # (3H,)
        wq, wk, wv = np.split(c_attn_w, 3, axis=1)
        bq, bk, bv = np.split(c_attn_b, 3)
        params["layers"].append({
            "ln1": {"w": j(_get(state, p + "ln_1.weight")),
                    "b": j(_get(state, p + "ln_1.bias"))},
            "ln2": {"w": j(_get(state, p + "ln_2.weight")),
                    "b": j(_get(state, p + "ln_2.bias"))},
            "attn": {
                "wq": {"w": j(wq), "b": j(bq)},
                "wk": {"w": j(wk), "b": j(bk)},
                "wv": {"w": j(wv), "b": j(bv)},
                "wo": {"w": j(_get(state, p + "attn.c_proj.weight")),
                       "b": j(_get(state, p + "attn.c_proj.bias"))},
            },
            "mlp": {
                "w_in": {"w": j(_get(state, p + "mlp.c_fc.weight")),
                         "b": j(_get(state, p + "mlp.c_fc.bias"))},
                "w_out": {"w": j(_get(state, p + "mlp.c_proj.weight")),
                          "b": j(_get(state, p + "mlp.c_proj.bias"))},
            },
        })
    return params


def _convert_llama(state, cfg: TransformerConfig, dtype):
    """Llama/Mistral/TinyLlama/Qwen2: HF nn.Linear weights are (out, in) —
    transpose to our (in, out). Projection biases (Qwen2's q/k/v) are picked
    up when present in the state dict."""
    j = lambda a: jnp.asarray(a, dtype=dtype)
    jt = lambda a: jnp.asarray(np.ascontiguousarray(a.T), dtype=dtype)

    def dense(prefix):
        d = {"w": jt(_get(state, prefix + ".weight"))}
        for cand in (prefix + ".bias", "model." + prefix + ".bias",
                     "transformer." + prefix + ".bias"):
            if cand in state:
                d["b"] = j(_to_np(state[cand]))
                break
        return d

    params = {
        "embedding": j(_get(state, "embed_tokens.weight")),
        "final_norm": {"w": j(_get(state, "norm.weight"))},
        "layers": [],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": jt(_get(state, "lm_head.weight"))}
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        params["layers"].append({
            "ln1": {"w": j(_get(state, p + "input_layernorm.weight"))},
            "ln2": {"w": j(_get(state, p + "post_attention_layernorm.weight"))},
            "attn": {
                "wq": dense(p + "self_attn.q_proj"),
                "wk": dense(p + "self_attn.k_proj"),
                "wv": dense(p + "self_attn.v_proj"),
                "wo": dense(p + "self_attn.o_proj"),
            },
            "mlp": {
                "w_gate": dense(p + "mlp.gate_proj"),
                "w_in": dense(p + "mlp.up_proj"),
                "w_out": dense(p + "mlp.down_proj"),
            },
        })
    return params


def _convert_mixtral(state, cfg: TransformerConfig, dtype):
    j = lambda a: jnp.asarray(a, dtype=dtype)
    jt = lambda a: jnp.asarray(np.ascontiguousarray(a.T), dtype=dtype)
    params = {
        "embedding": j(_get(state, "embed_tokens.weight")),
        "final_norm": {"w": j(_get(state, "norm.weight"))},
        "lm_head": {"w": jt(_get(state, "lm_head.weight"))},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        # Stack experts on a leading axis (transformer.py stacked layout).
        gates, outs, ins_ = [], [], []
        for e in range(cfg.num_experts):
            ep = p + f"block_sparse_moe.experts.{e}."
            gates.append(np.ascontiguousarray(_get(state, ep + "w1.weight").T))
            outs.append(np.ascontiguousarray(_get(state, ep + "w2.weight").T))
            ins_.append(np.ascontiguousarray(_get(state, ep + "w3.weight").T))
        experts = {
            "w_gate": {"w": jnp.asarray(np.stack(gates), dtype=dtype)},
            "w_out": {"w": jnp.asarray(np.stack(outs), dtype=dtype)},
            "w_in": {"w": jnp.asarray(np.stack(ins_), dtype=dtype)},
        }
        params["layers"].append({
            "ln1": {"w": j(_get(state, p + "input_layernorm.weight"))},
            "ln2": {"w": j(_get(state, p + "post_attention_layernorm.weight"))},
            "attn": {
                "wq": {"w": jt(_get(state, p + "self_attn.q_proj.weight"))},
                "wk": {"w": jt(_get(state, p + "self_attn.k_proj.weight"))},
                "wv": {"w": jt(_get(state, p + "self_attn.v_proj.weight"))},
                "wo": {"w": jt(_get(state, p + "self_attn.o_proj.weight"))},
            },
            "moe": {
                "router": {"w": jt(_get(state, p + "block_sparse_moe.gate.weight"))},
                "experts": experts,
            },
        })
    return params


def load_checkpoint(path: str, dtype=jnp.bfloat16
                    ) -> Tuple[TransformerConfig, Dict[str, Any]]:
    """Load (config, params) from an HF checkpoint directory."""
    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)
    state = _read_safetensors_dir(path)
    # strip common prefixes
    state = { _strip(k): v for k, v in state.items() }
    params = params_from_state_dict(state, cfg, hf_cfg["model_type"], dtype)
    return cfg, params


def _strip(key: str) -> str:
    for p in ("transformer.", "model."):
        if key.startswith(p):
            return key[len(p):]
    return key
