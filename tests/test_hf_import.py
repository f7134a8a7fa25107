"""HF checkpoint import tests with synthetic state dicts (the reference's
format loaders were stubs — pytorch_loader.cpp:22-31; ours must actually
work; no network here, so state dicts are constructed to HF's exact naming
and layout conventions)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.models import hf_import
from deeppowers_tpu.models.transformer import forward_prefill


def _gpt2_state(cfg):
    """HF GPT-2 layout: Conv1D weights stored (in, out); fused c_attn."""
    rng = np.random.default_rng(0)
    h = cfg["n_embd"]
    s = {}
    s["wte.weight"] = rng.standard_normal((cfg["vocab_size"], h)).astype(np.float32) * 0.02
    s["wpe.weight"] = rng.standard_normal((cfg["n_positions"], h)).astype(np.float32) * 0.02
    s["ln_f.weight"] = np.ones(h, np.float32)
    s["ln_f.bias"] = np.zeros(h, np.float32)
    for i in range(cfg["n_layer"]):
        p = f"h.{i}."
        s[p + "ln_1.weight"] = np.ones(h, np.float32)
        s[p + "ln_1.bias"] = np.zeros(h, np.float32)
        s[p + "ln_2.weight"] = np.ones(h, np.float32)
        s[p + "ln_2.bias"] = np.zeros(h, np.float32)
        s[p + "attn.c_attn.weight"] = rng.standard_normal((h, 3 * h)).astype(np.float32) * 0.02
        s[p + "attn.c_attn.bias"] = np.zeros(3 * h, np.float32)
        s[p + "attn.c_proj.weight"] = rng.standard_normal((h, h)).astype(np.float32) * 0.02
        s[p + "attn.c_proj.bias"] = np.zeros(h, np.float32)
        s[p + "mlp.c_fc.weight"] = rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.02
        s[p + "mlp.c_fc.bias"] = np.zeros(4 * h, np.float32)
        s[p + "mlp.c_proj.weight"] = rng.standard_normal((4 * h, h)).astype(np.float32) * 0.02
        s[p + "mlp.c_proj.bias"] = np.zeros(h, np.float32)
    return s


def _llama_state(cfg):
    """HF Llama layout: nn.Linear weights stored (out, in)."""
    rng = np.random.default_rng(1)
    h = cfg["hidden_size"]
    kv = cfg["num_key_value_heads"] * (h // cfg["num_attention_heads"])
    inter = cfg["intermediate_size"]
    s = {}
    s["model.embed_tokens.weight"] = rng.standard_normal(
        (cfg["vocab_size"], h)).astype(np.float32) * 0.02
    s["model.norm.weight"] = np.ones(h, np.float32)
    s["lm_head.weight"] = rng.standard_normal(
        (cfg["vocab_size"], h)).astype(np.float32) * 0.02
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        s[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        s[p + "self_attn.q_proj.weight"] = rng.standard_normal((h, h)).astype(np.float32) * 0.02
        s[p + "self_attn.k_proj.weight"] = rng.standard_normal((kv, h)).astype(np.float32) * 0.02
        s[p + "self_attn.v_proj.weight"] = rng.standard_normal((kv, h)).astype(np.float32) * 0.02
        s[p + "self_attn.o_proj.weight"] = rng.standard_normal((h, h)).astype(np.float32) * 0.02
        s[p + "mlp.gate_proj.weight"] = rng.standard_normal((inter, h)).astype(np.float32) * 0.02
        s[p + "mlp.up_proj.weight"] = rng.standard_normal((inter, h)).astype(np.float32) * 0.02
        s[p + "mlp.down_proj.weight"] = rng.standard_normal((h, inter)).astype(np.float32) * 0.02
    return s


GPT2_CFG = {"model_type": "gpt2", "vocab_size": 96, "n_embd": 32,
            "n_layer": 2, "n_head": 4, "n_positions": 64}
LLAMA_CFG = {"model_type": "llama", "vocab_size": 96, "hidden_size": 32,
             "num_hidden_layers": 2, "num_attention_heads": 4,
             "num_key_value_heads": 2, "intermediate_size": 64,
             "max_position_embeddings": 64, "rms_norm_eps": 1e-6,
             "tie_word_embeddings": False}


def test_gpt2_config_mapping():
    cfg = hf_import.config_from_hf(GPT2_CFG)
    assert cfg.hidden_size == 32 and cfg.norm == "layernorm"
    assert cfg.positions == "learned" and cfg.tie_embeddings


def test_llama_config_mapping():
    cfg = hf_import.config_from_hf(LLAMA_CFG)
    assert cfg.norm == "rmsnorm" and cfg.glu and cfg.positions == "rope"
    assert cfg.kv_heads == 2 and not cfg.tie_embeddings


def test_unknown_model_type_raises():
    with pytest.raises(ValueError):
        hf_import.config_from_hf({"model_type": "rwkv"})


@pytest.mark.parametrize("hf_cfg,maker,mt", [
    (GPT2_CFG, _gpt2_state, "gpt2"),
    (LLAMA_CFG, _llama_state, "llama"),
])
def test_state_dict_conversion_runs(hf_cfg, maker, mt):
    cfg = hf_import.config_from_hf(hf_cfg)
    state = {hf_import._strip(k): v for k, v in maker(hf_cfg).items()}
    params = hf_import.params_from_state_dict(state, cfg, mt,
                                              dtype=jnp.float32)
    ids = jnp.asarray([[1, 2, 3, 4]])
    logits, _ = forward_prefill(params, cfg, ids, jnp.asarray([4]),
                                dtype=jnp.float32)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gpt2_qkv_split_orientation():
    """The fused c_attn (H, 3H) must split into our wq/wk/wv (H, H) with
    matching columns."""
    hf_cfg = GPT2_CFG
    cfg = hf_import.config_from_hf(hf_cfg)
    state = {hf_import._strip(k): v for k, v in _gpt2_state(hf_cfg).items()}
    params = hf_import.params_from_state_dict(state, cfg, "gpt2",
                                              dtype=jnp.float32)
    h = hf_cfg["n_embd"]
    fused = state["h.0.attn.c_attn.weight"]
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["attn"]["wq"]["w"]), fused[:, :h])
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["attn"]["wv"]["w"]), fused[:, 2 * h:])


def test_llama_transpose_orientation():
    """HF Linear (out, in) -> ours (in, out)."""
    cfg = hf_import.config_from_hf(LLAMA_CFG)
    state = {hf_import._strip(k): v for k, v in _llama_state(LLAMA_CFG).items()}
    params = hf_import.params_from_state_dict(state, cfg, "llama",
                                              dtype=jnp.float32)
    ref = state["layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["attn"]["wq"]["w"]), ref.T)


def test_full_checkpoint_dir(tmp_path):
    """End-to-end: write config.json + safetensors, load via load_checkpoint."""
    safetensors = pytest.importorskip("safetensors.numpy")
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(LLAMA_CFG))
    safetensors.save_file(_llama_state(LLAMA_CFG),
                          str(d / "model.safetensors"))
    cfg, params = hf_import.load_checkpoint(str(d), dtype=jnp.float32)
    logits, _ = forward_prefill(params, cfg, jnp.asarray([[5, 6]]),
                                jnp.asarray([2]), dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
