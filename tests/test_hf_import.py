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


class TestQwen2Import:
    def _synthetic(self):
        rng = np.random.RandomState(0)
        h, kv, heads, inter, vocab, layers = 32, 2, 4, 64, 96, 2
        hd = h // heads
        cfg_json = {
            "model_type": "qwen2", "vocab_size": vocab, "hidden_size": h,
            "num_hidden_layers": layers, "num_attention_heads": heads,
            "num_key_value_heads": kv, "intermediate_size": inter,
            "max_position_embeddings": 128, "rms_norm_eps": 1e-6,
            "rope_theta": 10000.0, "tie_word_embeddings": False,
        }
        st = {"model.embed_tokens.weight": rng.randn(vocab, h).astype("f4"),
              "model.norm.weight": np.ones(h, "f4"),
              "lm_head.weight": rng.randn(vocab, h).astype("f4")}
        for i in range(layers):
            p = f"model.layers.{i}."
            st[p + "input_layernorm.weight"] = np.ones(h, "f4")
            st[p + "post_attention_layernorm.weight"] = np.ones(h, "f4")
            for nm, (o, inn) in (("q_proj", (heads * hd, h)),
                                 ("k_proj", (kv * hd, h)),
                                 ("v_proj", (kv * hd, h)),
                                 ("o_proj", (h, heads * hd))):
                st[p + f"self_attn.{nm}.weight"] = (
                    rng.randn(o, inn).astype("f4") * 0.05)
                if nm != "o_proj":   # Qwen2: biases on q/k/v only
                    st[p + f"self_attn.{nm}.bias"] = (
                        rng.randn(o).astype("f4") * 0.05)
            for nm, (o, inn) in (("gate_proj", (inter, h)),
                                 ("up_proj", (inter, h)),
                                 ("down_proj", (h, inter))):
                st[p + f"mlp.{nm}.weight"] = (
                    rng.randn(o, inn).astype("f4") * 0.05)
        return cfg_json, st

    def test_config_and_params(self):
        from deeppowers_tpu.models.hf_import import (config_from_hf,
                                                     params_from_state_dict)
        cfg_json, st = self._synthetic()
        cfg = config_from_hf(cfg_json)
        assert cfg.qkv_bias and not cfg.attn_out_bias and cfg.glu
        params = params_from_state_dict(st, cfg, "qwen2", jnp.float32)
        a = params["layers"][0]["attn"]
        assert "b" in a["wq"] and "b" in a["wk"] and "b" in a["wv"]
        assert "b" not in a["wo"]
        # bias values carried through (not zeros)
        assert float(jnp.abs(a["wq"]["b"]).sum()) > 0

    def test_generates(self):
        from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
        from deeppowers_tpu.models.hf_import import (config_from_hf,
                                                     params_from_state_dict)
        from deeppowers_tpu.runtime.engine import InferenceEngine
        cfg_json, st = self._synthetic()
        cfg = config_from_hf(cfg_json)
        params = params_from_state_dict(st, cfg, "qwen2", jnp.float32)
        eng = InferenceEngine(params, cfg, runtime=RuntimeConfig(
            max_batch_size=2, max_seq_len=64, prefill_buckets=(16,)),
            act_dtype=jnp.float32)
        res = eng.generate([1, 2, 3], GenerationConfig(max_tokens=6,
                                                       do_sample=False))
        assert len(res.token_ids) == 6
