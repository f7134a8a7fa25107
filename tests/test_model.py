"""Transformer model tests: shapes, prefill/decode consistency, quantization.

The prefill-vs-decode agreement test is the core correctness check: decoding
token-by-token with the KV cache must reproduce the full-sequence forward
(the reference never achieved this — its KV cache was allocated but unused,
reference: src/core/inference/inference_engine.cpp:60-92, SURVEY.md §3.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import QuantConfig, QuantMode
from deeppowers_tpu.models.presets import (
    tiny_llama_config,
    tiny_moe_config,
    tiny_test_config,
)
from deeppowers_tpu.models.transformer import (
    forward_decode,
    forward_prefill,
    init_params,
    param_nbytes,
    quantize_params,
)
from deeppowers_tpu.quant.qtypes import QuantizedTensor
from deeppowers_tpu.runtime import kvcache


CONFIGS = {
    "gpt2": tiny_test_config,
    "llama": tiny_llama_config,
    "moe": tiny_moe_config,
}


def make(name, dtype=jnp.float32, **overrides):
    cfg = CONFIGS[name](**overrides)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    return cfg, params


@pytest.mark.parametrize("name", ["gpt2", "llama", "moe"])
def test_prefill_shapes(name):
    cfg, params = make(name)
    b, s = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg.vocab_size)
    lengths = jnp.array([16, 9])
    logits, kv = forward_prefill(params, cfg, ids, lengths, dtype=jnp.float32)
    assert logits.shape == (b, s, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert len(kv) == cfg.num_layers
    assert kv[0][0].shape == (b, s, cfg.kv_heads, cfg.dim_head)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.parametrize("name", ["gpt2", "llama", "moe"])
def test_decode_matches_prefill(name):
    """Greedy KV-cache decode logits == full-forward logits at each position."""
    cfg, params = make(name)
    b, s = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size)
    full_len = jnp.full((b,), s)
    ref_logits, _ = forward_prefill(params, cfg, ids, full_len, dtype=jnp.float32)

    caches = kvcache.init_cache(cfg.num_layers, b, cfg.max_seq_len,
                                cfg.kv_heads, cfg.dim_head, dtype=jnp.float32)
    lengths = jnp.zeros((b,), dtype=jnp.int32)
    for t in range(s):
        logits, caches = forward_decode(params, cfg, ids[:, t], caches,
                                        lengths, dtype=jnp.float32)
        lengths = lengths + 1
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits[:, t]),
            rtol=2e-4, atol=2e-4,
            err_msg=f"{name}: decode step {t} diverges from prefill")


def test_prefill_length_mask_isolates_padding():
    """Changing tokens in the padded region must not change valid logits."""
    cfg, params = make("llama")
    b, s = 1, 16
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0, cfg.vocab_size)
    lengths = jnp.array([10])
    logits1, _ = forward_prefill(params, cfg, ids, lengths, dtype=jnp.float32)
    ids2 = ids.at[:, 10:].set(7)
    logits2, _ = forward_prefill(params, cfg, ids2, lengths, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits1[:, :10]),
                               np.asarray(logits2[:, :10]), rtol=1e-5, atol=1e-5)


def test_int8_kv_cache_close_to_fp():
    cfg, params = make("llama")
    b, s = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(4), (b, s), 0, cfg.vocab_size)
    ref_logits, _ = forward_prefill(params, cfg, ids, jnp.full((b,), s),
                                    dtype=jnp.float32)
    caches = kvcache.init_cache(cfg.num_layers, b, cfg.max_seq_len,
                                cfg.kv_heads, cfg.dim_head,
                                kv_cache_dtype="int8")
    lengths = jnp.zeros((b,), dtype=jnp.int32)
    for t in range(s):
        logits, caches = forward_decode(params, cfg, ids[:, t], caches,
                                        lengths, dtype=jnp.float32)
        lengths = lengths + 1
    # int8 KV introduces small noise; argmax and coarse values must agree.
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits[:, -1]),
                               rtol=0.1, atol=0.1)
    assert np.array_equal(np.argmax(np.asarray(logits), -1),
                          np.argmax(np.asarray(ref_logits[:, -1]), -1))


class TestQuantizeParams:
    def test_int8_shrinks_model(self):
        cfg, params = make("llama", dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        assert param_nbytes(q) < 0.45 * param_nbytes(params)

    def test_int4_smaller_than_int8(self):
        cfg, params = make("llama", dtype=jnp.float32)
        q8 = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        q4 = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                                 group_size=32))
        assert param_nbytes(q4) < param_nbytes(q8)

    def test_quantized_forward_close(self):
        cfg, params = make("gpt2", dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        b, s = 1, 8
        ids = jax.random.randint(jax.random.PRNGKey(5), (b, s), 0, cfg.vocab_size)
        lengths = jnp.full((b,), s)
        ref, _ = forward_prefill(params, cfg, ids, lengths, dtype=jnp.float32)
        out, _ = forward_prefill(q, cfg, ids, lengths, dtype=jnp.float32)
        # Tiny random model: logits near zero; compare coarsely.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=0.05)

    def test_mixed_precision(self):
        # reference: tests/test_quantization.cpp:208-229 — per-layer-kind map.
        cfg, params = make("llama", dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(
            mode=QuantMode.MIXED, group_size=32,
            layer_overrides={"attention": "int8", "mlp": "int4"}))
        layer = q["layers"][0]
        assert isinstance(layer["attn"]["wq"]["w"], QuantizedTensor)
        assert layer["attn"]["wq"]["w"].bits == 8
        assert isinstance(layer["mlp"]["w_in"]["w"], QuantizedTensor)
        assert layer["mlp"]["w_in"]["w"].bits == 4
        # embeddings untouched
        assert not isinstance(q["embedding"], QuantizedTensor)

    def test_skip_layers(self):
        cfg, params = make("gpt2", dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(
            mode=QuantMode.INT8, skip_layers=("attn",)))
        layer = q["layers"][0]
        assert not isinstance(layer["attn"]["wq"]["w"], QuantizedTensor)
        assert isinstance(layer["mlp"]["w_in"]["w"], QuantizedTensor)

    def test_moe_experts_quantized(self):
        cfg, params = make("moe", dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        experts = q["layers"][0]["moe"]["experts"]
        assert isinstance(experts["w_in"]["w"], QuantizedTensor)
        # stacked: one quantization per expert slice
        assert experts["w_in"]["w"].shape[0] == cfg.num_experts


def test_moe_cat_fusion_exact():
    """Cat-fused quantized experts (fuse_params fuse_moe) — the 2-matmul
    MoE path — produce the same logits as the stacked per-expert path
    (pure integer relayout, same codes + scales)."""
    import dataclasses
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import (forward_prefill,
                                                   fuse_params, init_params,
                                                   quantize_params)

    cfg = tiny_moe_config(vocab_size=64, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    lens = jnp.asarray([8], jnp.int32)
    ref, _ = forward_prefill(qp, cfg, ids, lens, dtype=jnp.float32)

    fused = fuse_params(qp, cfg, fuse_moe=True)
    assert "experts_cat" in fused["layers"][0]["moe"]
    out, _ = forward_prefill(fused, cfg, ids, lens, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_moe_cat_fusion_w4a8():
    """Same relayout under W4A8 (act_bits flag rides through the cat)."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import (forward_prefill,
                                                   fuse_params, init_params,
                                                   quantize_params)

    cfg = tiny_moe_config(vocab_size=64, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32, act_bits=8))
    fused = fuse_params(qp, cfg, fuse_moe=True)
    cat = fused["layers"][0]["moe"]["experts_cat"]
    assert cat["w_gu"]["w"].act_bits == 8
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    out, _ = forward_prefill(fused, cfg, ids, jnp.asarray([8], jnp.int32),
                             dtype=jnp.float32)
    ref, _ = forward_prefill(qp, cfg, ids, jnp.asarray([8], jnp.int32),
                             dtype=jnp.float32)
    # W4A8 quantizes activations per (row, K-block); the cat changes block
    # BOUNDARIES (K = E*I vs per-expert I), so outputs agree to activation-
    # quantization noise, not bit-exactly (the W4A16 cat above IS exact)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_moe_cat_long_prefill():
    """Regression: cat-fused params at >= _MOE_GROUPED_MIN_TOKENS used to
    route to _moe_grouped, which expects the stacked 'experts' layout
    (KeyError); the cat path now serves every token count."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import (
        _MOE_GROUPED_MIN_TOKENS, forward_prefill, fuse_params, init_params,
        quantize_params)

    cfg = tiny_moe_config(vocab_size=64, max_seq_len=512)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    fused = fuse_params(qp, cfg, fuse_moe=True)
    s = _MOE_GROUPED_MIN_TOKENS + 32          # forces the long-prefill arm
    ids = jnp.ones((1, s), jnp.int32)
    out, _ = forward_prefill(fused, cfg, ids, jnp.asarray([s], jnp.int32),
                             dtype=jnp.float32)
    ref, _ = forward_prefill(qp, cfg, ids, jnp.asarray([s], jnp.int32),
                             dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_moe_mixed_precision_experts_fall_back():
    """Regression (round-3 review): skip_layers leaving w_out unquantized
    while w_in/w_gate are quantized crashed the quantized-MoE fast path
    (dataclasses.replace on a raw array); mixed-precision experts now take
    the dequantize-einsum path."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import (forward_prefill,
                                                   init_params,
                                                   quantize_params)

    cfg = tiny_moe_config(vocab_size=64, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32,
                                             skip_layers=("w_out",)))
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out, _ = forward_prefill(qp, cfg, ids, jnp.asarray([4], jnp.int32),
                             dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
