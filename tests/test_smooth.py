"""Activation-aware smoothing tests: fp exactness of the fold, quantized
accuracy improvement on outlier activations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import QuantConfig, QuantMode
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_test_config
from deeppowers_tpu.models.transformer import (
    forward_prefill,
    init_params,
    quantize_params,
)
from deeppowers_tpu.quant.smooth import (
    collect_norm_stats,
    smooth_params,
    smooth_quantize,
)


def _samples(cfg, n=3, ln=12, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, cfg.vocab_size, size=ln).tolist()
            for _ in range(n)]


@pytest.mark.parametrize("maker", [tiny_test_config, tiny_llama_config])
def test_fold_is_exact_in_fp(maker):
    cfg = maker()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    samples = _samples(cfg)
    stats = collect_norm_stats(params, cfg, samples)
    smoothed = smooth_params(params, cfg, stats, alpha=0.5)

    ids = jnp.asarray([samples[0]])
    lens = jnp.asarray([len(samples[0])])
    ref, _ = forward_prefill(params, cfg, ids, lens, dtype=jnp.float32)
    out, _ = forward_prefill(smoothed, cfg, ids, lens, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_smooth_quantize_runs_end_to_end():
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    q = smooth_quantize(params, cfg, _samples(cfg),
                        QuantConfig(mode=QuantMode.INT4, group_size=16))
    ids = jnp.asarray([[1, 2, 3]])
    logits, _ = forward_prefill(q, cfg, ids, jnp.asarray([3]),
                                dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()


def test_smoothing_helps_outlier_activations():
    """Inject an outlier input channel; int4 error after smoothing must not
    exceed plain int4 error (and typically improves substantially)."""
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # outlier activation channel: scale one embedding column hard
    emb = np.array(params["embedding"], dtype=np.float32, copy=True)
    emb[:, 7] *= 50.0
    params["embedding"] = jnp.asarray(emb)

    samples = _samples(cfg, n=4, ln=16)
    ids = jnp.asarray([samples[0]])
    lens = jnp.asarray([len(samples[0])])
    ref, _ = forward_prefill(params, cfg, ids, lens, dtype=jnp.float32)

    qcfg = QuantConfig(mode=QuantMode.INT4)   # per-channel (no groups):
    plain = quantize_params(params, qcfg)     # outliers hurt most here
    smoothed = smooth_quantize(params, cfg, samples, qcfg)

    out_p, _ = forward_prefill(plain, cfg, ids, lens, dtype=jnp.float32)
    out_s, _ = forward_prefill(smoothed, cfg, ids, lens, dtype=jnp.float32)
    err_p = float(jnp.mean((out_p - ref) ** 2))
    err_s = float(jnp.mean((out_s - ref) ** 2))
    assert err_s <= err_p * 1.05, (err_s, err_p)


def test_smooth_requires_unfused():
    from deeppowers_tpu.models.transformer import fuse_params
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    fused = fuse_params(params, cfg)
    stats = collect_norm_stats(params, cfg, _samples(cfg))
    with pytest.raises(ValueError):
        smooth_params(fused, cfg, stats)


class TestAWQFull:
    """4-edge smoothing exactness + clip search behavior."""

    def _setup(self, key=0):
        from deeppowers_tpu.models.presets import tiny_llama_config
        cfg = tiny_llama_config(hidden_size=64, num_heads=4, num_kv_heads=2,
                                intermediate_size=128, max_seq_len=64)
        params = init_params(cfg, jax.random.PRNGKey(key), dtype=jnp.float32)
        return cfg, params

    def test_extended_smoothing_exact_in_fp(self):
        from deeppowers_tpu.quant.smooth import (collect_awq_stats,
                                                 smooth_params_ex)
        cfg, params = self._setup()
        ids = jnp.asarray([[1, 5, 9, 2, 7, 3, 8, 4]], jnp.int32)
        lens = jnp.asarray([8], jnp.int32)
        stats = collect_awq_stats(params, cfg, [[1, 5, 9, 2, 7, 3, 8, 4]])
        smoothed, scales = smooth_params_ex(params, cfg, stats, alpha=0.5)
        assert all("s_wo" in sc and "s_out" in sc for sc in scales)
        ref, _ = forward_prefill(params, cfg, ids, lens, dtype=jnp.float32)
        out, _ = forward_prefill(smoothed, cfg, ids, lens, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_clip_search_reduces_activation_error(self):
        from deeppowers_tpu.quant.quantize import quantize
        from deeppowers_tpu.quant.smooth import search_clip_scales
        rng = np.random.RandomState(0)
        k, n, r = 64, 32, 48
        w = rng.randn(k, n).astype(np.float32) * 0.05
        w[rng.randint(0, k, 8), rng.randint(0, n, 8)] *= 12.0  # weight outliers
        x = rng.randn(r, k).astype(np.float32)
        xj = jnp.asarray(x)
        wj = jnp.asarray(w)
        ref = x @ w

        def err(qt):
            from deeppowers_tpu.quant.quantize import dequantize
            wq = np.asarray(dequantize(qt))
            return float(((x @ wq - ref) ** 2).mean())

        plain = quantize(wj, bits=4, group_size=32)
        clip_scales = search_clip_scales(w, x, bits=4, group_size=32)
        clipped = quantize(wj, bits=4, group_size=32, scales=clip_scales)
        assert err(clipped) <= err(plain) * 1.0001, (err(clipped), err(plain))

    def test_awq_quantize_end_to_end(self):
        from deeppowers_tpu.config import QuantConfig, QuantMode
        from deeppowers_tpu.quant.smooth import awq_quantize
        from deeppowers_tpu.quant.qtypes import QuantizedTensor
        cfg, params = self._setup(1)
        qcfg = QuantConfig(mode=QuantMode.INT4, group_size=32)
        samples = [[1, 2, 3, 4, 5, 6], [9, 8, 7]]
        qp = awq_quantize(params, cfg, samples, qcfg)
        lw = qp["layers"][0]["attn"]["wq"]["w"]
        assert isinstance(lw, QuantizedTensor) and lw.bits == 4
        ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
        lens = jnp.asarray([4], jnp.int32)
        out, _ = forward_prefill(qp, cfg, ids, lens, dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()

    def test_awq_through_model_api(self):
        import deeppowers_tpu as dp
        from deeppowers_tpu.api import Model
        cfg, params = self._setup(2)
        m = Model(cfg, params)
        m.apply_quantization("int4", group_size=32,
                             calibration=[[1, 2, 3, 4], [5, 6, 7]])
        assert m.is_quantized
