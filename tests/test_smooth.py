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
