"""KV cache unit tests + config JSON round-trip (ConfigManager parity,
reference: config_manager.hpp:53-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import (
    CalibrationMethod,
    GenerationConfig,
    QuantConfig,
    QuantMode,
    RuntimeConfig,
    SchedulerConfig,
    config_from_json,
    config_to_json,
)
from deeppowers_tpu.runtime import kvcache


class TestKVCache:
    def test_init_shapes(self):
        caches = kvcache.init_cache(3, 4, 32, 2, 16)
        assert len(caches) == 3
        assert caches[0].k.shape == (4, 32, 32)   # flat (B, S, K*D)
        assert caches[0].k.dtype == jnp.bfloat16
        assert not caches[0].quantized

    def test_int8_init(self):
        caches = kvcache.init_cache(1, 2, 16, 2, 8, kv_cache_dtype="int8")
        c = caches[0]
        assert c.quantized
        assert c.k.dtype == jnp.int8
        assert c.k_scale.shape == (2, 2, 16)      # head-major (B, K, S)

    def test_write_prompt_then_read(self):
        c = kvcache.init_cache(1, 2, 16, 2, 8, dtype=jnp.float32)[0]
        k_new = jnp.ones((5, 2, 8)) * 2.5
        v_new = jnp.ones((5, 2, 8)) * -1.5
        c = kvcache.write_prompt(c, k_new, v_new, 1)
        k, v = kvcache.read(c, jnp.float32)
        np.testing.assert_allclose(np.asarray(k[1, :5]), 2.5)
        np.testing.assert_allclose(np.asarray(v[1, :5]), -1.5)
        np.testing.assert_allclose(np.asarray(k[0]), 0.0)  # other slot intact

    def test_append_token_positions(self):
        c = kvcache.init_cache(1, 3, 8, 1, 4, dtype=jnp.float32)[0]
        k_new = jnp.arange(12, dtype=jnp.float32).reshape(3, 1, 4)
        positions = jnp.array([0, 3, 7])
        c = kvcache.append_token(c, k_new, k_new, positions)
        k, _ = kvcache.read(c, jnp.float32)
        np.testing.assert_allclose(np.asarray(k[0, 0, 0]), [0, 1, 2, 3])
        np.testing.assert_allclose(np.asarray(k[1, 3, 0]), [4, 5, 6, 7])
        np.testing.assert_allclose(np.asarray(k[2, 7, 0]), [8, 9, 10, 11])

    def test_int8_roundtrip_accuracy(self):
        c = kvcache.init_cache(1, 1, 8, 1, 64, kv_cache_dtype="int8")[0]
        rng = np.random.default_rng(0)
        kv = jnp.asarray(rng.standard_normal((4, 1, 64)), dtype=jnp.float32)
        c = kvcache.write_prompt(c, kv, kv, 0)
        k, _ = kvcache.read(c, jnp.float32)
        err = np.abs(np.asarray(k[0, :4]) - np.asarray(kv)).max()
        assert err <= np.abs(np.asarray(kv)).max() / 127 * 0.51 + 1e-6

    def test_slice_window(self):
        c = kvcache.init_cache(1, 2, 32, 2, 8)[0]
        w = kvcache.slice_window(c, 16)
        assert w.k.shape == (2, 16, 16)           # flat view

    def test_nbytes(self):
        caches = kvcache.init_cache(2, 2, 16, 2, 8)
        assert kvcache.nbytes(caches) == 2 * 2 * (2 * 16 * 2 * 8 * 2)


class TestConfigJSON:
    @pytest.mark.parametrize("cfg", [
        GenerationConfig(max_tokens=7, temperature=0.3, stop_tokens=("x",)),
        RuntimeConfig(max_batch_size=4),
        SchedulerConfig(max_queue_size=10),
        QuantConfig(mode=QuantMode.INT4, group_size=64,
                    calibration=CalibrationMethod.PERCENTILE),
    ])
    def test_roundtrip(self, cfg):
        payload = config_to_json(cfg)
        back = config_from_json(type(cfg), payload)
        assert back == cfg

    def test_validation(self):
        GenerationConfig(temperature=1.5).validate()
        with pytest.raises(ValueError):
            GenerationConfig(temperature=-0.1).validate()
        with pytest.raises(ValueError):
            GenerationConfig(temperature=2.5).validate()
        with pytest.raises(ValueError):
            GenerationConfig(max_tokens=0).validate()
        with pytest.raises(ValueError):
            GenerationConfig(top_p=0.0).validate()

    def test_mixed_mode_layer_lookup(self):
        q = QuantConfig(mode=QuantMode.MIXED,
                        layer_overrides={"attention": "int8", "mlp": "int4"})
        assert q.mode_for_layer("attention") == QuantMode.INT8
        assert q.mode_for_layer("mlp") == QuantMode.INT4
        assert q.mode_for_layer("embedding") == QuantMode.NONE

    def test_configs_hashable(self):
        # static jit args must hash
        {GenerationConfig(), RuntimeConfig(), QuantConfig()}


class TestInt4KV:
    """int4 KV cache (packed 2/byte along D, per (slot,pos,head) scales)."""

    def test_roundtrip_tolerance(self):
        from deeppowers_tpu.runtime.kvcache import (_dequant_kv4, _quant_kv4)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 8, 2, 64).astype(np.float32))
        q, s = _quant_kv4(x)
        assert q.shape == (4, 8, 64)          # flat packed (B, S, K*D/2)
        assert s.shape == (4, 8, 2)           # per-row scales (B, S, K)
        # dequant takes HEAD-major (B, K, S) scales, as the caches store them
        back = _dequant_kv4(q.reshape(4, 8, 2, 32), jnp.swapaxes(s, 1, 2),
                            jnp.float32)
        err = float(jnp.max(jnp.abs(back - x)))
        # int4 grid: max error ~ absmax/14 per head
        assert err < float(jnp.max(jnp.abs(x))) / 7, err

    def _gen(self, kv_dtype, scan=False):
        from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
        from deeppowers_tpu.models.presets import tiny_llama_config
        from deeppowers_tpu.models.transformer import init_params
        from deeppowers_tpu.runtime.engine import InferenceEngine
        cfg = tiny_llama_config(max_seq_len=128)
        params = init_params(cfg, jax.random.PRNGKey(40), dtype=jnp.float32)
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=128,
                           prefill_buckets=(32,), scan_layers=scan)
        eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_cache_dtype=kv_dtype)
        gen = GenerationConfig(max_tokens=16, do_sample=False)
        res = eng.generate([3, 1, 4, 1, 5, 9, 2, 6], gen)
        return res.token_ids, eng

    def test_engine_generates_and_mostly_agrees(self):
        ref, _ = self._gen("bf16")
        out, eng = self._gen("int4")
        agree = sum(a == b for a, b in zip(ref, out)) / len(ref)
        assert agree >= 0.5, (ref, out)
        from deeppowers_tpu.runtime import kvcache
        assert eng.caches[0].bits == 4
        # half the int8 footprint for the data arrays (flat K*D/2)
        assert eng.caches[0].k.shape[-1] == (
            eng.cfg.kv_heads * eng.cfg.dim_head // 2)

    def test_scan_layers_int4(self):
        ref, _ = self._gen("int4")
        out, _ = self._gen("int4", scan=True)
        assert out == ref   # same quantization grid => bit-equal

    def test_paged_accepts_int4(self):
        # int4 KV on the paged layout is supported since the half-space
        # paged kernel landed; the engine must construct (exactness vs the
        # contiguous layout is covered in test_paged_kv.py)
        from deeppowers_tpu.config import RuntimeConfig
        from deeppowers_tpu.models.presets import tiny_llama_config
        from deeppowers_tpu.models.transformer import init_params
        from deeppowers_tpu.runtime.engine import InferenceEngine
        cfg = tiny_llama_config(max_seq_len=128)
        params = init_params(cfg, jax.random.PRNGKey(41), dtype=jnp.float32)
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                           prefill_chunk_size=32)
        eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                              kv_layout="paged", kv_cache_dtype="int4")
        assert eng is not None

    def test_unknown_dtype_rejected(self):
        from deeppowers_tpu.runtime import kvcache
        with pytest.raises(ValueError):
            kvcache.init_cache(1, 2, 32, 2, 64, kv_cache_dtype="fp8")


def test_k8v4_mixed_kv_engine_matches_bf16():
    """Mixed k8v4 KV (int8 K + packed int4 V — the shipped int4-class KV
    after int4-K failed the trained-weights Δppl gate, round 4): greedy
    decode matches the bf16-cache engine on a tiny model."""
    import jax
    import jax.numpy as jnp

    from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64, prefill_buckets=(16,))
    gen = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)
    ref = InferenceEngine(params, cfg, runtime=rt,
                          act_dtype=jnp.float32).generate([1, 2, 3], gen)
    out = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                          kv_cache_dtype="k8v4").generate([1, 2, 3], gen)
    assert out.token_ids == ref.token_ids
    # reset() must preserve the mixed dtype (not collapse it to int8)
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                          kv_cache_dtype="k8v4")
    eng.generate([1, 2, 3], gen)
    eng.reset()
    assert eng.caches[0].vbits == 4 and eng.caches[0].bits == 8


def test_k8v4_cache_roundtrip():
    """write_prompt/append/read with per-tensor bits: K stays int8-exact
    scale-wise, V int4."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeppowers_tpu.runtime import kvcache

    cache = kvcache.init_cache(1, 2, 16, 2, 8, kv_cache_dtype="k8v4")[0]
    assert cache.bits == 8 and cache.vbits == 4
    assert cache.v.shape[-1] == cache.k.shape[-1] // 2
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((5, 2, 8), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((5, 2, 8), dtype=np.float32))
    cache = kvcache.write_prompt(cache, k, v, 1)
    kr, vr = kvcache.read(cache, jnp.float32)
    np.testing.assert_allclose(np.asarray(kr[1, :5]), np.asarray(k),
                               atol=0.02, rtol=0.02)
    np.testing.assert_allclose(np.asarray(vr[1, :5]), np.asarray(v),
                               atol=0.2, rtol=0.2)
    # int4 V is coarser than int8 K
    kerr = np.abs(np.asarray(kr[1, :5]) - np.asarray(k)).max()
    verr = np.abs(np.asarray(vr[1, :5]) - np.asarray(v)).max()
    assert kerr < verr
