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
        assert caches[0].k.shape == (4, 32, 2, 16)
        assert caches[0].k.dtype == jnp.bfloat16
        assert not caches[0].quantized

    def test_int8_init(self):
        caches = kvcache.init_cache(1, 2, 16, 2, 8, kv_cache_dtype="int8")
        c = caches[0]
        assert c.quantized
        assert c.k.dtype == jnp.int8
        assert c.k_scale.shape == (2, 16, 2, 1)

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
        assert w.k.shape == (2, 16, 2, 8)

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
