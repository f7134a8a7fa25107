"""Quantization core tests.

Acceptance spec carried over from the reference's quantization tests
(reference: tests/test_quantization.cpp — size reduction, round-trip accuracy,
config round-trip, error handling, mixed precision) plus numerical golden
checks the reference lacked (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import CalibrationMethod, QuantConfig, QuantMode
from deeppowers_tpu.quant import (
    Calibrator,
    QuantizedTensor,
    dequantize,
    dequantize_dynamic,
    pack_int4,
    quantize,
    quantize_dynamic,
    unpack_int4,
)


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale)


class TestPacking:
    def test_int4_roundtrip_exact(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.integers(-8, 8, size=(64, 32), dtype=np.int8))
        packed = pack_int4(v)
        assert packed.shape == (32, 32)
        assert packed.dtype == jnp.int8
        out = unpack_int4(packed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(v))

    def test_int4_extremes(self):
        v = jnp.array([[-8, 7], [7, -8]], dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(v))),
                                      np.asarray(v))

    def test_odd_k_rejected(self):
        with pytest.raises(ValueError):
            pack_int4(jnp.zeros((3, 4), dtype=jnp.int8))


class TestQuantizeInt8:
    def test_roundtrip_tolerance(self):
        # reference: quantization_manager_test.cpp:83-100 — tolerance 0.1
        # for INT8 on ~unit-range data.
        w = rand((256, 128))
        qt = quantize(w, bits=8)
        back = dequantize(qt)
        err = float(jnp.max(jnp.abs(back - w)))
        absmax = float(jnp.max(jnp.abs(w)))
        assert err <= absmax / 127.0 * 0.51 + 1e-6

    def test_per_channel_scales_shape(self):
        qt = quantize(rand((64, 16)), bits=8)
        assert qt.scales.shape == (1, 16)
        assert qt.data.shape == (64, 16)
        assert qt.is_symmetric

    def test_per_group(self):
        qt = quantize(rand((256, 32)), bits=8, group_size=64)
        assert qt.scales.shape == (4, 32)
        back = dequantize(qt)
        # Per-group should be at least as accurate as per-channel.
        qt_pc = quantize(rand((256, 32)), bits=8)
        w = rand((256, 32))
        err_pg = float(jnp.mean((dequantize(quantize(w, bits=8, group_size=64)) - w) ** 2))
        err_pc = float(jnp.mean((dequantize(quantize(w, bits=8)) - w) ** 2))
        assert err_pg <= err_pc + 1e-9
        assert back.shape == (256, 32)

    def test_asymmetric(self):
        w = rand((128, 8)) + 3.0  # shifted distribution
        qt_sym = quantize(w, bits=8, symmetric=True)
        qt_asym = quantize(w, bits=8, symmetric=False)
        assert qt_asym.zero_points is not None
        err_sym = float(jnp.mean((dequantize(qt_sym) - w) ** 2))
        err_asym = float(jnp.mean((dequantize(qt_asym) - w) ** 2))
        assert err_asym < err_sym

    def test_size_reduction(self):
        # reference: test_quantization.cpp:57-67 — INT8 shrinks, INT4 < 0.3x.
        w = rand((1024, 1024))
        fp32_bytes = w.size * 4
        int8_bytes = quantize(w, bits=8).nbytes
        int4_bytes = quantize(w, bits=4, group_size=128).nbytes
        assert int8_bytes < 0.3 * fp32_bytes
        assert int4_bytes < 0.3 * fp32_bytes
        assert int4_bytes < int8_bytes


class TestQuantizeInt4:
    def test_roundtrip_tolerance(self):
        w = rand((256, 64))
        qt = quantize(w, bits=4, group_size=64)
        assert qt.data.shape == (128, 64)  # packed
        back = dequantize(qt)
        # Error bounded by half an int4 step per group.
        wg = np.asarray(w).reshape(4, 64, 64)
        step = np.abs(wg).max(axis=1) / 7.0
        max_allowed = float(step.max()) * 0.51 + 1e-6
        assert float(jnp.max(jnp.abs(back - w))) <= max_allowed

    def test_group_beats_per_channel_int4(self):
        w = rand((512, 64), seed=3)
        err_pc = float(jnp.mean((dequantize(quantize(w, bits=4)) - w) ** 2))
        err_pg = float(jnp.mean((dequantize(quantize(w, bits=4, group_size=64)) - w) ** 2))
        assert err_pg < err_pc

    def test_quant_config_ctor(self):
        cfg = QuantConfig(mode=QuantMode.INT4, group_size=32)
        qt = quantize(rand((64, 16)), cfg)
        assert qt.bits == 4 and qt.group_size == 32


class TestErrorHandling:
    # reference: test_quantization.cpp:173-188 — invalid inputs throw.
    def test_bad_ndim(self):
        with pytest.raises(ValueError):
            quantize(jnp.zeros((2, 3, 4)), bits=8)

    def test_int4_odd_k(self):
        with pytest.raises(ValueError):
            quantize(jnp.zeros((7, 4)), bits=4)

    def test_bad_group(self):
        with pytest.raises(ValueError):
            quantize(jnp.zeros((64, 4)), bits=8, group_size=48)


class TestDynamic:
    def test_dynamic_roundtrip(self):
        x = rand((8, 128))
        q, s = quantize_dynamic(x, bits=8)
        back = dequantize_dynamic(q, s)
        assert float(jnp.max(jnp.abs(back - x))) <= float(jnp.max(jnp.abs(x))) / 127 * 0.51 + 1e-6

    def test_dynamic_axis(self):
        x = rand((4, 16, 32))
        q, s = quantize_dynamic(x, axis=-1)
        assert s.shape == (4, 16, 1)


class TestCalibration:
    def test_minmax_accumulates(self):
        cal = Calibrator(CalibrationMethod.MINMAX)
        cal.observe("h", jnp.array([1.0, -2.0]))
        cal.observe("h", jnp.array([5.0, 0.0]))
        mn, mx = cal.finalize()["h"]
        assert mn == -2.0 and mx == 5.0
        assert cal.num_samples == 2

    def test_percentile_clips_outliers(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(100_000).astype(np.float32)
        x[0] = 1000.0  # outlier
        cal = Calibrator(CalibrationMethod.PERCENTILE, percentile=99.9)
        cal.observe("h", jnp.asarray(x))
        mn, mx = cal.finalize()["h"]
        assert mx < 10.0  # clipped far below the outlier
        assert mx > 2.0   # but keeps the bulk

    def test_entropy_and_mse_produce_thresholds(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1024,)).astype(np.float32))
        for m in (CalibrationMethod.ENTROPY, CalibrationMethod.MSE):
            cal = Calibrator(m)
            cal.observe("h", x)
            mn, mx = cal.finalize()["h"]
            assert np.all(np.isfinite(mn)) and np.all(np.isfinite(mx))
            assert mx > 0

    def test_calibrated_scales_feed_quantize(self):
        w = rand((128, 16), seed=5)
        cal = Calibrator()
        cal.observe("w", w, axis=1)
        scales = cal.scales(qmax=127)["w"].reshape(1, -1)
        qt = quantize(w, bits=8, scales=jnp.asarray(scales))
        back = dequantize(qt)
        assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(jnp.abs(w))) / 127 * 0.51 + 1e-6

    def test_per_channel_observer(self):
        ob_x = rand((32, 8), seed=7)
        cal = Calibrator()
        cal.observe("a", ob_x, axis=1)
        mn, mx = cal.finalize()["a"]
        assert mn.shape == (8,)
        np.testing.assert_allclose(mn, np.asarray(ob_x).min(axis=0), rtol=1e-6)


class TestPytree:
    def test_quantized_tensor_is_pytree(self):
        import jax
        qt = quantize(rand((64, 16)), bits=4, group_size=16)
        leaves = jax.tree_util.tree_leaves(qt)
        assert len(leaves) == 2  # data, scales (symmetric: no zps)
        qt2 = jax.tree_util.tree_map(lambda x: x, qt)
        assert isinstance(qt2, QuantizedTensor)
        assert qt2.shape == qt.shape and qt2.bits == 4

    def test_jit_through(self):
        import jax
        qt = quantize(rand((64, 16)), bits=8)

        @jax.jit
        def f(q):
            return dequantize(q).sum()

        assert np.isfinite(float(f(qt)))


class TestW8A8:
    """Dynamic-activation int8 paths (W8A8 / W4A8)."""

    def _model(self):
        from deeppowers_tpu.models.presets import tiny_llama_config
        from deeppowers_tpu.models.transformer import init_params
        cfg = tiny_llama_config(hidden_size=128, intermediate_size=256,
                                max_seq_len=64)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        return cfg, params

    def test_w8a8_matmul_close_to_float(self):
        from deeppowers_tpu.ops.matmul import quantized_matmul
        from deeppowers_tpu.quant.quantize import quantize
        import dataclasses
        w = jax.random.normal(jax.random.PRNGKey(1), (128, 64)) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(2), (4, 128))
        qw = dataclasses.replace(quantize(w, bits=8), act_bits=8)
        y = quantized_matmul(x, qw, out_dtype=jnp.float32)
        ref = x @ w
        err = jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
        assert float(err) < 0.05, float(err)

    def test_w4a8_grouped_matmul(self):
        """Activation int8 noise must be small relative to the int4 weight
        quantization it rides on (compare against the weight-only path, not
        the float reference — int4-g32's own error dominates)."""
        from deeppowers_tpu.ops.matmul import quantized_matmul
        from deeppowers_tpu.quant.quantize import quantize
        import dataclasses
        w = jax.random.normal(jax.random.PRNGKey(3), (128, 64)) * 0.05
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 128))
        qw = quantize(w, bits=4, group_size=32)
        wo = quantized_matmul(x, qw, out_dtype=jnp.float32)
        a8 = quantized_matmul(x, dataclasses.replace(qw, act_bits=8),
                              out_dtype=jnp.float32)
        delta = jnp.max(jnp.abs(a8 - wo)) / (jnp.max(jnp.abs(wo)) + 1e-9)
        assert float(delta) < 0.03, float(delta)

    def test_engine_generates_with_w8a8(self):
        from deeppowers_tpu.config import GenerationConfig, QuantConfig, \
            QuantMode, RuntimeConfig
        from deeppowers_tpu.models.transformer import quantize_params
        from deeppowers_tpu.runtime.engine import InferenceEngine
        cfg, params = self._model()
        qp = quantize_params(params, QuantConfig(mode=QuantMode.INT8,
                                                 act_bits=8))
        eng = InferenceEngine(qp, cfg, runtime=RuntimeConfig(
            max_batch_size=2, max_seq_len=64, prefill_buckets=(16,)),
            act_dtype=jnp.float32)
        res = eng.generate([1, 2, 3], GenerationConfig(max_tokens=8,
                                                       do_sample=False))
        assert len(res.token_ids) == 8

    def test_w8a8_outputs_near_weight_only(self):
        """Activation quant noise should not derail the model: greedy tokens
        from W8A8 should mostly agree with weight-only int8 on a tiny model."""
        from deeppowers_tpu.config import GenerationConfig, QuantConfig, \
            QuantMode, RuntimeConfig
        from deeppowers_tpu.models.transformer import quantize_params
        from deeppowers_tpu.runtime.engine import InferenceEngine
        cfg, params = self._model()
        gen = GenerationConfig(max_tokens=12, do_sample=False)
        outs = []
        for ab in (0, 8):
            qp = quantize_params(params, QuantConfig(mode=QuantMode.INT8,
                                                     act_bits=ab))
            eng = InferenceEngine(qp, cfg, runtime=RuntimeConfig(
                max_batch_size=2, max_seq_len=64, prefill_buckets=(16,)),
                act_dtype=jnp.float32)
            outs.append(eng.generate([5, 6, 7, 8], gen).token_ids)
        agree = sum(a == b for a, b in zip(*outs)) / len(outs[0])
        assert agree >= 0.5, (outs, agree)

    def test_checkpoint_roundtrip_preserves_act_bits(self, tmp_path):
        import dataclasses
        from deeppowers_tpu.quant.quantize import quantize
        from deeppowers_tpu.runtime import checkpoint as ckpt
        from deeppowers_tpu.models.presets import tiny_llama_config
        cfg = tiny_llama_config()
        w = jax.random.normal(jax.random.PRNGKey(5), (64, 32)) * 0.05
        qt = dataclasses.replace(quantize(w, bits=8), act_bits=8)
        ckpt.save_checkpoint(str(tmp_path / "m"), {"x": {"w": qt}}, cfg)
        params, _, _ = ckpt.load_checkpoint(str(tmp_path / "m"))
        assert params["x"]["w"].act_bits == 8
