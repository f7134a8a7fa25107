"""Tests: optimizer passes, auto-tuner search, validation report, perplexity
gate (reference spec: inference_optimizer.hpp, auto_tuner.hpp,
postprocessor.hpp, test_quantization.cpp:70-94)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deeppowers_tpu as dp
from deeppowers_tpu.config import QuantConfig, QuantMode, RuntimeConfig
from deeppowers_tpu.models import presets
from deeppowers_tpu.models.transformer import init_params, quantize_params
from deeppowers_tpu.quant.validate import (
    ErrorMetrics,
    ValidationReport,
    validate_quantized_params,
)
from deeppowers_tpu.runtime.autotuner import TuningResult, grid_search, random_search
from deeppowers_tpu.runtime.evaluate import delta_ppl, perplexity
from deeppowers_tpu.runtime.optimizer import (
    OptimizationLevel,
    OptimizerType,
    optimize_model,
)

RT = RuntimeConfig(max_batch_size=2, max_seq_len=64, prefill_buckets=(16,))


@pytest.fixture()
def tiny_model(monkeypatch):
    cfg = presets.tiny_test_config(vocab_size=260)
    monkeypatch.setitem(presets.PRESETS, "tiny-test", cfg)
    return dp.Model.from_pretrained("tiny-test", dtype=jnp.float32, runtime=RT)


class TestOptimizer:
    def test_o2_quantizes_int8(self, tiny_model):
        res = optimize_model(tiny_model, level=OptimizationLevel.O2)
        assert res.success
        assert tiny_model.is_quantized
        assert tiny_model.quant.mode == QuantMode.INT8
        assert res.memory_reduction > 0.4

    def test_o3_int4_kv8(self, tiny_model):
        res = optimize_model(tiny_model, level=OptimizationLevel.O3)
        assert tiny_model.quant.mode == QuantMode.INT4
        assert tiny_model.quant.kv_cache_dtype == "int8"
        assert res.memory_reduction > 0.5

    def test_pruning(self, tiny_model):
        before = np.asarray(
            tiny_model.params["layers"][0]["mlp"]["w_in"]["w"]).copy()
        optimize_model(tiny_model, opt_type=OptimizerType.PRUNING,
                       prune_sparsity=0.5)
        after = np.asarray(tiny_model.params["layers"][0]["mlp"]["w_in"]["w"])
        assert (after == 0).mean() >= 0.45
        assert not np.array_equal(before, after)

    def test_benchmark_hooks(self, tiny_model):
        res = optimize_model(tiny_model, level=OptimizationLevel.O2,
                             benchmark=True)
        assert "before" in res.metrics and "after" in res.metrics
        assert res.speedup > 0


class TestAutoTuner:
    def test_grid_search_finds_min(self):
        res = grid_search(lambda p: (p["x"] - 3) ** 2 + p["y"],
                          {"x": [1, 2, 3, 4], "y": [0, 5]})
        assert res.best_params == {"x": 3, "y": 0}
        assert res.best_score == 0

    def test_grid_search_skips_failures(self):
        def obj(p):
            if p["x"] == 1:
                raise RuntimeError("bad config")
            return p["x"]
        res = grid_search(obj, {"x": [1, 2, 3]})
        assert res.best_params == {"x": 2}
        assert any("error" in t for t in res.trials)

    def test_random_search(self):
        res = random_search(lambda p: -p["x"], {"x": list(range(10))},
                            num_trials=30, minimize=True)
        assert res.best_params["x"] == 9

    def test_cache_roundtrip(self, tmp_path, monkeypatch):
        import deeppowers_tpu.runtime.autotuner as at
        monkeypatch.setattr(at, "_cache_path",
                            lambda: str(tmp_path / "cache.json"))
        calls = []
        def obj(p):
            calls.append(p)
            return p["x"]
        r1 = grid_search(obj, {"x": [2, 1]}, cache_name="t")
        r2 = grid_search(obj, {"x": [2, 1]}, cache_name="t")
        assert r2.cached and r2.best_params == r1.best_params
        assert len(calls) == 2  # second search hit the cache

    def test_tune_int4_mode_installed(self, tmp_path, monkeypatch):
        # grouped int4 tunes the in-block scaling mode alongside the block
        # sizes; the winner lands in the kernel's per-shape mode table and
        # survives the persisted-cache round trip
        import deeppowers_tpu.runtime.autotuner as at
        from deeppowers_tpu.ops.pallas import dequant_matmul as dq
        monkeypatch.setattr(at, "_cache_path",
                            lambda: str(tmp_path / "cache.json"))
        monkeypatch.setattr(dq, "_DQMM_INT4_MODE", {})
        monkeypatch.setattr(dq, "_DQMM_BLOCKS", {})
        res = at.tune_dequant_matmul(512, 256, m=8, bits=4, group_size=128,
                                     iters=2)
        assert res.best_params["int4_mode"] in ("grouped", "scale")
        assert dq._DQMM_INT4_MODE[(512, 256)] == \
            res.best_params["int4_mode"]
        dq._DQMM_INT4_MODE.clear()
        dq._DQMM_BLOCKS.clear()
        assert at.install_cached() >= 1
        assert dq._DQMM_INT4_MODE[(512, 256)] == \
            res.best_params["int4_mode"]

    def test_tune_quantization_prefers_accurate(self):
        cfg = presets.tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        from deeppowers_tpu.runtime.autotuner import tune_quantization
        ref = np.asarray(params["layers"][0]["mlp"]["w_in"]["w"])

        def eval_fn(qparams):
            from deeppowers_tpu.quant import dequantize
            back = np.asarray(dequantize(
                qparams["layers"][0]["mlp"]["w_in"]["w"]))
            return float(np.abs(back - ref).max())

        res = tune_quantization(params, cfg, eval_fn,
                                schemes=[("int8", 0), ("int4", 0)])
        assert res.best_params["scheme"][0] == "int8"  # int8 more accurate


class TestValidation:
    def test_error_metrics(self):
        a = np.array([1.0, 2.0, 3.0])
        b = np.array([1.1, 2.0, 2.9])
        m = ErrorMetrics.compare(a, b)
        assert np.isclose(m.max_abs_error, 0.1, atol=1e-6)
        assert m.rmse > 0

    def test_validation_report(self, tmp_path):
        cfg = presets.tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        report = validate_quantized_params(params, q, tolerance=0.1)
        assert report.passed  # int8 of 0.02-scale weights is well within 0.1
        assert report.summary["tensors"] > 0
        p = str(tmp_path / "report.json")
        report.save(p)
        import json
        saved = json.load(open(p))
        assert saved["passed"] is True

    def test_validation_fails_on_tight_tolerance(self):
        cfg = presets.tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT4))
        report = validate_quantized_params(params, q, tolerance=1e-6)
        assert not report.passed


class TestPerplexity:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = presets.tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        rng = np.random.default_rng(0)
        seqs = [rng.integers(0, cfg.vocab_size, size=20).tolist()
                for _ in range(4)]
        return cfg, params, seqs

    def test_ppl_near_vocab_for_random_model(self, setup):
        cfg, params, seqs = setup
        ppl = perplexity(params, cfg, seqs)
        # an untrained model is ~uniform: ppl ~ vocab_size
        assert 0.3 * cfg.vocab_size < ppl < 3 * cfg.vocab_size

    def test_delta_ppl_small_for_int8(self, setup):
        cfg, params, seqs = setup
        q = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        res = delta_ppl(params, q, cfg, seqs)
        # BASELINE.md gate: <= 0.1 (relative to a ~128 ppl baseline, int8 of
        # a tiny model is comfortably inside)
        assert abs(res["delta_ppl"]) < 0.1 * res["ppl_ref"]

    def test_delta_ppl_small_for_w4a8_vs_w4a16(self, setup):
        # W4A8 (dynamic per-row int8 activations) is the fastest int4
        # kernel path (635 vs 456 GB/s, docs/benchmarks.md); its quality
        # delta over the same int4 weights with bf16 activations must be
        # noise next to the weight-quantization delta itself
        import dataclasses as _dc
        cfg, params, seqs = setup
        q16 = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                                  group_size=32))
        q8 = jax.tree_util.tree_map(
            lambda x: _dc.replace(x, act_bits=8)
            if hasattr(x, "act_bits") else x, q16,
            is_leaf=lambda x: hasattr(x, "act_bits"))
        res = delta_ppl(q16, q8, cfg, seqs)
        assert abs(res["delta_ppl"]) < 0.05 * res["ppl_ref"]

    def test_rejects_trivial_sequences(self, setup):
        cfg, params, _ = setup
        with pytest.raises(ValueError):
            perplexity(params, cfg, [[1]])

    def test_cached_ppl_matches_prefill_ppl(self, setup):
        # the decode-path (KV-cache) ppl must equal the prefill ppl when the
        # cache holds the compute dtype exactly — the control that makes the
        # quantized-KV gate rows (scripts/eval_ppl.py) meaningful
        from deeppowers_tpu.runtime.evaluate import cached_perplexity
        cfg, params, seqs = setup
        p0 = perplexity(params, cfg, seqs, dtype=jnp.float32)
        p1 = cached_perplexity(params, cfg, seqs, dtype=jnp.float32)
        assert abs(p0 - p1) < 2e-3 * p0

    def test_cached_ppl_quantized_kv_bounded(self, setup):
        # int8/int4 KV reads go through the real quantized-cache path; on a
        # tiny random model the ppl distortion must stay small relative to
        # the reference (the trained-weights gate lives in eval_ppl.py)
        from deeppowers_tpu.runtime.evaluate import cached_perplexity
        cfg, params, seqs = setup
        p1 = cached_perplexity(params, cfg, seqs, dtype=jnp.float32)
        for kvd in ("int8", "int4"):
            pq = cached_perplexity(params, cfg, seqs, kv_cache_dtype=kvd,
                                   dtype=jnp.float32)
            assert abs(pq - p1) < 0.1 * p1, (kvd, pq, p1)


def test_eval_ppl_gate_script(tmp_path):
    """scripts/eval_ppl.py --synthetic runs the full delta-ppl gate
    (VERDICT round 1 item 6). Real checkpoints: same script with
    --checkpoint; this environment ships no weights (zero egress), so CI
    validates the harness on synthetic params — deltas there measure
    quantizer numerics only."""
    import subprocess
    import sys
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DPT_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "eval_ppl.py"),
         "--synthetic", "--max-seqs", "2", "--seq-len", "64"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PASS" in out.stdout
    assert "int4 g128 + AWQ" in out.stdout
