"""Top-level API tests (reference spec: tests/test_model.cpp,
test_utils.cpp model registry, test_quantization.cpp persistence)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deeppowers_tpu as dp
from deeppowers_tpu.config import RuntimeConfig
from deeppowers_tpu.models import presets
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime import checkpoint as ckpt


RT = RuntimeConfig(max_batch_size=4, max_seq_len=64, prefill_buckets=(16,))


@pytest.fixture()
def tiny_model(monkeypatch):
    cfg = presets.tiny_test_config(vocab_size=260)
    monkeypatch.setitem(presets.PRESETS, "tiny-test", cfg)
    m = dp.Model.from_pretrained("tiny-test", dtype=jnp.float32, runtime=RT)
    return m


def test_version():
    assert dp.version().count(".") == 2


def test_tpu_utils_consistent():
    # reference: test_utils.cpp:6-48
    avail = dp.is_tpu_available()
    count = dp.tpu_device_count()
    assert isinstance(avail, bool)
    assert count >= 1


def test_load_unknown_raises():
    with pytest.raises(FileNotFoundError):
        dp.load_model("no-such-model-xyz")


def test_generate_text(tiny_model):
    out = tiny_model.generate("hi", max_tokens=5, temperature=0.0,
                              do_sample=False)
    assert isinstance(out, str)


def test_generate_batch(tiny_model):
    outs = tiny_model.generate_batch(["a", "b"], max_tokens=4,
                                     temperature=0.0, do_sample=False)
    assert len(outs) == 2


def test_generate_stream(tiny_model):
    chunks = []
    out = tiny_model.generate_stream(
        "xy", lambda d: (chunks.append(d), True)[1],
        max_tokens=5, temperature=0.0, do_sample=False)
    assert "".join(chunks) == out


def test_quantize_model_api(tiny_model):
    before = tiny_model.nbytes
    dp.quantize_model(tiny_model, "int8")
    assert tiny_model.is_quantized
    assert tiny_model.nbytes < 0.5 * before
    out = tiny_model.generate("q", max_tokens=3, temperature=0.0,
                              do_sample=False)
    assert isinstance(out, str)


def test_quantize_invalid_precision(tiny_model):
    with pytest.raises(ValueError):
        dp.quantize_model(tiny_model, "int2")


def test_benchmark_model(tiny_model):
    stats = dp.benchmark_model(tiny_model, max_tokens=3, warmup=1, runs=2)
    assert stats["avg_latency_ms"] > 0
    assert stats["throughput_tokens_per_sec"] > 0
    assert stats["min_latency_ms"] <= stats["avg_latency_ms"] <= stats["max_latency_ms"]


class TestCheckpoint:
    def test_roundtrip_plain(self, tiny_model, tmp_path):
        p = str(tmp_path / "m1")
        ref = tiny_model.generate("s", max_tokens=4, temperature=0.0,
                                  do_sample=False)
        tiny_model.save(p)
        m2 = dp.Model.from_pretrained(p, runtime=RT)
        out = m2.generate("s", max_tokens=4, temperature=0.0, do_sample=False)
        assert out == ref

    def test_quantized_persistence(self, tiny_model, tmp_path):
        # reference: test_quantization.cpp:152-170 — save quantized, reload,
        # still quantized with same config.
        p = str(tmp_path / "mq")
        tiny_model.apply_quantization("int4", group_size=16)
        ref = tiny_model.generate("s", max_tokens=4, temperature=0.0,
                                  do_sample=False)
        qbytes = tiny_model.nbytes
        tiny_model.save(p)
        m2 = dp.Model.from_pretrained(p, runtime=RT)
        assert m2.is_quantized
        assert m2.quant.mode == dp.QuantMode.INT4
        assert m2.quant.group_size == 16
        assert m2.nbytes == qbytes
        out = m2.generate("s", max_tokens=4, temperature=0.0, do_sample=False)
        assert out == ref

    def test_bf16_roundtrip(self, tmp_path):
        cfg = presets.tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        p = str(tmp_path / "bf16")
        ckpt.save_checkpoint(p, params, cfg)
        params2, cfg2, _ = ckpt.load_checkpoint(p)
        assert cfg2 == cfg
        assert params2["embedding"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(params["embedding"].astype(jnp.float32)),
            np.asarray(params2["embedding"].astype(jnp.float32)))


def test_convert_model(tiny_model, tmp_path, monkeypatch):
    src = str(tmp_path / "src")
    tiny_model.save(src)
    dst = str(tmp_path / "dst")
    dp.convert_model(src, dst, precision="int8")
    m = dp.Model.from_pretrained(dst, runtime=RT)
    assert m.is_quantized


def test_pipeline(tiny_model, tmp_path):
    pipe = dp.Pipeline(tiny_model)
    out = pipe("hello", max_tokens=3, temperature=0.0, do_sample=False)
    assert isinstance(out, str)
    p = str(tmp_path / "pipe")
    pipe.save(p)
    pipe2 = dp.Pipeline.load(p)
    assert pipe2.model.cfg == tiny_model.cfg


def test_num_return_sequences(tiny_model):
    outs = tiny_model.generate("hi", max_tokens=4, temperature=1.0, seed=1,
                               num_return_sequences=3)
    assert isinstance(outs, list) and len(outs) == 3
    single = tiny_model.generate("hi", max_tokens=4, temperature=0.0,
                                 do_sample=False)
    assert isinstance(single, str)
