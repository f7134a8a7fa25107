"""Scan-over-layers (RuntimeConfig.scan_layers) must be bit-equivalent to the
unrolled forwards — same math, different compilation strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, QuantConfig, QuantMode, RuntimeConfig
from deeppowers_tpu.models.presets import (
    tiny_llama_config,
    tiny_moe_config,
    tiny_test_config,
)
from deeppowers_tpu.models.transformer import (
    init_params,
    quantize_params,
    stack_layer_params,
)
from deeppowers_tpu.runtime.engine import InferenceEngine

PROMPTS = [[5, 9, 7, 3, 5, 9, 7, 3, 5, 9], [11, 3, 2], [42] * 7]
GEN = GenerationConfig(max_tokens=16, do_sample=False)


def run(cfg, params, scan, **kw):
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=cfg.max_seq_len,
                       prefill_buckets=(16, 32), scan_layers=scan,
                       **kw.pop("rt", {}))
    eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, **kw)
    return [r.token_ids for r in eng.generate_batch(PROMPTS, GEN)], eng


@pytest.mark.parametrize("make_cfg", [tiny_test_config, tiny_llama_config,
                                      tiny_moe_config])
def test_scan_matches_unrolled(make_cfg):
    cfg = make_cfg(num_layers=3, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    base, _ = run(cfg, params, scan=False)
    scan, _ = run(cfg, params, scan=True)
    assert scan == base


@pytest.mark.parametrize("mode,gs", [(QuantMode.INT8, 0), (QuantMode.INT4, 32)])
def test_scan_quantized_params(mode, gs):
    cfg = tiny_llama_config(num_layers=3, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=mode, group_size=gs))
    base, _ = run(cfg, qp, scan=False)
    scan, _ = run(cfg, qp, scan=True)
    assert scan == base


def test_scan_int8_kv_cache():
    cfg = tiny_llama_config(num_layers=3, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    base, _ = run(cfg, params, scan=False, kv_cache_dtype="int8")
    scan, _ = run(cfg, params, scan=True, kv_cache_dtype="int8")
    assert scan == base


def test_scan_chunked_prefill():
    cfg = tiny_llama_config(max_seq_len=256)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    long_prompt = list(np.random.RandomState(0).randint(1, 127, size=100))
    rt = dict(rt={"prefill_chunk_size": 32})
    base, _ = run(cfg, params, scan=False, **rt)
    scan, _ = run(cfg, params, scan=True, **rt)
    assert scan == base
    # and through the chunked path explicitly
    def gen_long(scan_flag):
        r = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                          prefill_buckets=(16, 32), prefill_chunk_size=32,
                          scan_layers=scan_flag)
        eng = InferenceEngine(params, cfg, runtime=r, eos_token_id=0,
                              act_dtype=jnp.float32)
        return eng.generate(long_prompt, GEN).token_ids
    assert gen_long(True) == gen_long(False)


def test_scan_speculative():
    cfg = tiny_llama_config(num_layers=3, max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    rt = dict(rt={"speculative_tokens": 4, "speculative_ngram": 2})
    base, _ = run(cfg, params, scan=False)
    scan, eng = run(cfg, params, scan=True, **rt)
    assert scan == base
    assert eng.spec_steps > 0


def test_stack_rejects_mixed_depth_precision():
    cfg = tiny_llama_config(num_layers=3)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(
        mode=QuantMode.INT8, skip_layers=("layers/1",)))
    with pytest.raises(ValueError):
        stack_layer_params(qp)


def test_scan_paged_rejected():
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, scan_layers=True)
    with pytest.raises(ValueError):
        InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                        kv_layout="paged")


class TestScanMesh:
    """scan-over-layers composed with TP / DP / EP sharding (virtual mesh)."""

    def _ref_and_cfg(self, make_cfg, key=0, **cfg_kw):
        cfg = make_cfg(num_layers=3, max_seq_len=64, **cfg_kw)
        params = init_params(cfg, jax.random.PRNGKey(key), dtype=jnp.float32)
        ref, _ = run(cfg, params, scan=False)
        return cfg, params, ref

    def _run_mesh(self, cfg, params, mesh_cfg):
        from deeppowers_tpu.config import MeshConfig
        from deeppowers_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(MeshConfig(**mesh_cfg))
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=cfg.max_seq_len,
                           prefill_buckets=(16, 32), scan_layers=True)
        eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, mesh=mesh)
        return [r.token_ids for r in eng.generate_batch(PROMPTS, GEN)]

    def test_scan_tp(self):
        cfg, params, ref = self._ref_and_cfg(tiny_llama_config)
        assert self._run_mesh(cfg, params, {"model": 2}) == ref

    def test_scan_dp(self):
        cfg, params, ref = self._ref_and_cfg(tiny_llama_config, key=1)
        assert self._run_mesh(cfg, params, {"data": 2}) == ref

    def test_scan_dp_tp(self):
        cfg, params, ref = self._ref_and_cfg(tiny_llama_config, key=2)
        assert self._run_mesh(cfg, params, {"data": 2, "model": 2}) == ref

    def test_scan_ep_moe(self):
        cfg, params, ref = self._ref_and_cfg(tiny_moe_config, key=3)
        assert self._run_mesh(cfg, params, {"expert": 4}) == ref

    def test_scan_tp_quantized(self):
        cfg = tiny_llama_config(num_layers=3, max_seq_len=64)
        params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
        qp = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
        ref, _ = run(cfg, qp, scan=False)
        assert self._run_mesh(cfg, qp, {"model": 2}) == ref
