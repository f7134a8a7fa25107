"""GPTQ (Hessian-compensated quantization, quant/gptq.py).

The acceptance spec is layer-OUTPUT error, not weight error: GPTQ minimizes
||XW - XQ||^2 using the calibration inputs' second moments, so on
correlated inputs it must beat round-to-nearest at equal bit-width
(reference left its quantization-accuracy test as a TODO metric,
reference: tests/test_quantization.cpp:70-94)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import QuantConfig, QuantMode
from deeppowers_tpu.models.presets import tiny_llama_config
from deeppowers_tpu.models.transformer import init_params, quantize_params
from deeppowers_tpu.quant.gptq import collect_xtx, gptq_matrix, gptq_quantize
from deeppowers_tpu.quant.quantize import dequantize, quantize


def _correlated_inputs(rng, rows, k):
    """Low-rank-dominated inputs (like real activations)."""
    basis = rng.randn(8, k)
    x = rng.randn(rows, 8) @ basis + 0.05 * rng.randn(rows, k)
    return x.astype(np.float32)


@pytest.mark.parametrize("group_size", [0, 32])
def test_gptq_beats_rtn_on_output_error(group_size):
    rng = np.random.RandomState(0)
    k, n = 64, 48
    w = rng.randn(k, n).astype(np.float32) * 0.1
    x = _correlated_inputs(rng, 256, k)
    xtx = x.T @ x

    qt = gptq_matrix(w, xtx, bits=4, group_size=group_size)
    rtn = quantize(jnp.asarray(w), bits=4, group_size=group_size)

    err_gptq = np.linalg.norm(x @ np.asarray(dequantize(qt)) - x @ w)
    err_rtn = np.linalg.norm(x @ np.asarray(dequantize(rtn)) - x @ w)
    assert err_gptq < err_rtn * 0.9, (err_gptq, err_rtn)


def test_gptq_identity_hessian_matches_rtn_scales():
    """With uncorrelated (identity-Hessian) inputs and no propagation gain,
    GPTQ stays sane: finite codes, same packing/shape contract as RTN."""
    rng = np.random.RandomState(1)
    k, n = 32, 16
    w = rng.randn(k, n).astype(np.float32)
    qt = gptq_matrix(w, np.eye(k, dtype=np.float32) * 100.0, bits=4,
                     group_size=16)
    rtn = quantize(jnp.asarray(w), bits=4, group_size=16)
    assert qt.data.shape == rtn.data.shape
    assert qt.scales.shape == rtn.scales.shape
    assert np.isfinite(np.asarray(dequantize(qt))).all()


def test_gptq_quantize_model_end_to_end():
    """Whole-model GPTQ: produces QuantizedTensors the normal forward
    consumes, and calibration-set NLL beats RTN at int4 g32."""
    from deeppowers_tpu.runtime.evaluate import perplexity

    cfg = tiny_llama_config(vocab_size=64, hidden_size=64, num_layers=2,
                            intermediate_size=128, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.RandomState(2)
    seqs = [rng.randint(2, 64, size=(48,)).tolist() for _ in range(6)]

    qcfg = QuantConfig(mode=QuantMode.INT4, group_size=32)
    qp = gptq_quantize(params, cfg, seqs[:3], qcfg)
    ppl_gptq = perplexity(qp, cfg, seqs, dtype=jnp.float32)
    ppl_rtn = perplexity(quantize_params(params, qcfg), cfg, seqs,
                         dtype=jnp.float32)
    ppl_ref = perplexity(params, cfg, seqs, dtype=jnp.float32)
    assert np.isfinite(ppl_gptq)
    # random-init weights give noise-level deltas either direction (RTN can
    # even "beat" fp here); the correctness signal is the matrix-level
    # output-error test above and the trained-weights gate in
    # docs/benchmarks.md — this asserts the full pipeline stays sane
    assert abs(ppl_gptq - ppl_ref) <= abs(ppl_rtn - ppl_ref) + 0.5, \
        (ppl_gptq, ppl_rtn, ppl_ref)


def test_gptq_w4a8_flag_propagates():
    cfg = tiny_llama_config(vocab_size=64, hidden_size=64, num_layers=1,
                            intermediate_size=128, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qcfg = QuantConfig(mode=QuantMode.INT4, group_size=32, act_bits=8)
    qp = gptq_quantize(params, cfg, [[1, 2, 3, 4]], qcfg)
    qt = qp["layers"][0]["attn"]["wq"]["w"]
    assert qt.bits == 4 and qt.act_bits == 8


def test_gptq_moe_experts():
    """MoE layers: each expert quantizes against its routed-token Hessian;
    the full model still forwards and beats/NE-matches RTN on output error
    (BASELINE config 5 quality path)."""
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import forward_prefill
    from deeppowers_tpu.quant.quantize import dequantize_stacked

    cfg = tiny_moe_config(vocab_size=64, max_seq_len=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.RandomState(3)
    seqs = [rng.randint(2, 64, size=(32,)).tolist() for _ in range(4)]
    qcfg = QuantConfig(mode=QuantMode.INT4, group_size=32)

    qp = gptq_quantize(params, cfg, seqs[:2], qcfg)
    moe_q = qp["layers"][0]["moe"]["experts"]["w_in"]["w"]
    assert moe_q.bits == 4 and moe_q.data.ndim == 3       # stacked experts
    # expert scales differ per slice (per-expert quantization happened)
    s = np.asarray(moe_q.scales)
    assert s.shape[0] == cfg.num_experts
    assert not np.allclose(s[0], s[1])

    ids = jnp.asarray([seqs[0]], jnp.int32)
    lens = jnp.asarray([len(seqs[0])], jnp.int32)
    ref, _ = forward_prefill(params, cfg, ids, lens, dtype=jnp.float32)
    out, _ = forward_prefill(qp, cfg, ids, lens, dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    rtn = quantize_params(params, qcfg)
    out_rtn, _ = forward_prefill(rtn, cfg, ids, lens, dtype=jnp.float32)
    err_gptq = float(jnp.mean((out - ref) ** 2))
    err_rtn = float(jnp.mean((out_rtn - ref) ** 2))
    # random-init: GPTQ must not be meaningfully worse than RTN end-to-end
    assert err_gptq <= err_rtn * 1.5, (err_gptq, err_rtn)
