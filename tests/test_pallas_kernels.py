"""Pallas kernel numerical golden tests vs the jnp reference path.

Runs in interpreter mode on the CPU test platform (the kernels detect
non-TPU backends); the same code compiles via Mosaic on TPU — verified on
a v5e chip (rel err <= 0.3% = bf16 MXU rounding; exact for pre-scaled
group modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.ops.matmul import quantized_matmul
from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul
from deeppowers_tpu.quant import dequantize, quantize


def rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * scale)


CASES = [
    # (bits, group_size, K, N) — covers post/pre scale modes and edge-N blocks
    (8, 0, 512, 512),
    (8, 256, 512, 512),
    (8, 128, 1024, 640),     # pre-scale int8, non-divisible N
    (4, 0, 512, 512),
    (4, 256, 1024, 512),
    (4, 128, 1024, 640),
]


@pytest.mark.parametrize("bits,gs,k,n", CASES)
def test_dequant_matmul_matches_reference(bits, gs, k, n):
    w = rand((k, n), seed=1, scale=0.05)
    x = rand((24, k), seed=2)
    qw = quantize(w, bits=bits, group_size=gs)
    ref = np.asarray(x @ dequantize(qw))
    out = np.asarray(dequant_matmul(x, qw, out_dtype=jnp.float32,
                                    block_n=256, block_k=256))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, f"rel err {rel}"


def test_int4_ragged_whole_plane_default():
    """Ragged K (keff % 2048 != 0): _resolve_blocks picks bk = keff (the
    whole nibble plane, zero pad DMA — measured 472 -> 689 GB/s on the 7B
    w_out shape, round 4). The default-resolved path must stay exact vs the
    dequantized reference, including W4A8."""
    import dataclasses

    from deeppowers_tpu.ops.pallas.dequant_matmul import _resolve_blocks

    k, n = 768, 384                       # keff = 384 = 3*128, not 2048-mult
    w = rand((k, n), seed=11, scale=0.05)
    x = rand((8, k), seed=12)
    qw = quantize(w, bits=4, group_size=128)
    assert _resolve_blocks(qw, 1024, 1024) == (1024, 384)
    ref = np.asarray(x @ dequantize(qw))
    out = np.asarray(dequant_matmul(x, qw, out_dtype=jnp.float32))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, f"rel err {rel}"
    qa8 = dataclasses.replace(qw, act_bits=8)
    out8 = np.asarray(dequant_matmul(x, qa8, out_dtype=jnp.float32))
    rel8 = np.abs(out8 - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel8 < 0.05, f"a8 rel err {rel8}"


def test_int4_aligned_keeps_bk2048():
    from deeppowers_tpu.ops.pallas.dequant_matmul import _resolve_blocks
    qw = quantize(rand((8192, 256), seed=13, scale=0.05), bits=4,
                  group_size=128)
    assert _resolve_blocks(qw, 1024, 1024) == (1024, 2048)


@pytest.mark.parametrize("mode", ["grouped", "scale"])
def test_int4_pre_scale_modes_match(mode):
    # g=128 with block_k=256 forces the pre-scale path (g | bk); both
    # in-block strategies must agree with the dequantized reference
    w = rand((1024, 640), seed=7, scale=0.05)
    x = rand((16, 1024), seed=8)
    qw = quantize(w, bits=4, group_size=128)
    ref = np.asarray(x @ dequantize(qw))
    out = np.asarray(dequant_matmul(x, qw, out_dtype=jnp.float32,
                                    block_n=256, block_k=256, int4_mode=mode))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, f"{mode}: rel err {rel}"


def test_tuned_blocks_resolve_outside_jit(monkeypatch):
    # tuned block sizes must be resolved in the un-jitted wrapper (static
    # jit key), not read from the table inside jitted _dispatch — a later
    # set_dqmm_blocks would otherwise be silently ignored by the cached
    # jaxpr
    from deeppowers_tpu.ops.pallas import dequant_matmul as dq
    monkeypatch.setattr(dq, "_DQMM_BLOCKS", {})
    qw = quantize(rand((512, 512), seed=9, scale=0.05), bits=8)
    assert dq._resolve_blocks(qw, 1024, 1024) == (1024, 1024)
    dq.set_dqmm_blocks(512, 512, 8, 256, 512)
    assert dq._resolve_blocks(qw, 1024, 1024) == (256, 512)
    # explicit caller choices always win over the table
    assert dq._resolve_blocks(qw, 512, 256) == (512, 256)
    # and the tuned sizes produce correct numerics end to end
    x = rand((8, 512), seed=10)
    out = np.asarray(dequant_matmul(x, qw, out_dtype=jnp.float32))
    ref = np.asarray(x @ dequantize(qw))
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9) < 0.01


def test_dequant_matmul_3d_input():
    qw = quantize(rand((512, 512), seed=3, scale=0.05), bits=8)
    x = rand((2, 7, 512), seed=4)
    out = dequant_matmul(x, qw, out_dtype=jnp.float32,
                         block_n=256, block_k=256)
    assert out.shape == (2, 7, 512)
    ref = np.asarray(x.reshape(-1, 512) @ dequantize(qw)).reshape(2, 7, 512)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_dispatch_prefers_pallas_when_forced():
    qw = quantize(rand((512, 512), seed=5, scale=0.05), bits=4, group_size=128)
    x = rand((8, 512), seed=6)
    out_pallas = quantized_matmul(x, qw, out_dtype=jnp.float32,
                                  prefer_pallas=True)
    out_xla = quantized_matmul(x, qw, out_dtype=jnp.float32,
                               prefer_pallas=False)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=0.02, atol=0.02)


def test_asymmetric_raises_in_kernel():
    qw = quantize(rand((512, 512), scale=0.05), bits=8, symmetric=False)
    with pytest.raises(NotImplementedError):
        dequant_matmul(rand((8, 512)), qw)


FUSED_CASES = [
    # (bits, group_size) — post- and pre-scale modes, both packings
    (8, 0),
    (8, 128),
    (4, 0),
    (4, 128),
]


@pytest.mark.parametrize("bits,gs", FUSED_CASES)
def test_fused_rms_matmul(bits, gs):
    from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul_fused
    k, n = 512, 512
    w = rand((k, n), seed=11, scale=0.05)
    x = rand((8, k), seed=12)
    g = rand((k,), seed=13, scale=0.2) + 1.0
    qw = quantize(w, bits=bits, group_size=gs)
    eps = 1e-6
    xf = np.asarray(x, np.float32)
    rms = xf * (1.0 / np.sqrt((xf * xf).mean(-1, keepdims=True) + eps))
    ref = (rms * np.asarray(g)) @ np.asarray(dequantize(qw))
    out = np.asarray(dequant_matmul_fused(
        x, qw, rms_weight=g, rms_eps=eps, out_dtype=jnp.float32,
        block_n=256, block_k=256))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, f"rel err {rel}"


@pytest.mark.parametrize("bits,gs", FUSED_CASES)
def test_fused_glu_matmul_with_residual_bias(bits, gs):
    from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul_fused
    k, n = 512, 384
    w = rand((k, n), seed=21, scale=0.05)
    gu = rand((8, 2 * k), seed=22)
    res = rand((8, n), seed=23)
    bias = rand((n,), seed=24, scale=0.1)
    qw = quantize(w, bits=bits, group_size=gs)
    gate, up = np.split(np.asarray(gu, np.float32), 2, axis=-1)
    silu = gate / (1.0 + np.exp(-gate))
    ref = (silu * up) @ np.asarray(dequantize(qw)) + np.asarray(bias) \
        + np.asarray(res)
    out = np.asarray(dequant_matmul_fused(
        gu, qw, glu=True, residual=res, bias=bias, out_dtype=jnp.float32,
        block_n=256, block_k=256))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.01, f"rel err {rel}"


def test_fused_residual_only():
    from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul_fused
    k, n = 512, 512
    qw = quantize(rand((k, n), seed=31, scale=0.05), bits=8)
    x = rand((8, k), seed=32)
    res = rand((8, n), seed=33)
    ref = np.asarray(x) @ np.asarray(dequantize(qw)) + np.asarray(res)
    out = np.asarray(dequant_matmul_fused(
        x, qw, residual=res, out_dtype=jnp.float32, block_n=256, block_k=256))
    assert np.abs(out - ref).max() < 0.05


def test_fused_wrappers_match_fallback():
    """ops.matmul wrappers: Pallas-forced result == XLA fallback result."""
    from deeppowers_tpu.ops.matmul import (glu_matmul, matmul_residual,
                                           rms_matmul)
    k, n = 512, 512
    qw = quantize(rand((k, n), seed=41, scale=0.05), bits=4, group_size=128)
    x = rand((8, k), seed=42).astype(jnp.float32)
    g = rand((k,), seed=43, scale=0.2) + 1.0
    res = rand((8, n), seed=44)
    got = rms_matmul(x, g, qw, out_dtype=jnp.float32)
    from deeppowers_tpu.ops.normalization import rms_norm
    from deeppowers_tpu.ops.matmul import quantized_matmul
    want = quantized_matmul(rms_norm(x, g), qw, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.03, atol=0.03)
    gu = rand((8, 2 * k), seed=45)
    got = glu_matmul(gu, qw, residual=res, out_dtype=jnp.float32)
    gate, up = jnp.split(gu, 2, axis=-1)
    want = quantized_matmul(jax.nn.silu(gate) * up, qw,
                            out_dtype=jnp.float32) + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.03, atol=0.03)
    got = matmul_residual(x, qw, res, out_dtype=jnp.float32)
    want = quantized_matmul(x, qw, out_dtype=jnp.float32) + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.03, atol=0.03)


def test_flash_attention_non_divisible_s():
    """Padding path: S not a multiple of the block size."""
    from deeppowers_tpu.ops.attention import attention_prefill
    from deeppowers_tpu.ops.pallas.flash_attention import (
        flash_attention_prefill)
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 600, 4, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    lens = jnp.asarray([600, 431], jnp.int32)
    ref = attention_prefill(q, k, v, lengths=lens, use_flash=False)
    out = flash_attention_prefill(q, k, v, lens, block_q=256, block_k=256)
    valid0 = np.asarray(ref[0])
    np.testing.assert_allclose(np.asarray(out[0]), valid0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[1, :431]),
                               np.asarray(ref[1, :431]), atol=2e-3)


def test_flash_attention_gqa_unrepeated():
    """GQA: unrepeated K/V via kernel index mapping == repeated reference."""
    from deeppowers_tpu.ops.attention import attention_prefill
    from deeppowers_tpu.ops.pallas.flash_attention import (
        flash_attention_prefill)
    rng = np.random.default_rng(7)
    b, s, h, kh, d = 2, 512, 8, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
    lens = jnp.asarray([512, 300], jnp.int32)
    ref = attention_prefill(q, k, v, lengths=lens, use_flash=False)
    out = flash_attention_prefill(q, k, v, lens, block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[1, :300]),
                               np.asarray(ref[1, :300]), atol=2e-3)


@pytest.mark.parametrize("bits,group", [(4, 0), (4, 128), (8, 0), (8, 128)])
def test_act_i8_kernel_close_to_fp(bits, group):
    """In-kernel W4A8/W8A8 (per-row-per-block int8 activations -> int8 MXU
    dots) vs the fp reference — the added activation-quant error must stay
    small (per-group dynamic scales)."""
    import dataclasses
    from deeppowers_tpu.ops.pallas.dequant_matmul import dequant_matmul
    from deeppowers_tpu.quant.quantize import dequantize, quantize

    rng = np.random.RandomState(1)
    k, n, m = 512, 256, 16
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(jnp.bfloat16)
    qw = quantize(w, bits=bits, group_size=group)
    ref = np.asarray(
        jnp.dot(x.astype(jnp.float32), dequantize(qw, jnp.float32)))
    qa = dataclasses.replace(qw, act_bits=8)
    out = np.asarray(dequant_matmul(x, qa, out_dtype=jnp.float32))
    scale = np.abs(ref).max() + 1e-9
    err = np.abs(out - ref).max() / scale
    assert err < 0.02, err


@pytest.mark.parametrize("bits,gs,a8", [(8, 0, False), (4, 128, False),
                                        (4, 128, True), (8, 128, False)])
def test_grouped_dequant_matmul_matches_reference(bits, gs, a8):
    """MoE grouped kernel: expert-sorted bm-aligned rows against stacked
    packed experts, weight/scale blocks picked per row-tile via scalar
    prefetch. Must match per-expert dense dequant matmuls."""
    import dataclasses

    from deeppowers_tpu.ops.pallas.dequant_matmul import grouped_dequant_matmul
    from deeppowers_tpu.quant.quantize import dequantize_stacked, quantize_stacked

    e, k, n, bm = 4, 512, 384, 32
    rng = np.random.default_rng(3)
    w3 = jnp.asarray(rng.standard_normal((e, k, n), dtype=np.float32) * 0.05)
    qw = quantize_stacked(w3, bits=bits, group_size=gs)
    if a8:
        qw = dataclasses.replace(qw, act_bits=8)
    # ragged per-expert row counts, padded to bm tiles
    counts = [5, 0, 47, 33]
    xs_rows, tile_expert, row_expert = [], [], []
    for ei, c in enumerate(counts):
        pad = (-c) % bm
        xs_rows.append(rng.standard_normal((c, k), dtype=np.float32))
        xs_rows.append(np.zeros((pad, k), dtype=np.float32))
        tile_expert += [ei] * ((c + pad) // bm)
        row_expert += [ei] * c + [-1] * pad
    xs = jnp.asarray(np.concatenate(xs_rows)).astype(jnp.bfloat16)
    te = jnp.asarray(tile_expert, dtype=jnp.int32)

    out = np.asarray(grouped_dequant_matmul(
        xs, qw, te, out_dtype=jnp.float32, block_m=bm, block_n=256,
        block_k=256))
    wd = np.asarray(dequantize_stacked(qw, jnp.float32))
    xf = np.asarray(xs.astype(jnp.float32))
    for r, ei in enumerate(row_expert):
        if ei < 0:
            continue
        ref = xf[r] @ wd[ei]
        err = np.abs(out[r] - ref).max() / (np.abs(ref).max() + 1e-9)
        tol = 0.06 if a8 else 0.01
        assert err < tol, (r, ei, err)


def test_moe_grouped_cat_matches_cat_path():
    """Prefill grouped MoE over the cat-fused storage (routed pairs only,
    packed weights, zero materialization) must match the dense-combine cat
    path; also pins the shared layout invariant (per-expert w_out packing +
    plane-major cat scales + stacked-order scales view)."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.presets import tiny_moe_config
    from deeppowers_tpu.models.transformer import (_moe, _moe_grouped_cat,
                                                   fuse_params, init_params,
                                                   quantize_params)

    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    flayer = fuse_params(qp, cfg, tp=1, fuse_moe=True)["layers"][0]["moe"]
    assert "w_out_scales_stacked" in flayer["experts_cat"]
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (300, cfg.hidden_size), dtype=np.float32))
    ref = np.asarray(_moe(x, flayer, cfg))
    out = np.asarray(_moe_grouped_cat(x, flayer, cfg))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel
