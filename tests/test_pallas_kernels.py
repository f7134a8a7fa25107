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
