"""Decode-attention variants: scale-folded quantized path and the Pallas
kernel (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.ops.attention import (
    attention_decode,
    attention_decode_quantized,
)
from deeppowers_tpu.ops.pallas.decode_attention import (
    decode_attention_kernel,
    decode_attention_mxu,
)
from deeppowers_tpu.runtime import kvcache


def _setup(B=4, S=64, Kh=2, rep=2, D=16, seed=0):
    rng = np.random.default_rng(seed)
    H = Kh * rep
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.float32)
    ci = kvcache.init_cache(1, B, S, Kh, D, kv_cache_dtype="int8")[0]
    kraw = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vraw = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    for b in range(B):
        ci = kvcache.write_prompt(ci, kraw[b], vraw[b], b)
    lens = jnp.asarray(rng.integers(1, S + 1, (B,)), dtype=jnp.int32)
    return q, ci, lens


def test_scale_folded_matches_dequantized():
    q, ci, lens = _setup()
    kd, vd = kvcache.read(ci, jnp.float32)
    ref = attention_decode(q, kd, vd, lens)
    kq, vq, ks, vs = kvcache.read_raw(ci)
    out = attention_decode_quantized(q, kq, vq, ks, vs, lens)
    # bf16 dots in the folded path vs f32 reference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_kernel_bf16_matches_reference():
    rng = np.random.default_rng(1)
    B, S, Kh, rep, D = 2, 64, 2, 2, 16
    H = Kh * rep
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    lens = jnp.array([64, 30], dtype=jnp.int32)
    ref = attention_decode(q, kc, vc, lens)
    out = decode_attention_kernel(q, kc, vc, lens, block_s=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.01, atol=0.01)


def test_kernel_int8_matches_reference():
    q, ci, lens = _setup(seed=2)
    kd, vd = kvcache.read(ci, jnp.float32)
    ref = attention_decode(q, kd, vd, lens)
    kq, vq, ks, vs = kvcache.read_raw(ci)
    out = decode_attention_kernel(q, kq, vq, lens, ks, vs, block_s=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.01, atol=0.01)


def test_mxu_kernel_bf16_matches_reference():
    rng = np.random.default_rng(3)
    B, S, Kh, rep, D = 2, 96, 2, 4, 16
    H = Kh * rep
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    lens = jnp.array([96, 41], dtype=jnp.int32)
    ref = attention_decode(q, kc, vc, lens)
    out = decode_attention_mxu(q, kc, vc, lens, block_s=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_mxu_kernel_int8_matches_reference():
    q, ci, lens = _setup(seed=4)
    kd, vd = kvcache.read(ci, jnp.float32)
    ref = attention_decode(q, kd, vd, lens)
    # bs == S exercises the full-block path; scale blocks are lane-tiled
    kq, vq, ks, vs = kvcache.read_raw(ci)
    out = decode_attention_mxu(q, kq, vq, lens, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_verify_mxu_kernel_matches_reference():
    from deeppowers_tpu.ops.attention import attention_verify
    from deeppowers_tpu.ops.pallas.decode_attention import (
        verify_attention_mxu)
    rng = np.random.default_rng(5)
    B, S, Kh, rep, D, T = 2, 96, 2, 4, 16, 3
    H = Kh * rep
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype=jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    lens = jnp.array([64, 41], dtype=jnp.int32)  # tokens BEFORE the window
    ref = attention_verify(q, kc, vc, lens)
    out = verify_attention_mxu(q, kc, vc, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_stacked_layer_kernel_matches_reference():
    from deeppowers_tpu.ops.attention import attention_decode
    from deeppowers_tpu.ops.pallas.decode_attention import (
        decode_attention_mxu)
    from deeppowers_tpu.runtime import kvcache_stacked
    rng = np.random.default_rng(6)
    B, S, Kh, rep, D, L = 2, 64, 2, 2, 16, 3
    H = Kh * rep
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.float32)
    sc = kvcache_stacked.init_cache(L, B, S, Kh, D, kv_cache_dtype="int8")
    for lyr in range(L):
        for b in range(B):
            kv = jnp.asarray(rng.standard_normal((S, Kh, D)),
                             dtype=jnp.float32) * (lyr + 1)
            sc = kvcache_stacked.write_chunk_layer(sc, lyr, kv, kv * 0.5,
                                                   b, 0)
    lens = jnp.array([64, 30], dtype=jnp.int32)
    lyr = jnp.int32(1)
    kd, vd = kvcache_stacked.read_layer(sc, lyr, jnp.float32)
    ref = attention_decode(q, kd, vd, lens)
    out = decode_attention_mxu(q, sc.k, sc.v, lens, sc.k_scale, sc.v_scale,
                               layer=lyr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.03, atol=0.03)


def test_int4_kv_mxu_kernel_matches_reference():
    from deeppowers_tpu.ops.attention import attention_verify
    from deeppowers_tpu.ops.pallas.decode_attention import (
        verify_attention_mxu)
    rng = np.random.default_rng(8)
    B, S, Kh, rep, D, T = 2, 64, 2, 4, 32, 3
    H = Kh * rep
    ci = kvcache.init_cache(1, B, S, Kh, D, kv_cache_dtype="int4")[0]
    kraw = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    vraw = jnp.asarray(rng.standard_normal((B, S, Kh, D)), dtype=jnp.float32)
    for b in range(B):
        ci = kvcache.write_prompt(ci, kraw[b], vraw[b], b)
    lens = jnp.array([64, 30], dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.float32)
    kd, vd = kvcache.read(ci, jnp.float32)
    ref = attention_decode(q, kd, vd, lens)
    kq, vq, ks, vs = kvcache.read_raw(ci)
    out = decode_attention_mxu(q, kq, vq, lens, ks, vs, kv_bits=4,
                               block_s=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)
    # verify window over the packed cache
    qv = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype=jnp.float32)
    lens2 = jnp.array([40, 20], dtype=jnp.int32)
    refv = attention_verify(qv, kd, vd, lens2)
    outv = verify_attention_mxu(qv, kq, vq, lens2, ks, vs, kv_bits=4)
    np.testing.assert_allclose(np.asarray(outv), np.asarray(refv),
                               rtol=0.02, atol=0.02)
