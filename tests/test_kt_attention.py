"""Chunk-transposed (kt) decode attention: kernel exactness + mirror
maintenance (ops/pallas/decode_attention.decode_attention_kt,
runtime/kvcache.py kt plumbing).

The kt layout stores K both row-major (source of truth) and as transposed
128-position chunks; the kernel reads live context at 128-row granularity
and flushes completed chunks itself. These tests run the kernel in
interpret mode on CPU against the head-folded kernel / XLA references.
Reference behavior anchor: KV consumption in the reference decode loop,
/root/reference/src/core/execution/models/gpt_model.cpp:362-430.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.models import transformer as tfm
from deeppowers_tpu.models.transformer import (TransformerConfig,
                                               forward_decode,
                                               forward_prefill, forward_verify,
                                               init_params, quantize_params)
from deeppowers_tpu.config import QuantConfig, QuantMode
from deeppowers_tpu.ops.pallas.decode_attention import (decode_attention_kt,
                                                        decode_attention_mxu,
                                                        verify_attention_kt,
                                                        verify_attention_mxu)
from deeppowers_tpu.runtime import kvcache


def _mk(b, kh, d, s, v_bits, key=0, h=None):
    h = h or kh
    keys = jax.random.split(jax.random.PRNGKey(key), 6)
    f = kh * d
    fv = f // 2 if v_bits == 4 else f
    k = jax.random.randint(keys[0], (b, s, f), -127, 128, jnp.int8)
    v = jax.random.randint(keys[1], (b, s, fv), -127, 128, jnp.int8)
    ks = jax.random.uniform(keys[2], (b, kh, s), jnp.float32, 0.01, 0.03)
    vs_rows = 2 * kh if v_bits == 4 else kh
    vs = jax.random.uniform(keys[3], (b, vs_rows, s), jnp.float32, 0.01, 0.03)
    q = jax.random.normal(keys[4], (b, h, d), jnp.bfloat16)
    kt = jnp.swapaxes(k.reshape(b, s // 128, 128, f), 2, 3)
    return q, k, kt, v, ks, vs


def _close(a, b, tol=2e-2):
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))
    assert diff < tol, f"max diff {diff}"


@pytest.mark.parametrize("v_bits", [8, 4])
@pytest.mark.parametrize("lengths", [[130, 500], [1, 128]])
def test_kt_matches_folded_kernel(v_bits, lengths):
    b, kh, d, s = 2, 2, 128, 512
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, v_bits)
    ln = jnp.asarray(lengths, jnp.int32)
    out, _ = decode_attention_kt(q, kt, k, v, ln, ks, vs, v_bits=v_bits)
    ref = decode_attention_mxu(
        q, k.reshape(b, s, kh, d),
        v.reshape(b, s, kh, d // 2 if v_bits == 4 else d), ln, ks, vs,
        kv_bits=8, v_bits=4 if v_bits == 4 else 0, int8_dots=False)
    _close(out, ref)


def test_kt_gqa_rep4():
    b, kh, d, s = 2, 2, 128, 256
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, 8, h=8)      # rep = 4
    ln = jnp.asarray([100, 250], jnp.int32)
    out, _ = decode_attention_kt(q, kt, k, v, ln, ks, vs, v_bits=8)
    ref = decode_attention_mxu(q, k.reshape(b, s, kh, d),
                               v.reshape(b, s, kh, d), ln, ks, vs,
                               kv_bits=8, int8_dots=False)
    _close(out, ref)


def test_kt_zero_length_slot():
    b, kh, d, s = 2, 2, 128, 256
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, 8)
    ln = jnp.asarray([0, 200], jnp.int32)
    out, _ = decode_attention_kt(q, kt, k, v, ln, ks, vs, v_bits=8)
    assert bool(jnp.all(out[0] == 0))
    ref = decode_attention_mxu(q, k.reshape(b, s, kh, d),
                               v.reshape(b, s, kh, d), ln, ks, vs,
                               kv_bits=8, int8_dots=False)
    _close(out[1:], ref[1:])


def test_kt_verify_window():
    b, kh, d, s, t = 2, 2, 128, 256, 3
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, 4)
    qw = jax.random.normal(jax.random.PRNGKey(9), (b, t, kh, d), jnp.bfloat16)
    cached = jnp.asarray([126, 200], jnp.int32)          # first crosses 128
    out, kt_new = verify_attention_kt(qw, kt, k, v, cached, ks, vs, v_bits=4)
    # compare against the bf16-dot folded kernel (the only existing k8v4
    # multi-token reference — verify_attention_mxu has no v_bits)
    from deeppowers_tpu.ops.pallas.decode_attention import (_fold_tokens,
                                                            _unfold_tokens)
    ref2 = decode_attention_mxu(
        _fold_tokens(qw), k.reshape(b, s, kh, d), v.reshape(b, s, kh, d // 2),
        cached + t, ks, vs, kv_bits=8, v_bits=4, tokens=t, int8_dots=False)
    _close(out, _unfold_tokens(ref2, t))
    # the window crossed 128 for slot 0: chunk 0 must be flushed
    assert bool(jnp.all(kt_new[0, 0] == kt[0, 0]))


def test_kt_flush_self_heals_stale_chunk():
    """A stale mirror chunk is re-flushed from k on the crossing step and
    never read before that (the copy_prefix / rejected-window scenario)."""
    b, kh, d, s = 1, 2, 128, 256
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, 8)
    kt_stale = kt.at[:, 0].set(0)                        # chunk 0 stale
    # cached = 127 -> this decode step has length 128: reader bound
    # full = 127 // 128 = 0 chunks (stale chunk NOT read), tail covers
    # [0, 128) and the flush rewrites chunk 0 from k
    ln = jnp.asarray([128], jnp.int32)
    out, kt_new = decode_attention_kt(q, kt_stale, k, v, ln, ks, vs,
                                      v_bits=8)
    ref = decode_attention_mxu(q, k.reshape(b, s, kh, d),
                               v.reshape(b, s, kh, d), ln, ks, vs,
                               kv_bits=8, int8_dots=False)
    _close(out, ref)
    assert bool(jnp.all(kt_new[0, 0] == kt[0, 0]))       # healed
    # next step (cached 128) reads the healed chunk: exact again
    out2, _ = decode_attention_kt(q, kt_new, k, v, ln + 1, ks, vs, v_bits=8)
    ref2 = decode_attention_mxu(q, k.reshape(b, s, kh, d),
                                v.reshape(b, s, kh, d), ln + 1, ks, vs,
                                kv_bits=8, int8_dots=False)
    _close(out2, ref2)


# ---------------------------------------------------------------- cache ops

def _cfg():
    return TransformerConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=128, max_seq_len=512)


def _caches(cfg, batch, s, dtype_name, kv_kt):
    return kvcache.init_cache(cfg.num_layers, batch, s, cfg.kv_heads,
                              cfg.dim_head, kv_cache_dtype=dtype_name,
                              kv_kt=kv_kt)


@pytest.mark.parametrize("dtype_name", ["k8v4"])
def test_forward_decode_kt_matches_plain(dtype_name):
    # k8v4 covers the superset paths (int8 K + packed V); the plain-int8
    # kernel body is pinned by the parametrized kernel-level tests above
    """End-to-end: N decode steps over a 128-boundary, kt caches vs plain
    caches — logits must agree (same quantization; only the attention
    kernel differs)."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    batch, s = 2, 256
    ca = _caches(cfg, batch, s, dtype_name, kv_kt=True)
    cb = _caches(cfg, batch, s, dtype_name, kv_kt=False)
    assert ca[0].kt is not None and cb[0].kt is None
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 126), 0, 128)
    lengths = jnp.asarray([126, 100], jnp.int32)
    _, kv = forward_prefill(params, cfg, prompt, lengths)
    for i, (k, v) in enumerate(kv):
        for slot in range(batch):
            ca = (*ca[:i], kvcache.write_prompt(ca[i], k[slot], v[slot],
                                                slot), *ca[i + 1:])
            cb = (*cb[:i], kvcache.write_prompt(cb[i], k[slot], v[slot],
                                                slot), *cb[i + 1:])
    toks = jnp.asarray([5, 7], jnp.int32)
    for step in range(4):                                # crosses 128
        la, ca = forward_decode(params, cfg, toks, ca, lengths + step)
        lb, cb = forward_decode(params, cfg, toks, cb, lengths + step)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-2, rtol=2e-2)
        toks = jnp.argmax(la, axis=-1).astype(jnp.int32)


def test_forward_verify_kt_matches_plain():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    batch, s, t = 2, 256, 3
    ca = _caches(cfg, batch, s, "k8v4", kv_kt=True)
    cb = _caches(cfg, batch, s, "k8v4", kv_kt=False)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 127), 0, 128)
    lengths = jnp.asarray([127, 90], jnp.int32)
    _, kv = forward_prefill(params, cfg, prompt, lengths)
    for i, (k, v) in enumerate(kv):
        for slot in range(batch):
            ca = (*ca[:i], kvcache.write_prompt(ca[i], k[slot], v[slot],
                                                slot), *ca[i + 1:])
            cb = (*cb[:i], kvcache.write_prompt(cb[i], k[slot], v[slot],
                                                slot), *cb[i + 1:])
    win = jnp.asarray([[3, 9, 11], [4, 8, 12]], jnp.int32)
    la, ca = forward_verify(params, cfg, win, ca, lengths)
    lb, cb = forward_verify(params, cfg, win, cb, lengths)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               atol=2e-2, rtol=2e-2)
    # continue decoding after the (partially accepted) window: slot 0
    # accepted 1 token -> cached 128 (boundary); mirror must self-heal
    la2, ca = forward_decode(params, cfg, win[:, 0], ca, lengths + 1)
    lb2, cb = forward_decode(params, cfg, win[:, 0], cb, lengths + 1)
    np.testing.assert_allclose(np.asarray(la2), np.asarray(lb2),
                               atol=2e-2, rtol=2e-2)


def test_write_chunk_maintains_mirror():
    """Arbitrary-offset chunk writes (chunked prefill / prefix suffixes)
    re-derive the touched kt chunks from k."""
    cfg = _cfg()
    batch, s = 2, 512
    (cache,) = _caches(cfg, batch, s, "int8", kv_kt=True)[:1]
    kh, d = cfg.kv_heads, cfg.dim_head
    rows = jax.random.normal(jax.random.PRNGKey(3), (200, kh, d),
                             jnp.float32)
    cache = kvcache.write_chunk(cache, rows[:130], rows[:130] * 0.5, 0, 0)
    cache = kvcache.write_chunk(cache, rows[130:], rows[130:] * 0.5, 0, 130)
    # mirror chunks must equal the transpose of the row-major store
    f = kh * d
    want = jnp.swapaxes(cache.k.reshape(batch, s // 128, 128, f), 2, 3)
    got = cache.kt
    assert bool(jnp.all(want[0, :2] == got[0, :2]))      # covered chunks


def test_copy_prefix_kt_self_heals():
    """copy_prefix copies the mirror masked; the boundary chunk self-heals
    via the kernel flush before it becomes readable."""
    b, kh, d, s = 2, 2, 128, 256
    q, k, kt, v, ks, vs = _mk(b, kh, d, s, 8)
    cache = kvcache.LayerKVCache(k=k, v=v, k_scale=ks, v_scale=vs,
                                 head_width=d, kt=kt)
    n = jnp.asarray(130, jnp.int32)
    cache2 = kvcache.copy_prefix(cache, 0, 1, n)
    # rows < n copied exactly in k and in the mirror
    assert bool(jnp.all(cache2.k[1, :130] == k[0, :130]))
    assert bool(jnp.all(cache2.kt[1, 0] == kt[0, 0]))
    # attention over the copied prefix (reader bound: chunk 0 only + tail)
    qq = q[:1]
    out, _ = decode_attention_kt(qq, cache2.kt[1:], cache2.k[1:],
                                 cache2.v[1:], jnp.asarray([130], jnp.int32),
                                 cache2.k_scale[1:], cache2.v_scale[1:],
                                 v_bits=8)
    ref = decode_attention_mxu(
        qq, cache2.k[1:].reshape(1, s, kh, d),
        cache2.v[1:].reshape(1, s, kh, d), jnp.asarray([130], jnp.int32),
        cache2.k_scale[1:], cache2.v_scale[1:], kv_bits=8, int8_dots=False)
    _close(out, ref)
