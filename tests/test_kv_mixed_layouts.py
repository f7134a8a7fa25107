"""Mixed/low-bit KV modes across cache layouts (VERDICT r4 item 4).

Round 4 left the quality-gated KV modes (k8v4 mixed, half-scale int4)
contiguous-only; the paged and stacked layouts now run them too. These
tests pin: (a) the paged table-walking kernel against the contiguous
folded kernel for every mode, (b) engine-level greedy-token equality of
paged/stacked vs contiguous at the same quantization grid, (c) pool
write/append round-trips with per-side packing.
Reference anchor: the KV compression intent the reference left half-built
(/root/reference/src/core/execution/models/gpt_model.cpp:532-545).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime import kvcache, kvcache_paged
from deeppowers_tpu.runtime.engine import GenerationConfig, InferenceEngine
from deeppowers_tpu.ops.pallas.decode_attention import (
    decode_attention_mxu, decode_attention_paged_mxu)

GREEDY = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)
RT = RuntimeConfig(scan_layers=False, kv_page_size=16)


def _mk_pool(b, kh, d, s, page, kv_dtype, key=0):
    """Random paged cache + the matching contiguous arrays."""
    rng = np.random.RandomState(key)
    (cache,) = kvcache_paged.init_paged_cache(
        1, b, s, kh, d, page_size=page, kv_cache_dtype=kv_dtype)
    table = np.zeros((b, s // page), np.int32)
    pid = 1
    for slot in range(b):
        for vp in range(s // page):
            table[slot, vp] = pid
            pid += 1
    cache = kvcache_paged.with_table((cache,), jnp.asarray(table))[0]
    rows = rng.randn(b, s, kh, d).astype(np.float32)
    for slot in range(b):
        cache = kvcache_paged.write_chunk(
            cache, jnp.asarray(rows[slot]), jnp.asarray(rows[slot] * 0.5),
            slot, 0)
    # contiguous twin with the identical quantization grid
    (cc,) = kvcache.init_cache(1, b, s, kh, d, kv_cache_dtype=kv_dtype)
    cc = kvcache.write_prompts(cc, jnp.asarray(rows),
                               jnp.asarray(rows * 0.5),
                               jnp.arange(b, dtype=jnp.int32))
    return cache, cc


@pytest.mark.parametrize("kv_dtype", ["int8", "int4", "k8v4"])
def test_paged_kernel_matches_contiguous_kernel(kv_dtype):
    b, kh, d, s, page = 2, 2, 128, 256, 128
    pc, cc = _mk_pool(b, kh, d, s, page, kv_dtype)
    q = jax.random.normal(jax.random.PRNGKey(5), (b, kh, d), jnp.bfloat16)
    lengths = jnp.asarray([100, 250], jnp.int32)
    out_p = decode_attention_paged_mxu(
        q, pc.k_pool, pc.v_pool, pc.table, lengths, pc.k_scale, pc.v_scale,
        kv_bits=pc.bits, v_bits=pc.v_bits)
    kq, vq, ks, vs = kvcache.read_raw(cc)
    out_c = decode_attention_mxu(q, kq, vq, lengths, ks, vs,
                                 kv_bits=cc.bits, v_bits=cc.v_bits,
                                 int8_dots=False)
    diff = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                 - out_c.astype(jnp.float32))))
    assert diff < 2e-2, diff


@pytest.mark.parametrize("kv_dtype", ["int4", "k8v4"])
def test_paged_append_roundtrip(kv_dtype):
    """Appends through the paged pool dequantize to the same values as the
    contiguous cache (identical per-side quantization grids)."""
    b, kh, d, s, page = 2, 2, 8, 32, 16
    pc, cc = _mk_pool(b, kh, d, s, page, kv_dtype, key=3)
    new_k = jnp.asarray(np.random.RandomState(9).randn(b, kh, d), jnp.float32)
    pos = jnp.asarray([4, 20], jnp.int32)
    pc = kvcache_paged.append_token(pc, new_k, new_k * 2, pos)
    cc = kvcache.append_token(cc, new_k, new_k * 2, pos)
    kp, vp = kvcache_paged.read(pc, jnp.float32)
    kc, vc = kvcache.read(cc, jnp.float32)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kc), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vc), atol=1e-6)


@pytest.mark.parametrize("kv_dtype", ["k8v4", "int4"])
def test_paged_engine_matches_contiguous(kv_dtype):
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref = InferenceEngine(params, cfg, runtime=RT, act_dtype=jnp.float32,
                          kv_layout="contiguous", kv_cache_dtype=kv_dtype
                          ).generate([1, 2, 3, 4, 5], GREEDY)
    out = InferenceEngine(params, cfg, runtime=RT, act_dtype=jnp.float32,
                          kv_layout="paged", kv_cache_dtype=kv_dtype
                          ).generate([1, 2, 3, 4, 5], GREEDY)
    assert out.token_ids == ref.token_ids


def test_stacked_k8v4_under_tp_mesh():
    """Scan-layout k8v4 sharded over a model-axis mesh: the cache spec tree
    must carry v_bits (treedef equality with the actual caches) and greedy
    tokens must match single device."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=64,
                       prefill_buckets=(16,), scan_layers=True)
    g = GenerationConfig(max_tokens=5, temperature=0.0, do_sample=False)
    ref = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                          kv_cache_dtype="k8v4").generate([1, 2, 3],
                                                          g).token_ids
    out = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                          kv_cache_dtype="k8v4",
                          mesh=make_mesh(MeshConfig(model=2))
                          ).generate([1, 2, 3], g).token_ids
    assert out == ref


def test_stacked_engine_k8v4_matches_contiguous():
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref = InferenceEngine(params, cfg, runtime=RT, act_dtype=jnp.float32,
                          kv_cache_dtype="k8v4"
                          ).generate([1, 2, 3, 4, 5], GREEDY)
    out = InferenceEngine(params, cfg,
                          runtime=RuntimeConfig(scan_layers=True),
                          act_dtype=jnp.float32, kv_cache_dtype="k8v4"
                          ).generate([1, 2, 3, 4, 5], GREEDY)
    assert out.token_ids == ref.token_ids
