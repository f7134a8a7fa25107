"""Config-4 composition test at the REAL llama3-70b structure.

PP decode, sharded checkpoint load, and quantization are each unit-tested,
but BASELINE config 4 needs them COMPOSED at the 70B's actual layout: 80
scanned layers, 8:1 GQA, rope theta 5e5 — tiny hidden so the whole flow
(quantize -> checkpoint v2 save -> sharded load -> PP / PP x TP decode,
token-exact vs single-device) runs in CI on the virtual 8-device mesh.
Reference anchor: the layer-to-stage assignment the reference planned but
left uncomputed (src/core/distributed/distributed_context.cpp:282-303;
its stage compute + 1F1B were TODOs in distributed_executor.cpp:239-315).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import QuantConfig, QuantMode
from deeppowers_tpu.models.presets import PRESETS
from deeppowers_tpu.models.transformer import init_params, quantize_params
from deeppowers_tpu.parallel.pipeline import (make_pipeline_mesh,
                                              pipeline_generate, stage_layers)
from deeppowers_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def ckpt70(tmp_path_factory):
    """Tiny-hidden llama3-70b structure, int4-quantized, through the v2
    checkpoint: returns (cfg, loaded params, prompts, reference tokens)."""
    # full structural layout: 80 layers, heads:kv = 8:1 (64/8 in the real
    # model), rope theta 500k, GLU + RMSNorm — hidden shrunk 64x
    cfg = dataclasses.replace(
        PRESETS["llama3-70b"], hidden_size=256, num_heads=16, num_kv_heads=2,
        intermediate_size=896, vocab_size=256, max_seq_len=64)
    assert cfg.num_layers == 80 and cfg.num_heads // cfg.num_kv_heads == 8

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(
        params, QuantConfig(mode=QuantMode.INT4, group_size=64))

    tmp = tmp_path_factory.mktemp("ck70")
    save_checkpoint(str(tmp / "ck"), qparams, cfg)
    loaded, cfg2, _ = load_checkpoint(str(tmp / "ck"))
    assert cfg2 == cfg

    rng = np.random.RandomState(0)
    b, s, steps = 4, 12, 4
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, size=(b, s)),
                      dtype=jnp.int32)
    lengths = jnp.asarray(rng.randint(4, s + 1, size=(b,)), dtype=jnp.int32)

    # single-device reference: scan-over-layers prefill + greedy decode
    from deeppowers_tpu.models.transformer import (forward_decode_scan,
                                                   forward_prefill_scan)
    from deeppowers_tpu.runtime import kvcache_stacked as st

    sparams = stage_layers(loaded, 1)
    cache = st.init_cache(cfg.num_layers, b, cfg.max_seq_len, cfg.kv_heads,
                          cfg.dim_head, dtype=jnp.float32)
    last_logits = []
    for slot in range(b):
        cache, last = forward_prefill_scan(
            sparams, cfg, ids[slot], lengths[slot],
            jnp.asarray(slot, jnp.int32), cache, dtype=jnp.float32)
        last_logits.append(last)
    cur = jnp.argmax(jnp.stack(last_logits), axis=-1).astype(jnp.int32)
    toks = [cur]
    lens = lengths
    for _ in range(steps - 1):
        logits, cache = forward_decode_scan(sparams, cfg, cur, cache, lens,
                                            dtype=jnp.float32)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(cur)
        lens = lens + 1
    ref = np.stack([np.asarray(t) for t in toks], axis=1)
    return cfg, loaded, ids, lengths, steps, ref


def test_70b_structure_pp_decode(ckpt70):
    """80 scanned layers, int4, checkpoint-loaded: PP=4 decode (20 layers
    per stage) is token-exact vs single-device."""
    cfg, params, ids, lengths, steps, ref = ckpt70
    mesh = make_pipeline_mesh(4)
    out = pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                            dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_70b_structure_pp_x_tp_decode(ckpt70):
    """PP=2 x TP=2 over the same loaded params: 40 layers per stage, GQA
    kv-heads shared across the TP pair."""
    cfg, params, ids, lengths, steps, ref = ckpt70
    mesh = make_pipeline_mesh(2, tp=2)
    out = pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                            dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_70b_structure_tp8_chunked_prefill_decode():
    """The ACTUAL config-4 deployment shape (VERDICT r4 item 8): TP-8, no
    PP, 80 scanned layers at 8:1 GQA (one kv head per shard), CHUNKED
    prefill interleaved ahead of decode — greedy tokens exact vs the
    single-device engine. Reference anchor: the tensor-parallel serving
    the reference's DistributedContext declared but never computed
    (/root/reference/src/core/distributed/distributed_context.cpp:255-303).
    """
    from deeppowers_tpu.config import MeshConfig, RuntimeConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    from deeppowers_tpu.runtime.engine import GenerationConfig, InferenceEngine

    # 8:1 GQA with one kv head per TP-8 shard: 64 q heads over 8 kv heads
    cfg = dataclasses.replace(
        PRESETS["llama3-70b"], hidden_size=512, num_heads=64, num_kv_heads=8,
        intermediate_size=1024, vocab_size=256, max_seq_len=64)
    assert cfg.num_layers == 80 and cfg.num_heads // cfg.num_kv_heads == 8
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qparams = quantize_params(
        params, QuantConfig(mode=QuantMode.INT4, group_size=64))

    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,), prefill_chunk_size=16,
                       scan_layers=True)
    gen = GenerationConfig(max_tokens=2, temperature=0.0, do_sample=False)
    prompt = list(np.random.RandomState(3).randint(
        1, cfg.vocab_size, size=40))     # 40 tokens -> 3 prefill chunks

    ref = InferenceEngine(qparams, cfg, runtime=rt, act_dtype=jnp.float32
                          ).generate(prompt, gen).token_ids
    mesh = make_mesh(MeshConfig(model=8))
    out = InferenceEngine(qparams, cfg, runtime=rt, act_dtype=jnp.float32,
                          mesh=mesh).generate(prompt, gen).token_ids
    assert out == ref
