"""Pipeline-parallel staged forward (parallel/pipeline.py) vs the dense
forward — exactness on the virtual device mesh (VERDICT round 1 item 9:
PP decided with code + test + docs/parallelism.md analysis)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.models.presets import tiny_llama_config
from deeppowers_tpu.models.transformer import forward_prefill, init_params
from deeppowers_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_forward,
    stage_layers,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llama_config(max_seq_len=64)
    cfg = dataclasses.replace(cfg, num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.RandomState(0)
    b, s = 8, 24
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, size=(b, s)),
                      dtype=jnp.int32)
    lengths = jnp.asarray(rng.randint(4, s + 1, size=(b,)), dtype=jnp.int32)
    logits, _ = forward_prefill(params, cfg, ids, lengths, dtype=jnp.float32)
    ref = logits[jnp.arange(b), lengths - 1]
    return cfg, params, ids, lengths, np.asarray(ref)


@pytest.mark.parametrize("stages", [2, 4])
def test_pipeline_matches_dense(setup, stages):
    cfg, params, ids, lengths, ref = setup
    mesh = make_pipeline_mesh(stages)
    out = pipeline_forward(params, cfg, ids, lengths, mesh,
                           dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_pipeline_more_microbatches(setup):
    """M > S microbatches (smaller bubbles) — still exact."""
    cfg, params, ids, lengths, ref = setup
    mesh = make_pipeline_mesh(2)
    out = pipeline_forward(params, cfg, ids, lengths, mesh, microbatches=4,
                           dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_stage_assignment_requires_divisibility(setup):
    cfg, params, *_ = setup
    with pytest.raises(ValueError):
        stage_layers(params, 3)        # 4 layers % 3 != 0


# ---------------------------------------------------------------------------
# Decode under the stage mesh (VERDICT r2 next-round #6: KV-cache decode
# under PP + a PP x TP 2-D mesh; LM head only on the final stage)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gen_setup():
    from deeppowers_tpu.models.transformer import (forward_decode_scan,
                                                   forward_prefill_scan)
    from deeppowers_tpu.runtime import kvcache_stacked as st

    cfg = tiny_llama_config(max_seq_len=64)
    cfg = dataclasses.replace(cfg, num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.RandomState(1)
    b, s, steps = 8, 16, 6
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, size=(b, s)),
                      dtype=jnp.int32)
    lengths = jnp.asarray(rng.randint(4, s + 1, size=(b,)), dtype=jnp.int32)

    # reference: single-device scan prefill + greedy scan decode
    # (scan forwards take stacked layers; stage_layers(stages=1) stacks)
    sparams = stage_layers(params, 1)
    cache = st.init_cache(cfg.num_layers, b, 64, cfg.kv_heads, cfg.dim_head,
                          dtype=jnp.float32)
    toks = []
    # per-request prefill (slot-wise, like the engine)
    last_logits = []
    for slot in range(b):
        cache, last = forward_prefill_scan(
            sparams, cfg, ids[slot], lengths[slot],
            jnp.asarray(slot, jnp.int32), cache, dtype=jnp.float32)
        last_logits.append(last)
    cur = jnp.argmax(jnp.stack(last_logits), axis=-1).astype(jnp.int32)
    toks.append(cur)
    lens = lengths
    for _ in range(steps - 1):
        logits, cache = forward_decode_scan(sparams, cfg, cur, cache, lens,
                                            dtype=jnp.float32)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(cur)
        lens = lens + 1
    ref = np.stack([np.asarray(t) for t in toks], axis=1)   # (B, steps)
    return cfg, params, ids, lengths, steps, ref


@pytest.mark.parametrize("stages", [2, 4])
def test_pipeline_decode_matches_dense(gen_setup, stages):
    from deeppowers_tpu.parallel.pipeline import pipeline_generate
    cfg, params, ids, lengths, steps, ref = gen_setup
    mesh = make_pipeline_mesh(stages)
    out = pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                            dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipeline_decode_more_microbatches(gen_setup):
    from deeppowers_tpu.parallel.pipeline import pipeline_generate
    cfg, params, ids, lengths, steps, ref = gen_setup
    mesh = make_pipeline_mesh(2)
    out = pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                            microbatches=4, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipeline_decode_pp_x_tp(gen_setup):
    """2-D (stage=2, model=2) mesh: staged layers, TP within each stage."""
    from deeppowers_tpu.parallel.pipeline import pipeline_generate
    cfg, params, ids, lengths, steps, ref = gen_setup
    mesh = make_pipeline_mesh(2, tp=2)
    out = pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                            dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pipeline_decode_validates_microbatches(gen_setup):
    from deeppowers_tpu.parallel.pipeline import pipeline_generate
    cfg, params, ids, lengths, steps, _ = gen_setup
    mesh = make_pipeline_mesh(4)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_generate(params, cfg, ids, lengths, mesh, steps=steps,
                          microbatches=2, dtype=jnp.float32)
