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
