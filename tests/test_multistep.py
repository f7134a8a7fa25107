"""Multi-step decode dispatch tests: N tokens per dispatch must reproduce
single-step outputs exactly."""

import jax
import jax.numpy as jnp
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine

GREEDY = GenerationConfig(max_tokens=9, temperature=0.0, do_sample=False)


def make(cfg, params, n):
    return InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,),
                              decode_steps_per_dispatch=n),
        act_dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref = make(cfg, params, 1).generate([1, 2, 3], GREEDY).token_ids
    return cfg, params, ref


@pytest.mark.parametrize("n", [2, 4, 8])
def test_multistep_matches_single(setup, n):
    cfg, params, ref = setup
    out = make(cfg, params, n).generate([1, 2, 3], GREEDY).token_ids
    assert out == ref


def test_multistep_eos_stops_early(setup):
    cfg, params, ref = setup
    idx, eos = next((i, t) for i, t in enumerate(ref) if t not in ref[:i])
    eng = make(cfg, params, 4)
    eng.eos_token_id = eos
    res = eng.generate([1, 2, 3], GREEDY)
    assert res.token_ids[-1] == eos
    assert res.stop_reason == "eos"
    assert len(res.token_ids) == idx + 1  # no extra tokens past EOS


def test_multistep_batch(setup):
    cfg, params, _ = setup
    eng1 = make(cfg, params, 1)
    ref = [r.token_ids for r in eng1.generate_batch([[1], [5, 6]], GREEDY)]
    eng4 = make(cfg, params, 4)
    out = [r.token_ids for r in eng4.generate_batch([[1], [5, 6]], GREEDY)]
    assert out == ref


def test_multistep_streaming_token_order(setup):
    cfg, params, ref = setup
    seen = []
    eng = make(cfg, params, 4)
    eng.generate_stream([1, 2, 3], GREEDY,
                        callback=lambda t: (seen.append(t), True)[1])
    assert seen == ref


def test_multistep_sharded(setup):
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,)),
        act_dtype=jnp.float32).generate([4, 5], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2))
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,),
                              decode_steps_per_dispatch=3),
        act_dtype=jnp.float32, mesh=mesh)
    assert eng.generate([4, 5], GREEDY).token_ids == ref
