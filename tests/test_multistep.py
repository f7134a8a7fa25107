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


class TestAutoDispatchDepth:
    """decode_steps_per_dispatch=0: the engine fits per-dispatch fixed cost
    D vs per-step device time s from probe medians and settles on a ladder
    depth (round 3 — serving on high-dispatch-overhead runtimes)."""

    def _engine(self):
        from deeppowers_tpu.models.presets import tiny_test_config
        from deeppowers_tpu.models.transformer import init_params
        cfg = tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(16,),
                           decode_steps_per_dispatch=0)
        return InferenceEngine(params, cfg, runtime=rt,
                               act_dtype=jnp.float32)

    def test_high_overhead_runtime_climbs(self):
        eng = self._engine()
        assert eng._auto_dispatch and eng._steps_per_dispatch == 4
        # D = 35 ms, s = 1.8 ms: want = 35/(0.08*1.8) = 243, cap = 55 -> 32
        for _ in range(7):
            eng._auto_observe(0.035 + 4 * 0.0018)
        assert eng._steps_per_dispatch == 12
        for _ in range(7):
            eng._auto_observe(0.035 + 12 * 0.0018)
        assert eng._auto_done
        assert eng._steps_per_dispatch == 32

    def test_colocated_runtime_stays_small(self):
        eng = self._engine()
        # D = 0.1 ms, s = 2 ms: want = 0.1/(0.08*2) = 0.6 -> depth 1
        for _ in range(7):
            eng._auto_observe(0.0001 + 4 * 0.002)
        for _ in range(7):
            eng._auto_observe(0.0001 + 12 * 0.002)
        assert eng._auto_done
        assert eng._steps_per_dispatch == 1

    def test_generate_through_auto_transitions(self):
        """A generation long enough to cross both probe phases produces the
        same tokens as a fixed-depth engine (depth changes only batching)."""
        from deeppowers_tpu.models.presets import tiny_test_config
        from deeppowers_tpu.models.transformer import init_params
        cfg = tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        gen = GenerationConfig(max_tokens=80, temperature=0.0,
                               do_sample=False)
        rt1 = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                            prefill_buckets=(16,),
                            decode_steps_per_dispatch=1)
        ref = InferenceEngine(params, cfg, runtime=rt1,
                              act_dtype=jnp.float32).generate([1, 2, 3], gen)
        eng = self._engine()
        res = eng.generate([1, 2, 3], gen)
        assert res.token_ids == ref.token_ids
        # both probe phases ran on real dispatches
        assert eng._auto_done or len(eng._auto_times.get(4, [])) > 0


def test_depth_invariant_at_cache_boundary():
    """Regression (round 3): a multi-step dispatch used to keep decoding
    rows past the KV storage when the remaining room was not a multiple of
    the dispatch depth — token counts differed by depth and appends hit the
    cache edge. The in-device capacity guard makes every depth emit the
    same tokens."""
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    cfg = tiny_test_config()       # cfg.max_seq_len == 64 bounds the cache
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=80, temperature=0.0, do_sample=False)
    outs = {}
    for d in (1, 7, 12):
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(16,),
                           decode_steps_per_dispatch=d)
        eng = InferenceEngine(params, cfg, runtime=rt,
                              act_dtype=jnp.float32)
        res = eng.generate([1, 2, 3], gen)
        assert res.stop_reason == "max_seq"
        outs[d] = res.token_ids
    assert outs[1] == outs[7] == outs[12]
