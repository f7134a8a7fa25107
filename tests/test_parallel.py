"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The key invariant: a TP/DP/EP-sharded engine must produce bit-for-bit the
same greedy tokens as the single-device engine (collectives reduce in f32;
matmul precision is 'highest' in conftest). This is the test the reference
never had (SURVEY.md §4: no distributed tests anywhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import (
    GenerationConfig,
    MeshConfig,
    QuantConfig,
    QuantMode,
    RuntimeConfig,
)
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_moe_config
from deeppowers_tpu.models.transformer import init_params, quantize_params
from deeppowers_tpu.parallel.mesh import make_mesh
from deeppowers_tpu.runtime.engine import InferenceEngine

GREEDY = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)
RT = RuntimeConfig(max_batch_size=4, max_seq_len=64, prefill_buckets=(16,))


def make_engine(cfg, params, mesh=None, **kw):
    kw.setdefault("runtime", RT)
    kw.setdefault("act_dtype", jnp.float32)
    return InferenceEngine(params, cfg, mesh=mesh, **kw)


@pytest.fixture(scope="module")
def llama_setup():
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref = make_engine(cfg, params).generate_batch([[1, 2, 3], [7, 8]], GREEDY)
    return cfg, params, [r.token_ids for r in ref]


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=2, model=2, expert=2))
    assert mesh.shape == {"data": 2, "model": 2, "expert": 2}
    mesh2 = make_mesh(MeshConfig(model=4))
    assert mesh2.shape["model"] == 4


def test_tp_matches_single_device(llama_setup):
    cfg, params, ref = llama_setup
    mesh = make_mesh(MeshConfig(model=2))
    eng = make_engine(cfg, params, mesh=mesh)
    out = eng.generate_batch([[1, 2, 3], [7, 8]], GREEDY)
    assert [r.token_ids for r in out] == ref


def test_tp4_matches(llama_setup):
    cfg, params, ref = llama_setup
    mesh = make_mesh(MeshConfig(model=2))  # kv_heads=2 caps tp at 2
    eng = make_engine(cfg, params, mesh=mesh)
    out = eng.generate_batch([[1, 2, 3], [7, 8]], GREEDY)
    assert [r.token_ids for r in out] == ref


def test_dp_matches_single_device(llama_setup):
    cfg, params, ref = llama_setup
    mesh = make_mesh(MeshConfig(data=2))
    eng = make_engine(cfg, params, mesh=mesh)
    out = eng.generate_batch([[1, 2, 3], [7, 8]], GREEDY)
    assert [r.token_ids for r in out] == ref


def test_dp_tp_combined(llama_setup):
    cfg, params, ref = llama_setup
    mesh = make_mesh(MeshConfig(data=2, model=2))
    eng = make_engine(cfg, params, mesh=mesh)
    out = eng.generate_batch([[1, 2, 3], [7, 8]], GREEDY)
    assert [r.token_ids for r in out] == ref


def test_tp_quantized(llama_setup):
    cfg, params, _ = llama_setup
    qparams = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
    ref = make_engine(cfg, qparams).generate([1, 2, 3], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2))
    out = make_engine(cfg, qparams, mesh=mesh).generate([1, 2, 3], GREEDY).token_ids
    assert out == ref


def test_tp_quantized_int4(llama_setup):
    """int4 under TP row-sharding: the half-split packing pairs weight row
    r with r + K/2 in one byte, so a naive row-slice hands shards the wrong
    nibbles — shard_params must repack shard-major
    (sharding.repack_int4_row_sharded; bug caught by the 70B structure
    composition test in round 4)."""
    cfg, params, _ = llama_setup
    qparams = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                                  group_size=32))
    ref = make_engine(cfg, qparams).generate([1, 2, 3], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2))
    out = make_engine(cfg, qparams, mesh=mesh).generate(
        [1, 2, 3], GREEDY).token_ids
    assert out == ref


def test_ep_moe_matches_single_device():
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = make_engine(cfg, params).generate([3, 1, 4], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(expert=4))
    out = make_engine(cfg, params, mesh=mesh).generate([3, 1, 4], GREEDY).token_ids
    assert out == ref


def test_ep_tp_moe():
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = make_engine(cfg, params).generate([3, 1, 4], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2, expert=2))
    out = make_engine(cfg, params, mesh=mesh).generate([3, 1, 4], GREEDY).token_ids
    assert out == ref


def test_gpt2_tp_with_biases():
    """Row-parallel biases must not be double-counted after psum."""
    from deeppowers_tpu.models.presets import tiny_test_config
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    ref = make_engine(cfg, params).generate([5, 6], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2))
    out = make_engine(cfg, params, mesh=mesh).generate([5, 6], GREEDY).token_ids
    assert out == ref


def test_int8_kv_cache_sharded(llama_setup):
    cfg, params, _ = llama_setup
    ref = make_engine(cfg, params, kv_cache_dtype="int8").generate(
        [1, 2, 3], GREEDY).token_ids
    mesh = make_mesh(MeshConfig(model=2))
    out = make_engine(cfg, params, mesh=mesh, kv_cache_dtype="int8").generate(
        [1, 2, 3], GREEDY).token_ids
    assert out == ref


def test_moe_grouped_matches_dense():
    """Grouped (ragged_dot) MoE must match the dense all-experts path —
    same routed pairs, same expert-ascending combine order."""
    import dataclasses
    cfg_g = tiny_moe_config()
    cfg_d = dataclasses.replace(cfg_g, moe_impl="dense")
    params = init_params(cfg_g, jax.random.PRNGKey(3), dtype=jnp.float32)
    prompts = [[1, 2, 3, 4], [9, 8], [5] * 6]
    out_d = make_engine(cfg_d, params).generate_batch(prompts, GREEDY)
    out_g = make_engine(cfg_g, params).generate_batch(prompts, GREEDY)
    assert [r.token_ids for r in out_g] == [r.token_ids for r in out_d]


def test_moe_grouped_ep_matches_single():
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompts = [[1, 2, 3, 4], [9, 8]]
    ref = make_engine(cfg, params).generate_batch(prompts, GREEDY)
    mesh = make_mesh(MeshConfig(expert=4))
    out = make_engine(cfg, params, mesh=mesh).generate_batch(prompts, GREEDY)
    assert [r.token_ids for r in out] == [r.token_ids for r in ref]


def test_moe_grouped_quantized():
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.transformer import quantize_params
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT8))
    res = make_engine(cfg, qp).generate([1, 2, 3], GREEDY)
    assert len(res.token_ids) == GREEDY.max_tokens


def test_moe_segment_sharded_exact_and_fallback():
    """EP grouped MoE shard-splits the globally sorted rows into per-shard
    segments of static capacity R = slack*T*k/ep. Both regimes must be exact
    vs the unsharded grouped path: balanced routing (fast segment path) and
    a slack too small for the imbalance (lax.cond full-rows fallback)."""
    import dataclasses
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from deeppowers_tpu.models.transformer import _moe_grouped
    from deeppowers_tpu.parallel.mesh import EXPERT_AXIS

    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map

    cfg = tiny_moe_config(moe_impl="grouped")
    t, h, e, inter = 512, cfg.hidden_size, cfg.num_experts, 96
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    params = {
        "router": {"w": jnp.asarray(rng.standard_normal((h, e)) * 0.3,
                                    jnp.float32)},
        "experts": {
            "w_in": {"w": jnp.asarray(rng.standard_normal((e, h, inter))
                                      * 0.1, jnp.float32)},
            "w_gate": {"w": jnp.asarray(rng.standard_normal((e, h, inter))
                                        * 0.1, jnp.float32)},
            "w_out": {"w": jnp.asarray(rng.standard_normal((e, inter, h))
                                       * 0.1, jnp.float32)},
        },
    }
    ref = _moe_grouped(x, params, cfg, ep_axis=None)

    mesh = make_mesh(MeshConfig(expert=4))
    pspec = {"router": {"w": P()},
             "experts": {"w_in": {"w": P(EXPERT_AXIS, None, None)},
                         "w_gate": {"w": P(EXPERT_AXIS, None, None)},
                         "w_out": {"w": P(EXPERT_AXIS, None, None)}}}

    for slack in (2.0, 0.05):   # fast segment path / forced fallback
        cfg_s = dataclasses.replace(cfg, moe_capacity_slack=slack)
        fn = shard_map(
            partial(_moe_grouped, cfg=cfg_s, ep_axis=EXPERT_AXIS),
            mesh=mesh, in_specs=(P(), pspec), out_specs=P(),
            check_vma=False)
        out = jax.jit(fn)(x, params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_ep_moe_quantized_cat_matches_single_device():
    """Cat-fused QUANTIZED experts under expert parallelism: the expert-
    major 2-D cat block-slices on the expert axis; greedy tokens match the
    single-device cat path exactly (round 3)."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.transformer import quantize_params
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    eng = make_engine(cfg, qp)
    ref = eng.generate([3, 1, 4], GREEDY).token_ids
    # the single-device engine must actually have cat-fused the experts
    layers = eng.params["layers"]
    first = layers[0] if isinstance(layers, list) else layers
    assert "experts_cat" in first["moe"], sorted(first["moe"].keys())
    mesh = make_mesh(MeshConfig(expert=4))
    out = make_engine(cfg, qp, mesh=mesh).generate([3, 1, 4],
                                                   GREEDY).token_ids
    assert out == ref

    # and with data parallelism alongside (cat replicates over data)
    mesh2 = make_mesh(MeshConfig(data=2, expert=2))
    out2 = make_engine(cfg, qp, mesh=mesh2).generate([3, 1, 4],
                                                     GREEDY).token_ids
    assert out2 == ref


def test_tp_moe_quantized_cat_matches_single_device():
    """Cat-fused quantized experts under TENSOR parallelism (round 4): the
    cat replicates over the model axis (attention/dense shards; EP still
    block-slices experts) — greedy tokens match the single-device cat
    engine exactly, including under TP x EP."""
    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.transformer import quantize_params
    cfg = tiny_moe_config()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    ref_eng = make_engine(cfg, qp)
    layers = ref_eng.params["layers"]
    first = layers[0] if isinstance(layers, list) else layers
    assert "experts_cat" in first["moe"]
    ref = ref_eng.generate([3, 1, 4], GREEDY).token_ids
    for mc in (MeshConfig(model=2), MeshConfig(model=2, expert=2)):
        eng = make_engine(cfg, qp, mesh=make_mesh(mc))
        l2 = eng.params["layers"]
        f2 = l2[0] if isinstance(l2, list) else l2
        assert "experts_cat" in f2["moe"], "cat must fuse under TP now"
        out = eng.generate([3, 1, 4], GREEDY).token_ids
        assert out == ref, mc


def test_ep_moe_grouped_cat_prefill_matches_single_device():
    """Grouped-cat MoE PREFILL under expert parallelism (round 4): each
    shard computes only its local experts' routed pairs over its cat
    slice; psum combines. A 300-token prompt (>= the grouped threshold)
    must decode token-identically to the single-device engine."""
    import dataclasses

    import numpy as np

    from deeppowers_tpu.config import QuantConfig, QuantMode
    from deeppowers_tpu.models.transformer import quantize_params

    cfg = dataclasses.replace(tiny_moe_config(), max_seq_len=384)
    params = init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    qp = quantize_params(params, QuantConfig(mode=QuantMode.INT4,
                                             group_size=32))
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=384,
                       prefill_buckets=(320,))
    prompt = list(np.random.RandomState(0).randint(1, 120, size=300))
    gen = GenerationConfig(max_tokens=4, temperature=0.0, do_sample=False)
    ref_eng = make_engine(cfg, qp, runtime=rt)
    layers = ref_eng.params["layers"]
    first = layers[0] if isinstance(layers, list) else layers
    assert "experts_cat" in first["moe"]
    ref = ref_eng.generate(prompt, gen).token_ids
    # round 5: per-shard rows are capacity-bounded (~T*k/ep + slack); the
    # 0.05 slack run forces the exact full-rows fallback — both regimes
    # must be token-identical to single-device
    # capacity-bound fast path on both mesh shapes; the exact full-rows
    # fallback (slack 0.05) is mesh-shape-agnostic — one mesh suffices
    cases = [(None, MeshConfig(expert=2)),
             (None, MeshConfig(expert=2, model=2)),
             (0.05, MeshConfig(expert=2))]
    for slack, mc in cases:
        cfg_s = cfg if slack is None else dataclasses.replace(
            cfg, moe_capacity_slack=slack)
        out = make_engine(cfg_s, qp, mesh=make_mesh(mc),
                          runtime=rt).generate(prompt, gen).token_ids
        assert out == ref, (mc, slack)
