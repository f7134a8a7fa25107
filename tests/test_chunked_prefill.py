"""Chunked prefill: long prompts in chunks must match whole-prompt prefill
exactly, and the scheduler must interleave chunks with decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig, SchedulerConfig
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.serving import ByteTokenizer, Request, RequestStatus, Scheduler

GREEDY = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)


def make_engine(cfg, params, chunk):
    return InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=128,
                              prefill_buckets=(16, 32, 64, 128),
                              prefill_chunk_size=chunk),
        act_dtype=jnp.float32)


@pytest.fixture(scope="module", params=["gpt2", "llama"])
def setup(request):
    cfg = {"gpt2": tiny_test_config,
           "llama": tiny_llama_config}[request.param](max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=50).tolist()
    ref = make_engine(cfg, params, chunk=512).generate(prompt, GREEDY).token_ids
    return cfg, params, prompt, ref


@pytest.mark.parametrize("chunk", [16, 32])
def test_chunked_matches_whole(setup, chunk):
    cfg, params, prompt, ref = setup
    eng = make_engine(cfg, params, chunk)
    out = eng.generate(prompt, GREEDY).token_ids
    assert out == ref


def test_chunk_boundary_exact_multiple(setup):
    cfg, params, prompt, ref = setup
    # prompt length 50; chunk 25 divides it exactly
    eng = make_engine(cfg, params, 25)
    assert eng.generate(prompt, GREEDY).token_ids == ref


def test_begin_continue_protocol(setup):
    cfg, params, prompt, ref = setup
    eng = make_engine(cfg, params, 16)
    slot = eng.begin_request(prompt, GREEDY, request_id="r")
    assert slot in eng.prefilling_slots
    steps = 0
    while slot in eng.prefilling_slots:
        eng.continue_prefill(slot)
        steps += 1
    assert steps == 4  # ceil(50 / 16)
    while eng.active_requests:
        eng.step()
    done = eng.pop_finished()[0]
    assert done.token_ids == ref


def test_scheduler_interleaves_long_prefill():
    cfg = tiny_test_config(vocab_size=260, max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=128,
                              prefill_buckets=(16, 32, 64, 128),
                              prefill_chunk_size=16),
        act_dtype=jnp.float32)
    tok = ByteTokenizer()
    sched = Scheduler(eng, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig())
    sched.start()
    try:
        long_req = Request(prompt="x" * 100, config=GenerationConfig(
            max_tokens=6, temperature=0.0, do_sample=False))
        short_req = Request(prompt="hi", config=GenerationConfig(
            max_tokens=6, temperature=0.0, do_sample=False))
        sched.submit(long_req)
        sched.submit(short_req)
        assert long_req.wait(60) and short_req.wait(60)
        assert long_req.status == RequestStatus.COMPLETED
        assert short_req.status == RequestStatus.COMPLETED
        assert long_req.result.completion_tokens == 6
    finally:
        sched.stop()


def test_chunked_prefill_under_mesh():
    """Chunked prefill composes with TP/DP meshes (VERDICT round 1 item 2):
    a long prompt prefills chunk-by-chunk through the sharded step and
    generation bit-matches single-device whole-prefill."""
    from deeppowers_tpu.config import (GenerationConfig, MeshConfig,
                                       RuntimeConfig)
    from deeppowers_tpu.models.presets import tiny_llama_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.parallel.mesh import make_mesh
    from deeppowers_tpu.runtime.engine import InferenceEngine

    cfg = tiny_llama_config(max_seq_len=256)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=6, do_sample=False)
    prompt = list(range(1, 100))           # 99 tokens > chunk
    ref = InferenceEngine(
        params, cfg, runtime=RuntimeConfig(
            max_batch_size=2, max_seq_len=256, prefill_buckets=(128,)),
        eos_token_id=0, act_dtype=jnp.float32).generate(prompt, gen)
    for mesh_cfg in (dict(model=2), dict(data=2, model=2)):
        eng = InferenceEngine(
            params, cfg, runtime=RuntimeConfig(
                max_batch_size=2 if "data" not in mesh_cfg else 4,
                max_seq_len=256, prefill_buckets=(128,),
                prefill_chunk_size=32),
            eos_token_id=0, act_dtype=jnp.float32,
            mesh=make_mesh(MeshConfig(**mesh_cfg)))
        out = eng.generate(prompt, gen)
        assert out.token_ids == ref.token_ids, mesh_cfg


def test_chunked_prefill_paged_under_mesh():
    """Chunked prefill into the paged layout under DP+TP."""
    from deeppowers_tpu.config import (GenerationConfig, MeshConfig,
                                       RuntimeConfig)
    from deeppowers_tpu.models.presets import tiny_llama_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.parallel.mesh import make_mesh
    from deeppowers_tpu.runtime.engine import InferenceEngine

    cfg = tiny_llama_config(max_seq_len=256)
    params = init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=6, do_sample=False)
    prompt = list(range(1, 100))
    ref = InferenceEngine(
        params, cfg, runtime=RuntimeConfig(
            max_batch_size=2, max_seq_len=256, prefill_buckets=(128,)),
        eos_token_id=0, act_dtype=jnp.float32).generate(prompt, gen)
    eng = InferenceEngine(
        params, cfg, runtime=RuntimeConfig(
            max_batch_size=4, max_seq_len=256, prefill_buckets=(128,),
            prefill_chunk_size=32, kv_page_size=32),
        eos_token_id=0, act_dtype=jnp.float32, kv_layout="paged",
        mesh=make_mesh(MeshConfig(data=2, model=2)))
    out = eng.generate(prompt, gen)
    assert out.token_ids == ref.token_ids
