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
