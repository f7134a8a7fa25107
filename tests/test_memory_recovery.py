"""Memory planning + scheduler fault-recovery tests (reference: memory
pressure handling gpt_model.cpp:508-545; worker-failure requeue
scheduler.cpp:260-279)."""

import threading
import time

import jax
import jax.numpy as jnp
import pytest

from deeppowers_tpu.config import (
    GenerationConfig,
    RuntimeConfig,
    SchedulerConfig,
)
from deeppowers_tpu.models.presets import tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime import memory
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.serving import ByteTokenizer, Request, RequestStatus, Scheduler


class TestMemoryPlan:
    def setup_method(self):
        self.cfg = tiny_test_config()
        self.params = init_params(self.cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)

    def test_plan_fits_small_model(self):
        p = memory.plan(self.params, self.cfg, max_seq=64, want_slots=8,
                        hbm_bytes=1 << 30)
        assert p.max_slots == 8
        assert p.headroom_bytes > 0
        assert p.summary()["max_slots"] == 8

    def test_plan_shrinks_when_tight(self):
        # budget barely above params: few slots fit
        tight = memory.plan(self.params, self.cfg, max_seq=64, want_slots=64,
                            hbm_bytes=int(memory.param_nbytes(self.params)
                                          * 1.3))
        assert tight.max_slots < 64

    def test_cascade_prefers_int8_kv_when_it_helps(self):
        # KV-dominated budget: int8 KV admits more slots
        kv_bf16 = memory.kv_bytes_per_slot(self.cfg, 2048, "bf16")
        hbm = int((memory.param_nbytes(self.params) + 20 * kv_bf16) / 0.85)
        p = memory.plan_or_shrink(self.params, self.cfg, max_seq=2048,
                                  want_slots=64, hbm_bytes=hbm)
        assert p.kv_cache_dtype == "int8"
        assert p.max_slots > 20

    def test_device_hbm_reported(self):
        assert memory.device_hbm_bytes() >= 1 << 30


class TestRecovery:
    def _make(self):
        cfg = tiny_test_config(vocab_size=260)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        eng = InferenceEngine(
            params, cfg,
            runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
            act_dtype=jnp.float32)
        tok = ByteTokenizer()
        sched = Scheduler(eng, encode=tok.encode, decode=tok.decode,
                          config=SchedulerConfig())
        return eng, sched

    def test_engine_reset_frees_slots(self):
        eng, _ = self._make()
        eng.add_request([1, 2], GenerationConfig(max_tokens=20,
                                                 temperature=0.0,
                                                 do_sample=False))
        assert eng.active_requests == 1
        eng.reset()
        assert eng.active_requests == 0
        assert len(eng.free_slots) == 2
        # engine still works after reset
        res = eng.generate([3], GenerationConfig(max_tokens=3,
                                                 temperature=0.0,
                                                 do_sample=False))
        assert len(res.token_ids) == 3

    def test_scheduler_recovers_from_step_fault(self):
        eng, sched = self._make()
        real_step = eng.step
        fail_once = {"armed": True}

        def flaky_step():
            if fail_once["armed"]:
                fail_once["armed"] = False
                raise RuntimeError("injected device fault")
            return real_step()

        eng.step = flaky_step
        sched.start()
        try:
            req = sched.submit_sync(Request(
                prompt="hello", config=GenerationConfig(
                    max_tokens=4, temperature=0.0, do_sample=False)),
                timeout=60)
            assert req.status == RequestStatus.COMPLETED
            assert req.result.completion_tokens == 4
            assert getattr(sched, "recovered_requests", 0) >= 1
        finally:
            sched.stop()

    def test_scheduler_gives_up_after_repeated_faults(self):
        eng, sched = self._make()

        def always_fail():
            raise RuntimeError("permanent fault")

        eng.step = always_fail
        sched.start()
        try:
            req = sched.submit_sync(Request(
                prompt="x", config=GenerationConfig(
                    max_tokens=4, temperature=0.0, do_sample=False)),
                timeout=30)
            assert req.status == RequestStatus.FAILED
        finally:
            sched.stop()
