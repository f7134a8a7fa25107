"""Speculative decoding (prompt-lookup drafting + exact verification).

The acceptance rule is the delta-draft case of speculative sampling, so the
output distribution equals the normal sampling chain's exactly; for greedy
requests the token sequence must be IDENTICAL to non-speculative decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.transformer import TransformerConfig, init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.runtime.speculative import draft_ngram

CFG = TransformerConfig(
    vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
    max_seq_len=256, positions="rope", norm="rmsnorm", glu=True,
    activation="silu", qkv_bias=False, attn_out_bias=False, mlp_bias=False,
    tie_embeddings=True)

PARAMS = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def make_engine(spec_tokens=0, **kw):
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                       prefill_buckets=(32, 64, 128),
                       speculative_tokens=spec_tokens,
                       speculative_ngram=2)
    return InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                           act_dtype=jnp.float32, **kw)


# A prompt with strong n-gram repetition so prompt lookup actually drafts.
REPETITIVE = [5, 9, 7, 3, 5, 9, 7, 3, 5, 9, 7, 3, 5, 9]


class TestDraftNgram:
    def test_finds_latest_match(self):
        hist = jnp.zeros((1, 32), jnp.int32).at[0, :6].set(
            jnp.array([1, 2, 3, 4, 2, 3]))
        drafts = draft_ngram(hist, jnp.array([6]), ngram=2, k_draft=3)
        # trailing gram [2, 3] matched at position 1 -> continuation [4, 2, 3]
        assert drafts[0].tolist() == [4, 2, 3]

    def test_no_match_falls_back_to_last_token(self):
        hist = jnp.zeros((1, 32), jnp.int32).at[0, :4].set(
            jnp.array([1, 2, 3, 4]))
        drafts = draft_ngram(hist, jnp.array([4]), ngram=2, k_draft=2)
        assert drafts[0].tolist() == [4, 4]

    def test_match_excludes_trailing_gram_itself(self):
        # gram occurs only as the trailing gram -> no legal match
        hist = jnp.zeros((1, 32), jnp.int32).at[0, :3].set(
            jnp.array([7, 1, 2]))
        drafts = draft_ngram(hist, jnp.array([3]), ngram=2, k_draft=2)
        assert drafts[0].tolist() == [2, 2]

    def test_short_history(self):
        hist = jnp.zeros((2, 16), jnp.int32).at[0, 0].set(9)
        drafts = draft_ngram(hist, jnp.array([1, 0]), ngram=3, k_draft=2)
        assert drafts.shape == (2, 2)   # no crash, fallback path


class TestGreedyExactness:
    def test_matches_normal_decode(self):
        gen = GenerationConfig(max_tokens=48, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        spec = make_engine(4).generate(REPETITIVE, gen)
        assert spec.token_ids == base.token_ids
        assert spec.stop_reason == base.stop_reason
        np.testing.assert_allclose(spec.logprobs, base.logprobs, atol=1e-5)

    def test_matches_with_repetition_penalty(self):
        gen = GenerationConfig(max_tokens=32, do_sample=False,
                               repetition_penalty=1.3)
        base = make_engine(0).generate(REPETITIVE, gen)
        spec = make_engine(4).generate(REPETITIVE, gen)
        assert spec.token_ids == base.token_ids

    def test_matches_with_int8_kv(self):
        gen = GenerationConfig(max_tokens=32, do_sample=False)
        base = make_engine(0, kv_cache_dtype="int8").generate(REPETITIVE, gen)
        spec = make_engine(4, kv_cache_dtype="int8").generate(REPETITIVE, gen)
        assert spec.token_ids == base.token_ids

    def test_batch_of_heterogeneous_requests(self):
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        prompts = [REPETITIVE, [11, 12, 13], [40] * 10, [1, 2] * 8]
        base = make_engine(0).generate_batch(prompts, gen)
        spec = make_engine(4).generate_batch(prompts, gen)
        for b, s in zip(base, spec):
            assert s.token_ids == b.token_ids


class TestSpecSemantics:
    def test_max_tokens_respected(self):
        gen = GenerationConfig(max_tokens=10, do_sample=False)
        res = make_engine(4).generate(REPETITIVE, gen)
        assert len(res.token_ids) == 10 or res.stop_reason == "eos"
        assert len(res.token_ids) <= 10

    def test_emits_at_least_one_token_per_step(self):
        eng = make_engine(4)
        gen = GenerationConfig(max_tokens=20, do_sample=False)
        res = eng.generate([3, 1, 4, 1, 5], gen)
        assert len(res.token_ids) >= 1
        assert eng.spec_mean_accepted >= 1.0

    def test_speculation_accepts_on_repetitive_prompt(self):
        eng = make_engine(4)
        gen = GenerationConfig(max_tokens=40, do_sample=False)
        eng.generate(REPETITIVE, gen)
        # a loop-y tiny model on a repetitive prompt must accept drafts
        assert eng.spec_mean_accepted > 1.0

    def test_sampling_path_valid(self):
        gen = GenerationConfig(max_tokens=24, do_sample=True,
                               temperature=0.9, top_k=20, top_p=0.95, seed=7)
        res = make_engine(4).generate(REPETITIVE, gen)
        assert 1 <= len(res.token_ids) <= 24
        assert all(0 <= t < CFG.vocab_size for t in res.token_ids)
        assert len(res.logprobs) == len(res.token_ids)
        assert all(lp <= 0.0 for lp in res.logprobs)

    def test_min_tokens_suppresses_eos(self):
        gen = GenerationConfig(max_tokens=16, min_tokens=8, do_sample=False)
        res = make_engine(4).generate(REPETITIVE, gen)
        # EOS (id 0) may not appear among the first 7 tokens
        assert 0 not in res.token_ids[:7]

    def test_continuous_batching_join_leave(self):
        eng = make_engine(3)
        gen_short = GenerationConfig(max_tokens=4, do_sample=False)
        gen_long = GenerationConfig(max_tokens=30, do_sample=False)
        eng.add_request(REPETITIVE, gen_long, request_id="long")
        eng.add_request([8, 8, 8], gen_short, request_id="short")
        done = {}
        for _ in range(60):
            eng.step()
            for r in eng.pop_finished():
                done[r.request_id] = r
                if r.request_id == "short":
                    eng.add_request([9, 10, 11], gen_short,
                                    request_id="joined")
            if len(done) == 3:
                break
        assert set(done) == {"long", "short", "joined"}
        base = make_engine(0).generate(REPETITIVE, gen_long)
        assert done["long"].token_ids == base.token_ids

    def test_paged_layout_supported(self):
        # paged + speculation is supported single-device (see TestPagedSpec)
        # and under TP/EP meshes (test_paged_spec_under_tp_mesh)
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256, kv_page_size=32,
                           prefill_chunk_size=32, prefill_buckets=(32,),
                           speculative_tokens=4)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, kv_layout="paged")
        assert eng._spec_k == 4


DRAFT_CFG = TransformerConfig(
    vocab_size=128, hidden_size=32, num_layers=1, num_heads=2,
    max_seq_len=256, positions="rope", norm="rmsnorm", glu=True,
    activation="silu", qkv_bias=False, attn_out_bias=False, mlp_bias=False,
    tie_embeddings=True)

DRAFT_PARAMS = init_params(DRAFT_CFG, jax.random.PRNGKey(7), dtype=jnp.float32)


def make_draft_engine(spec_tokens=4, draft_params=None, draft_cfg=None, **kw):
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                       prefill_buckets=(32, 64, 128),
                       speculative_tokens=spec_tokens)
    return InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                           act_dtype=jnp.float32,
                           draft_params=draft_params or DRAFT_PARAMS,
                           draft_cfg=draft_cfg or DRAFT_CFG, **kw)


class TestDraftModelSpec:
    def test_greedy_exact_regardless_of_draft(self):
        """An arbitrary (even useless) draft model must not change greedy
        output — only speed."""
        gen = GenerationConfig(max_tokens=40, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        spec = make_draft_engine().generate(REPETITIVE, gen)
        assert spec.token_ids == base.token_ids
        np.testing.assert_allclose(spec.logprobs, base.logprobs, atol=1e-5)

    def test_perfect_draft_accepts_everything(self):
        """Draft == target => greedy acceptance is total: K+1 tokens/step."""
        gen = GenerationConfig(max_tokens=41, do_sample=False)
        eng = make_draft_engine(4, draft_params=PARAMS, draft_cfg=CFG)
        res = eng.generate([3, 1, 4, 1, 5, 9, 2, 6], gen)
        assert len(res.token_ids) == 41
        # 1 first token at prefill + 40 via spec steps of 5 => 8 steps
        assert eng.spec_mean_accepted == 5.0, eng.spec_mean_accepted

    def test_batch_heterogeneous(self):
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        prompts = [REPETITIVE, [11, 12, 13], [40] * 10]
        base = make_engine(0).generate_batch(prompts, gen)
        spec = make_draft_engine().generate_batch(prompts, gen)
        for b, s in zip(base, spec):
            assert s.token_ids == b.token_ids

    def test_sampling_valid(self):
        gen = GenerationConfig(max_tokens=20, do_sample=True, temperature=0.8,
                               top_k=30, seed=3)
        res = make_draft_engine().generate(REPETITIVE, gen)
        assert 1 <= len(res.token_ids) <= 20
        assert all(0 <= t < CFG.vocab_size for t in res.token_ids)

    def test_vocab_mismatch_rejected(self):
        import dataclasses
        bad = dataclasses.replace(DRAFT_CFG, vocab_size=64)
        with pytest.raises(ValueError):
            make_draft_engine(draft_params=DRAFT_PARAMS, draft_cfg=bad)

    def test_int8_kv_draft(self):
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        base = make_engine(0, kv_cache_dtype="int8").generate(REPETITIVE, gen)
        spec = make_draft_engine(kv_cache_dtype="int8").generate(
            REPETITIVE, gen)
        assert spec.token_ids == base.token_ids


class TestMultiStepSpec:
    def test_multi_dispatch_greedy_exact(self):
        gen = GenerationConfig(max_tokens=40, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                           prefill_buckets=(32, 64), speculative_tokens=4,
                           speculative_ngram=2, decode_steps_per_dispatch=3)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32)
        res = eng.generate(REPETITIVE, gen)
        assert res.token_ids == base.token_ids

    def test_multi_dispatch_draft_model(self):
        gen = GenerationConfig(max_tokens=31, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                           prefill_buckets=(32, 64), speculative_tokens=4,
                           decode_steps_per_dispatch=2)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32, draft_params=PARAMS,
                              draft_cfg=CFG)
        res = eng.generate(REPETITIVE, gen)
        assert res.token_ids == base.token_ids
        # perfect draft: 1 prefill token + 30 in ceil(30/10)=3 dispatches
        assert eng.spec_mean_accepted == 5.0

    def test_multi_dispatch_top_logprobs(self):
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(32,), speculative_tokens=3,
                           speculative_ngram=2, decode_steps_per_dispatch=2,
                           emit_top_logprobs=2)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32)
        res = eng.generate(REPETITIVE, GenerationConfig(max_tokens=12,
                                                        do_sample=False))
        assert len(res.top_tokens) == len(res.token_ids)
        assert all(len(tt) == 2 for tt in res.top_tokens)


def test_draft_spec_with_scan_target():
    """Draft-model speculation where the TARGET uses scan-over-layers
    (stacked cache) and the draft stays unrolled (tuple cache), multi-step
    dispatch on — greedy must match plain decode exactly."""
    gen = GenerationConfig(max_tokens=24, do_sample=False)
    base = make_engine(0).generate(REPETITIVE, gen)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                       prefill_buckets=(32,), scan_layers=True,
                       speculative_tokens=4, decode_steps_per_dispatch=2)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, draft_params=DRAFT_PARAMS,
                          draft_cfg=DRAFT_CFG)
    res = eng.generate(REPETITIVE, gen)
    assert res.token_ids == base.token_ids


class TestMeshSpec:
    """Prompt-lookup speculation over TP/DP meshes (virtual devices)."""

    def _mesh_engine(self, mesh_cfg, spec=4, steps=1):
        from deeppowers_tpu.config import MeshConfig
        from deeppowers_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(MeshConfig(**mesh_cfg))
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                           prefill_buckets=(32, 64),
                           speculative_tokens=spec, speculative_ngram=2,
                           decode_steps_per_dispatch=steps)
        return InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                               act_dtype=jnp.float32, mesh=mesh)

    def test_tp_spec_exact(self):
        gen = GenerationConfig(max_tokens=32, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        eng = self._mesh_engine({"model": 2})
        res = eng.generate(REPETITIVE, gen)
        assert res.token_ids == base.token_ids
        assert eng.spec_mean_accepted > 1.0

    def test_dp_tp_spec_multi_step(self):
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        prompts = [REPETITIVE, [11, 12, 13], [40] * 10]
        base = make_engine(0).generate_batch(prompts, gen)
        eng = self._mesh_engine({"data": 2, "model": 2}, steps=2)
        out = eng.generate_batch(prompts, gen)
        for b, s in zip(base, out):
            assert s.token_ids == b.token_ids

    # draft-model speculation under meshes is supported — see
    # test_draft_spec_under_tp_mesh / _dp_mesh below


class TestPagedSpec:
    """Speculation over the paged KV layout (pages reserved with a K-token
    margin; out-of-range window writes land in the scratch page)."""

    def _engine(self, spec=4, **kw):
        rt = RuntimeConfig(max_batch_size=3, max_seq_len=256, kv_page_size=32,
                           prefill_chunk_size=32, prefill_buckets=(32, 64),
                           speculative_tokens=spec, speculative_ngram=2,
                           **kw.pop("rt", {}))
        return InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                               act_dtype=jnp.float32, kv_layout="paged", **kw)

    def test_greedy_exact_vs_contiguous(self):
        gen = GenerationConfig(max_tokens=32, do_sample=False)
        base = make_engine(0).generate(REPETITIVE, gen)
        res = self._engine().generate(REPETITIVE, gen)
        assert res.token_ids == base.token_ids

    def test_int8_kv_paged_spec(self):
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        base = make_engine(0, kv_cache_dtype="int8").generate(REPETITIVE, gen)
        res = self._engine(kv_cache_dtype="int8").generate(REPETITIVE, gen)
        assert res.token_ids == base.token_ids

    def test_spec_lazy_prefix_cache_combined(self):
        """The full modern-serving stack in one engine: paged + lazy
        oversubscription + prefix cache + speculation + multi-step."""
        gen = GenerationConfig(max_tokens=24, do_sample=False)
        eng = self._engine(rt={"kv_reserve": "lazy", "kv_lazy_slack": 32,
                               "enable_prefix_cache": True,
                               "decode_steps_per_dispatch": 2},
                           kv_total_pages=20)
        base = make_engine(0).generate(REPETITIVE, gen)
        r1 = eng.generate(REPETITIVE, gen)
        r2 = eng.generate(REPETITIVE, gen)     # prefix-cache hit
        assert r1.token_ids == base.token_ids
        assert r2.token_ids == base.token_ids
        assert eng.spec_mean_accepted > 1.0

    def test_near_max_seq_boundary(self):
        """Window writes near max_seq must not corrupt other slots (scratch
        redirection): run a request into the cache-full frontier."""
        gen = GenerationConfig(max_tokens=500, do_sample=False)
        eng = self._engine()
        long_prompt = list(np.random.RandomState(2).randint(1, 127, 200))
        res = eng.generate(long_prompt, gen)
        assert res.stop_reason in ("max_seq", "max_tokens", "kv_pages")
        # another request afterwards is healthy
        res2 = eng.generate(REPETITIVE,
                            GenerationConfig(max_tokens=8, do_sample=False))
        base = make_engine(0).generate(
            REPETITIVE, GenerationConfig(max_tokens=8, do_sample=False))
        assert res2.token_ids == base.token_ids


def test_draft_spec_under_tp_mesh():
    """Draft-model speculation sharded over a TP mesh — greedy bit-exact vs
    the single-device baseline (draft params fuse tp-interleaved and shard
    with the same layout rules as the target)."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    gen = GenerationConfig(max_tokens=24, do_sample=False)
    base = make_engine(0).generate(REPETITIVE, gen)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                       prefill_buckets=(32,), speculative_tokens=4,
                       decode_steps_per_dispatch=2)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32,
                          mesh=make_mesh(MeshConfig(model=2)),
                          draft_params=DRAFT_PARAMS, draft_cfg=DRAFT_CFG)
    res = eng.generate(REPETITIVE, gen)
    assert res.token_ids == base.token_ids


def test_draft_spec_under_dp_mesh():
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    gen = GenerationConfig(max_tokens=20, do_sample=False)
    prompts = [REPETITIVE, [11, 12, 13]]
    base = make_engine(0).generate_batch(prompts, gen)
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=256,
                       prefill_buckets=(32,), speculative_tokens=3)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32,
                          mesh=make_mesh(MeshConfig(data=2)),
                          draft_params=DRAFT_PARAMS, draft_cfg=DRAFT_CFG)
    out = eng.generate_batch(prompts, gen)
    for b, s in zip(base, out):
        assert s.token_ids == b.token_ids


def test_draft_spec_over_paged_layout():
    """Draft-model speculation with a PAGED target cache (draft keeps its
    own contiguous caches) — greedy bit-exact vs single-device contiguous."""
    gen = GenerationConfig(max_tokens=24, do_sample=False)
    base = make_engine(0).generate(REPETITIVE, gen)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=256, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32, 64),
                       speculative_tokens=3)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          draft_params=DRAFT_PARAMS, draft_cfg=DRAFT_CFG)
    res = eng.generate(REPETITIVE, gen)
    assert res.token_ids == base.token_ids


def test_paged_spec_under_tp_mesh():
    """Speculation over the paged KV layout sharded on a TP mesh (data=1:
    page ids are global ints into one shared pool; kv-head-sharded pools
    verify per-shard) — greedy bit-exact vs single-device contiguous."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    gen = GenerationConfig(max_tokens=24, do_sample=False)
    base = make_engine(0).generate(REPETITIVE, gen)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=256, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32, 64),
                       speculative_tokens=4, speculative_ngram=2,
                       decode_steps_per_dispatch=2)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          mesh=make_mesh(MeshConfig(model=2)))
    res = eng.generate(REPETITIVE, gen)
    assert res.token_ids == base.token_ids
    assert eng.spec_mean_accepted > 1.0


def test_paged_spec_under_dp_tp_mesh():
    """Speculation + paged KV + DATA parallelism (per-shard page pools,
    VERDICT round 1 item 2's last combo) — greedy bit-exact vs
    single-device contiguous, two requests on different data shards."""
    from deeppowers_tpu.config import MeshConfig
    from deeppowers_tpu.parallel.mesh import make_mesh
    gen = GenerationConfig(max_tokens=20, do_sample=False)
    base_eng = make_engine(0)
    prompts = [REPETITIVE, [5, 6, 7, 5, 6, 7, 5, 6]]
    base = [base_eng.generate(p, gen).token_ids for p in prompts]
    rt = RuntimeConfig(max_batch_size=4, max_seq_len=256, kv_page_size=32,
                       prefill_chunk_size=32, prefill_buckets=(32, 64),
                       speculative_tokens=4, speculative_ngram=2,
                       decode_steps_per_dispatch=2)
    eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                          act_dtype=jnp.float32, kv_layout="paged",
                          mesh=make_mesh(MeshConfig(data=2, model=2)))
    out = [r.token_ids for r in eng.generate_batch(prompts, gen)]
    assert out == base
    assert eng.spec_mean_accepted > 1.0


class TestAcceptancePolicy:
    """Acceptance histogram + auto-disable below break-even (VERDICT round 1
    item 8): the engine measures acceptance instead of assuming the workload
    is speculation-friendly."""

    def test_histogram_tracks_windows(self):
        eng = make_engine(4)
        eng.generate(REPETITIVE, GenerationConfig(max_tokens=24,
                                                  do_sample=False))
        hist = eng.spec_accept_hist
        assert hist.sum() > 0
        # repetitive text: most windows accept more than one token
        assert eng.spec_window_mean > 1.5
        assert not eng.spec_disabled

    def test_auto_disable_on_hostile_workload(self):
        """Non-repetitive prompts (no n-gram matches) accept ~1 token/window
        -> speculation turns itself off after the probe period."""
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(32, 64),
                           speculative_tokens=4, speculative_ngram=2,
                           speculative_min_accepted=1.2,
                           speculative_probe_steps=8)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32)
        # prompt with no repeated bigrams; sampled continuation stays diverse
        prompt = list(range(1, 30))
        eng.generate(prompt, GenerationConfig(max_tokens=40, temperature=1.5,
                                              seed=3))
        assert eng.spec_disabled
        assert eng._spec_k == 0
        # plain decode path still serves after the fallback
        res = eng.generate([1, 2, 3], GenerationConfig(max_tokens=5,
                                                       do_sample=False))
        assert len(res.token_ids) == 5

    def test_bad_draft_model_self_disables(self):
        """Draft-model break-even (VERDICT r2 weak #6): a draft forward
        costs real time (K extra forwards per window), so the auto-disable
        threshold scales by the step's forward-equivalents — a useless
        same-size draft turns itself off at a threshold where prompt-lookup
        (whose drafts are free) keeps running."""
        bad_draft = init_params(CFG, jax.random.PRNGKey(99),
                                dtype=jnp.float32)  # same size, useless
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(32, 64),
                           speculative_tokens=4,
                           speculative_min_accepted=0.5,
                           speculative_probe_steps=8)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32,
                              draft_params=bad_draft, draft_cfg=CFG)
        # same-size draft: one spec step ~ 1 + K forward-equivalents
        assert eng._spec_cost_ratio == pytest.approx(1 + 4, rel=0.05)
        eng.generate(list(range(1, 30)),
                     GenerationConfig(max_tokens=40, temperature=1.5,
                                      seed=3))
        assert eng.spec_disabled
        assert eng._spec_k == 0

        # contrast: prompt-lookup at the SAME 0.5 threshold stays on (its
        # drafts cost nothing, and every window emits >= 1 token)
        rt2 = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                            prefill_buckets=(32, 64),
                            speculative_tokens=4, speculative_ngram=2,
                            speculative_min_accepted=0.5,
                            speculative_probe_steps=8)
        eng2 = InferenceEngine(PARAMS, CFG, runtime=rt2, eos_token_id=0,
                               act_dtype=jnp.float32)
        assert eng2._spec_cost_ratio == 1.0
        eng2.generate(list(range(1, 30)),
                      GenerationConfig(max_tokens=40, temperature=1.5,
                                       seed=3))
        assert not eng2.spec_disabled

    def test_no_disable_when_threshold_unset(self):
        rt = RuntimeConfig(max_batch_size=2, max_seq_len=256,
                           prefill_buckets=(32, 64),
                           speculative_tokens=4, speculative_ngram=2)
        eng = InferenceEngine(PARAMS, CFG, runtime=rt, eos_token_id=0,
                              act_dtype=jnp.float32)
        eng.generate(list(range(1, 30)),
                     GenerationConfig(max_tokens=30, temperature=1.5, seed=3))
        assert not eng.spec_disabled
        assert eng._spec_k == 4
