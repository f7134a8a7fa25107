"""InferenceEngine tests: generation semantics, batching, streaming, continuous
batching (reference acceptance spec: tests/test_generation.cpp — growth,
batch-size preservation, streaming callback + cancel, temperature-0
determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_llama_config, tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine


def test_logit_bias_redirects_greedy(engine_factory):
    # end-to-end through admission -> per-slot bias rows -> decode chain:
    # ban the token greedy decoding would otherwise emit first
    eng = engine_factory()
    base = eng.generate([1, 2, 3], GenerationConfig(
        max_tokens=4, temperature=0.0, do_sample=False))
    first = base.token_ids[0]
    banned = eng.generate([1, 2, 3], GenerationConfig(
        max_tokens=4, temperature=0.0, do_sample=False,
        logit_bias={int(first): -100.0}))
    assert banned.token_ids[0] != first


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


GREEDY = GenerationConfig(max_tokens=8, temperature=0.0, do_sample=False)


def test_generate_produces_tokens(engine_factory):
    eng = engine_factory()
    res = eng.generate([1, 2, 3], GREEDY)
    assert len(res.token_ids) == 8
    assert res.stop_reason == "max_tokens"
    assert len(res.logprobs) == 8
    assert res.generation_time > 0
    assert all(0 <= t < 128 for t in res.token_ids)


def test_greedy_deterministic(engine_factory):
    # reference: test_generation.cpp:74-80
    r1 = engine_factory().generate([5, 6, 7], GREEDY)
    r2 = engine_factory().generate([5, 6, 7], GREEDY)
    assert r1.token_ids == r2.token_ids


def test_batch_preserves_order_and_size(engine_factory):
    # reference: test_generation.cpp:37-52
    eng = engine_factory()
    prompts = [[1], [2, 3], [4, 5, 6]]
    results = eng.generate_batch(prompts, GREEDY)
    assert len(results) == 3
    for r, p in zip(results, prompts):
        assert r.prompt_len == len(p)
        assert len(r.token_ids) == 8


def test_batch_matches_individual(engine_factory):
    """Continuous batching must not change greedy outputs vs solo runs."""
    solo = [engine_factory().generate(p, GREEDY).token_ids
            for p in [[1, 2], [9, 8, 7]]]
    batch = engine_factory().generate_batch([[1, 2], [9, 8, 7]], GREEDY)
    assert [r.token_ids for r in batch] == solo


def test_streaming_callback_and_cancel(engine_factory):
    # reference: test_generation.cpp:55-70
    eng = engine_factory()
    seen = []
    res = eng.generate_stream([1, 2], GREEDY, callback=lambda t: (
        seen.append(t), len(seen) < 3)[1])
    assert len(seen) == 3
    assert res.stop_reason == "cancelled"

    eng2 = engine_factory()
    seen2 = []
    res2 = eng2.generate_stream([1, 2], GREEDY,
                                callback=lambda t: (seen2.append(t), True)[1])
    assert res2.stop_reason == "max_tokens"
    assert seen2 == res2.token_ids


def test_eos_stops_generation(engine_factory):
    eng = engine_factory()
    # Probe the greedy continuation, then pick the first token whose value
    # doesn't appear earlier in the stream as EOS (the tiny model may repeat).
    probe = eng.generate([3, 1], GREEDY)
    idx, eos = next((i, t) for i, t in enumerate(probe.token_ids)
                    if t not in probe.token_ids[:i])
    eng2 = engine_factory(eos_token_id=eos)
    res = eng2.generate([3, 1], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False))
    assert res.token_ids[-1] == eos
    assert res.stop_reason == "eos"
    assert len(res.token_ids) == idx + 1


def test_continuous_join_mid_decode(engine_factory):
    """A request added while another decodes must not perturb the first —
    the token-level join the reference lacked (SURVEY.md #33)."""
    ref = engine_factory().generate([1, 2, 3], GREEDY).token_ids

    eng = engine_factory()
    eng.add_request([1, 2, 3], GREEDY, request_id="a")
    eng.step()  # a decodes alone for a step
    eng.add_request([7, 7], GREEDY, request_id="b")  # joins mid-flight
    while eng.active_requests:
        eng.step()
    done = {r.request_id: r for r in eng.pop_finished()}
    assert done["a"].token_ids == ref
    assert len(done["b"].token_ids) == 8


def test_slot_reuse_after_finish(engine_factory):
    eng = engine_factory()
    for round_ in range(3):
        res = eng.generate([1 + round_], GREEDY)
        assert len(res.token_ids) == 8
    assert eng.active_requests == 0
    assert len(eng.free_slots) == 4


def test_no_free_slot_raises(engine_factory):
    eng = engine_factory()
    long_gen = GenerationConfig(max_tokens=50, temperature=0.0, do_sample=False)
    for i in range(4):
        eng.add_request([1, i], long_gen, request_id=f"r{i}")
    with pytest.raises(RuntimeError):
        eng.add_request([9], long_gen)


def test_prompt_too_long_rejected(engine_factory):
    eng = engine_factory()
    with pytest.raises(ValueError):
        eng.add_request(list(range(100)), GREEDY)
    with pytest.raises(ValueError):
        eng.add_request([], GREEDY)


def test_sampled_generation_with_seed(engine_factory):
    gen = GenerationConfig(max_tokens=6, temperature=1.0, seed=42)
    r1 = engine_factory().generate([1, 2], gen)
    r2 = engine_factory().generate([1, 2], gen)
    assert r1.token_ids == r2.token_ids  # same seed => same sample path
    assert len(r1.token_ids) == 6


def test_ttft_recorded(engine_factory):
    res = engine_factory().generate([1, 2, 3], GREEDY)
    assert res.ttft_ms > 0


def test_int8_kv_engine_runs():
    cfg = tiny_llama_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,)),
        kv_cache_dtype="int8", act_dtype=jnp.float32)
    res = eng.generate([1, 2, 3], GREEDY)
    assert len(res.token_ids) == 8


def test_multiple_stop_token_ids(engine_factory):
    """Secondary stop ids (beyond the single on-device EOS) retire the slot
    and truncate at the first occurrence."""
    eng = engine_factory()
    probe = eng.generate([3, 1], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False))
    # pick the 3rd distinct token as a secondary stop
    distinct = []
    for t in probe.token_ids:
        if t not in distinct:
            distinct.append(t)
    if len(distinct) < 2:
        import pytest
        pytest.skip("degenerate tiny model output")
    stop = distinct[1]
    idx = probe.token_ids.index(stop)
    eng2 = engine_factory()
    res = eng2.generate([3, 1], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False,
        stop_token_ids=(9999, stop)))
    assert res.token_ids[-1] == stop
    assert len(res.token_ids) == idx + 1
    assert res.stop_reason == "eos"


def test_penalties_active_path(engine_factory):
    """Repetition penalty changes greedy output of a repetitive model (the
    conditional penalties branch must actually fire)."""
    eng = engine_factory()
    plain = eng.generate([2, 2], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False)).token_ids
    eng2 = engine_factory()
    pen = eng2.generate([2, 2], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False,
        repetition_penalty=1.8)).token_ids
    assert len(pen) == 8
    # a strongly repetitive greedy stream must change under the penalty
    if len(set(plain)) == 1:
        assert pen != plain


def test_top_logprobs_emission():
    """RuntimeConfig.emit_top_logprobs attaches per-token top-k alternatives
    (reference: RequestResult.top_tokens)."""
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,), emit_top_logprobs=3),
        act_dtype=jnp.float32)
    res = eng.generate([1, 2, 3], GenerationConfig(
        max_tokens=5, temperature=0.0, do_sample=False))
    assert len(res.top_tokens) == 5
    for tok, lp, alts in zip(res.token_ids, res.logprobs, res.top_tokens):
        assert len(alts) == 3
        # greedy token must be the top candidate, logprobs descending
        assert alts[0][0] == tok
        assert abs(alts[0][1] - lp) < 1e-4
        assert alts[0][1] >= alts[1][1] >= alts[2][1]


def test_top_logprobs_multistep():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(
        params, cfg,
        runtime=RuntimeConfig(max_batch_size=2, max_seq_len=64,
                              prefill_buckets=(16,), emit_top_logprobs=2,
                              decode_steps_per_dispatch=3),
        act_dtype=jnp.float32)
    res = eng.generate([4], GenerationConfig(
        max_tokens=7, temperature=0.0, do_sample=False))
    assert len(res.top_tokens) == 7
    assert all(len(a) == 2 for a in res.top_tokens)


def test_min_tokens_suppresses_eos_mid_decode(engine_factory):
    """min_tokens must keep EOS out of the output entirely (HF
    min_new_tokens semantics), then allow it."""
    eng = engine_factory()
    probe = eng.generate([3, 1], GenerationConfig(
        max_tokens=8, temperature=0.0, do_sample=False))
    # choose the greedy token at position 2 as EOS
    if len(probe.token_ids) < 3:
        pytest.skip("short probe")
    eos = probe.token_ids[2]
    eng2 = engine_factory(eos_token_id=eos)
    res = eng2.generate([3, 1], GenerationConfig(
        max_tokens=8, min_tokens=6, temperature=0.0, do_sample=False))
    # EOS may appear only at/after position min_tokens-1 (0-indexed >= 5)
    for i, t in enumerate(res.token_ids):
        if t == eos:
            assert i >= 5, (i, res.token_ids)
            break


def test_cancel_during_deferred_admission():
    """Regression (round-3 review): a cancel landing between a deferred
    admission and its flush must not re-retire the freed slot (that
    crashed _retire on res=None and triggered a full engine recovery)."""
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,))
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=8, temperature=0.0, do_sample=False)
    with eng.deferred_admission():
        slot = eng.begin_request([1, 2, 3], gen, request_id="r-cancel")
        eng.cancel(slot)                     # e.g. client disconnected
    # flush ran at context exit without crashing; slot is free again
    assert eng._slots[slot] is None
    done = eng.pop_finished()
    assert done and done[0].stop_reason == "cancelled"
    assert done[0].token_ids == []           # nothing recorded post-cancel
    # engine still serves
    res = eng.generate([4, 5], gen)
    assert len(res.token_ids) == 8


def test_pipelined_harvest_respects_occupancy_epochs():
    """Regression (round-3 review): cancelling a request while a pipelined
    dispatch is in flight and re-admitting the slot via the CHUNKED prefill
    path must not leak the old occupant's tokens into the new request, nor
    resurrect the retired slot's active/length mirror."""
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=1, max_seq_len=64,
                       prefill_buckets=(16,), prefill_chunk_size=16,
                       decode_steps_per_dispatch=1)
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    gen = GenerationConfig(max_tokens=20, temperature=0.0, do_sample=False)
    slot = eng.begin_request([1, 2, 3], gen, request_id="A")
    eng.step()                       # pipelined: dispatch(s) now in flight
    eng.cancel(slot)                 # A retires host-side, dispatch flies on
    # chunked re-admission of the SAME slot (prompt > prefill_chunk_size)
    slot2 = eng.begin_request(list(range(1, 20)), gen, request_id="B")
    assert slot2 == slot
    while slot2 in eng._prefilling:
        eng.continue_prefill(slot2)
    b_res = eng._slots[slot2]
    assert b_res.request_id == "B"
    # drive to completion; B's tokens must be exactly its own generation
    while eng.active_requests:
        eng.step()
    done = {r.request_id: r for r in eng.pop_finished()}
    assert done["A"].stop_reason == "cancelled"
    assert len(done["B"].token_ids) == 20, done["B"].token_ids


@pytest.mark.parametrize("scan,kv", [(False, "bf16"), (True, "bf16"),
                                     (True, "int8")])
def test_batched_admission_matches_per_request(scan, kv):
    """The grouped-admission prefill (batched_admission=True, the default)
    must produce token-identical results to per-request prefills — across
    cache layouts, KV dtypes, and a non-power-of-two group (pad rows whose
    OOB slots drop)."""
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [2, 2]][:3]   # group of 3
    gen = GenerationConfig(max_tokens=6, temperature=0.0, do_sample=False)

    def run(batched):
        rt = RuntimeConfig(max_batch_size=4, max_seq_len=64,
                           prefill_buckets=(16,), batched_admission=batched,
                           scan_layers=scan)
        eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32,
                              kv_cache_dtype=kv)
        with eng.deferred_admission():
            for i, p in enumerate(prompts):
                eng.begin_request(p, gen, request_id=f"r{i}")
        while eng.active_requests:
            eng.step()
        return {r.request_id: r.token_ids for r in eng.pop_finished()}

    assert run(True) == run(False)
