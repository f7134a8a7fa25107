"""Prefix caching for the contiguous/stacked KV layouts.

The paged layout shares prompt KV by page mapping (test_paged_kv.py); here
retired slots' resident rows are COPIED (kvcache.copy_prefix) and only the
suffix prefills. Acceptance: outputs are bit-identical to a no-cache engine
(the copy is exact — causal rows depend only on the prefix), and the index
reports hits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.runtime.prefix_index import SlotPrefixIndex

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
GREEDY = GenerationConfig(max_tokens=10, temperature=0.0, do_sample=False)

LONG = list(np.random.RandomState(0).randint(1, 120, 48))


def make(prefix=True, **kw):
    rt_kw = dict(max_batch_size=4, max_seq_len=256,
                 prefill_buckets=(16, 32, 64), prefill_chunk_size=16,
                 enable_prefix_cache=prefix)
    rt_kw.update(kw.pop("rt", {}))
    kw.setdefault("act_dtype", jnp.float32)
    return InferenceEngine(PARAMS, CFG, runtime=RuntimeConfig(**rt_kw), **kw)


# ---------------------------------------------------------------------------
# SlotPrefixIndex unit behavior
# ---------------------------------------------------------------------------

def test_index_matches_longest_prefix():
    idx = SlotPrefixIndex(4, min_tokens=4)
    idx.register(0, [1, 2, 3, 4, 5])
    idx.register(1, [1, 2, 3, 4, 5, 6, 7, 8])
    src, n = idx.match([1, 2, 3, 4, 5, 6, 7, 99, 100], exclude=-1)
    assert (src, n) == (1, 7)
    # capped at len(prompt) - 1: at least one token must prefill
    src, n = idx.match([1, 2, 3, 4, 5, 6, 7, 8], exclude=-1)
    assert (src, n) == (1, 7)


def test_index_threshold_and_exclude():
    idx = SlotPrefixIndex(2, min_tokens=8)
    idx.register(0, [1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert idx.match([1, 2, 3, 9, 9, 9, 9, 9, 9], exclude=-1) == (-1, 0)
    assert idx.match(list(range(1, 10)) + [9], exclude=0) == (-1, 0)
    src, n = idx.match([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], exclude=-1)
    assert (src, n) == (0, 9)
    idx.record_hit(n)
    assert idx.hits == 1 and idx.hit_tokens == 9


def test_index_extend():
    idx = SlotPrefixIndex(1, min_tokens=4)
    idx.register(0, [1, 2, 3])
    idx.extend(0, [4, 5, 6])
    src, n = idx.match([1, 2, 3, 4, 5, 6, 7], exclude=-1)
    assert (src, n) == (0, 6)


# ---------------------------------------------------------------------------
# End-to-end: copied prefixes are bit-exact
# ---------------------------------------------------------------------------

def test_repeat_prompt_hits_and_matches_nocache():
    base = make(prefix=False).generate(LONG, GREEDY)
    eng = make()
    r1 = eng.generate(LONG, GREEDY)
    r2 = eng.generate(LONG, GREEDY)          # prefix-copy hit
    assert r1.token_ids == base.token_ids
    assert r2.token_ids == base.token_ids
    stats = eng.prefix_cache_stats
    assert stats["hits"] == 1 and stats["hit_tokens"] == len(LONG) - 1


def test_shared_system_prompt_partial_match():
    tail = [121, 122, 123, 124]
    base = make(prefix=False).generate(LONG[:32] + tail, GREEDY)
    eng = make()
    eng.generate(LONG, GREEDY)
    r = eng.generate(LONG[:32] + tail, GREEDY)   # 32-token shared prefix
    assert r.token_ids == base.token_ids
    assert eng.prefix_cache_stats["hit_tokens"] == 32


def test_multiturn_reuses_generated_rows():
    """Turn 2's prompt = turn 1's prompt + reply: the extend() path makes the
    generated rows matchable."""
    eng = make()
    r1 = eng.generate(LONG, GREEDY)
    turn2 = LONG + r1.token_ids[:-1] + [99, 98]
    base = make(prefix=False).generate(turn2, GREEDY)
    r2 = eng.generate(turn2, GREEDY)
    assert r2.token_ids == base.token_ids
    assert eng.prefix_cache_stats["hit_tokens"] >= len(LONG) + len(
        r1.token_ids) - 1


@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_quantized_kv_copy_exact(kv_dtype):
    base = make(prefix=False, kv_cache_dtype=kv_dtype).generate(LONG, GREEDY)
    eng = make(kv_cache_dtype=kv_dtype)
    eng.generate(LONG, GREEDY)
    r2 = eng.generate(LONG, GREEDY)
    assert r2.token_ids == base.token_ids


def test_stacked_layout_copy():
    base = make(prefix=False, rt={"scan_layers": True}).generate(LONG, GREEDY)
    eng = make(rt={"scan_layers": True})
    assert eng.scan_layers
    eng.generate(LONG, GREEDY)
    r2 = eng.generate(LONG, GREEDY)
    assert r2.token_ids == base.token_ids
    assert eng.prefix_cache_stats["hits"] == 1


def test_prefix_with_speculation():
    rt = {"speculative_tokens": 3, "speculative_ngram": 2}
    base = make(prefix=False, rt=rt).generate(LONG, GREEDY)
    eng = make(rt=rt)
    eng.generate(LONG, GREEDY)
    r2 = eng.generate(LONG, GREEDY)
    assert r2.token_ids == base.token_ids
    assert eng.prefix_cache_stats["hits"] == 1


def test_slot_reuse_invalidates_source():
    """After a slot is reassigned, its old rows must never be claimed: fill
    all slots with new prompts, then re-send the first prompt — the output
    must still be exact (match either fresh-prefill or a copy from a VALID
    source)."""
    eng = make()
    base = make(prefix=False).generate(LONG, GREEDY)
    r1 = eng.generate(LONG, GREEDY)
    assert r1.token_ids == base.token_ids
    # burn through all 4 slots with unrelated prompts (sequential: each
    # generate reuses slot 0 round-robin via free_slots[0])
    for i in range(5):
        eng.generate([100 + i] * 20, GenerationConfig(
            max_tokens=4, temperature=0.0, do_sample=False))
    r2 = eng.generate(LONG, GREEDY)
    assert r2.token_ids == base.token_ids
