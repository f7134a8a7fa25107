"""On-device sampling chain tests (reference semantics:
inference_engine.cpp:323-437 temperature -> penalties -> top-k -> top-p)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppowers_tpu.config import GenerationConfig
from deeppowers_tpu.ops.sampling import (
    SamplingParams,
    apply_penalties,
    logprobs_of,
    sample,
    top_k_top_p_mask,
)


def params_for(b, **kw):
    cfg = GenerationConfig(**kw)
    return SamplingParams.from_config(cfg, b)


def test_greedy_takes_argmax():
    logits = jnp.array([[0.1, 3.0, -1.0, 0.5]])
    p = params_for(1, temperature=0.0, do_sample=False)
    tok = sample(logits, p, jax.random.PRNGKey(0))
    assert int(tok[0]) == 1


def test_temperature_zero_deterministic():
    # reference: test_generation.cpp:74-80 — determinism at temperature 0.
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    p = params_for(4, temperature=0.0, do_sample=False)
    t1 = sample(logits, p, jax.random.PRNGKey(2))
    t2 = sample(logits, p, jax.random.PRNGKey(3))  # different rng, same result
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_top_k_masks_everything_below():
    logits = jnp.array([[5.0, 4.0, 3.0, 2.0, 1.0]])
    masked = top_k_top_p_mask(logits, jnp.array([2]), jnp.array([1.0]))
    m = np.asarray(masked[0])
    assert m[0] > -1e29 and m[1] > -1e29
    assert (m[2:] < -1e29).all()


def test_top_k_zero_disables():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    masked = top_k_top_p_mask(logits, jnp.array([0]), jnp.array([1.0]))
    assert (np.asarray(masked) > -1e29).all()


def test_top_p_keeps_nucleus():
    # probs ~ [0.97, 0.018, ...]: top_p=0.5 keeps only the first token.
    logits = jnp.array([[8.0, 4.0, 3.0, 2.0, 1.0]])
    masked = top_k_top_p_mask(logits, jnp.array([0]), jnp.array([0.5]))
    m = np.asarray(masked[0])
    assert m[0] > -1e29
    assert (m[1:] < -1e29).all()


def test_top_p_always_keeps_one():
    logits = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    masked = top_k_top_p_mask(logits, jnp.array([0]), jnp.array([1e-9]))
    assert (np.asarray(masked) > -1e29).sum() >= 1


def test_per_slot_heterogeneous_params():
    """Different slots get different filtering in the same call — the
    continuous-batching requirement."""
    logits = jnp.tile(jnp.array([[5.0, 4.0, 3.0, 2.0]]), (2, 1))
    masked = top_k_top_p_mask(logits, jnp.array([1, 3]), jnp.array([1.0, 1.0]))
    m = np.asarray(masked)
    assert (m[0] > -1e29).sum() == 1
    assert (m[1] > -1e29).sum() == 3


def test_repetition_penalty_discourages_seen():
    logits = jnp.array([[2.0, 2.0]])
    counts = jnp.array([[1, 0]], dtype=jnp.int32)
    p = params_for(1, repetition_penalty=2.0)
    out = apply_penalties(logits, counts, p)
    assert float(out[0, 0]) == 1.0  # positive logit divided
    assert float(out[0, 1]) == 2.0


def test_repetition_penalty_negative_logit():
    logits = jnp.array([[-1.0]])
    counts = jnp.array([[3]], dtype=jnp.int32)
    p = params_for(1, repetition_penalty=2.0)
    out = apply_penalties(logits, counts, p)
    assert float(out[0, 0]) == -2.0  # negative logit multiplied


def test_presence_frequency_penalties():
    logits = jnp.zeros((1, 3))
    counts = jnp.array([[0, 1, 4]], dtype=jnp.int32)
    p = params_for(1, presence_penalty=0.5, frequency_penalty=0.25)
    out = np.asarray(apply_penalties(logits, counts, p))
    assert out[0, 0] == 0.0
    assert np.isclose(out[0, 1], -0.75)   # -0.5 - 0.25*1
    assert np.isclose(out[0, 2], -1.5)    # -0.5 - 0.25*4


def test_sampling_distribution_follows_probs():
    # one vectorized draw: categorical with a (B, V) batch samples each row
    # independently from a single key (300 sequential 1-row calls took 231s
    # of the suite's CPU budget; this is one dispatch)
    b = 1024
    logits = jnp.broadcast_to(jnp.log(jnp.array([[0.7, 0.2, 0.1]])), (b, 3))
    p = params_for(b, temperature=1.0, top_k=0, top_p=1.0)
    toks = np.asarray(sample(logits, p, jax.random.PRNGKey(0)))
    freq = np.bincount(toks, minlength=3) / b
    assert abs(freq[0] - 0.7) < 0.06


def test_min_tokens_suppresses_eos():
    logits = jnp.array([[10.0, 0.0]])  # EOS (id 0) dominates
    p = params_for(1, temperature=0.0, do_sample=False, min_tokens=5)
    tok = sample(logits, p, jax.random.PRNGKey(0),
                 generated_counts=jnp.array([2], dtype=jnp.int32),
                 eos_token_id=0)
    assert int(tok[0]) == 1  # EOS suppressed
    tok2 = sample(logits, p, jax.random.PRNGKey(0),
                  generated_counts=jnp.array([6], dtype=jnp.int32),
                  eos_token_id=0)
    assert int(tok2[0]) == 0


def test_logprobs_of():
    logits = jnp.log(jnp.array([[0.5, 0.25, 0.25]]))
    lp = logprobs_of(logits, jnp.array([0]))
    assert np.isclose(float(lp[0]), np.log(0.5), atol=1e-5)


def test_logit_bias_bans_and_forces():
    # OpenAI semantics: -100 bans, +100 forces — including for greedy slots
    logits = jnp.array([[5.0, 0.0, -1.0]])
    banned = params_for(1, temperature=0.0, do_sample=False,
                        logit_bias={0: -100.0})
    assert int(sample(logits, banned, jax.random.PRNGKey(0))[0]) == 1
    forced = params_for(1, temperature=1.0, top_k=0, top_p=1.0,
                        logit_bias={2: 100.0})
    assert int(sample(logits, forced, jax.random.PRNGKey(0))[0]) == 2


def test_logit_bias_in_processed_probs():
    from deeppowers_tpu.ops.sampling import processed_probs
    logits = jnp.array([[1.0, 1.0, 1.0]])
    p = params_for(1, temperature=1.0, top_k=0, top_p=1.0,
                   logit_bias={1: -100.0})
    probs = np.asarray(processed_probs(logits, p))
    assert probs[0, 1] < 1e-6
    assert abs(probs[0].sum() - 1.0) < 1e-5


def test_logit_bias_cap_validates():
    from deeppowers_tpu.config import GenerationConfig
    from deeppowers_tpu.ops.sampling import LOGIT_BIAS_SLOTS
    cfg = GenerationConfig(
        logit_bias={i: 1.0 for i in range(LOGIT_BIAS_SLOTS + 1)})
    with pytest.raises(ValueError):
        cfg.validate()


def test_jit_compatible():
    @jax.jit
    def f(logits, p, key):
        return sample(logits, p, key)

    p = params_for(2, temperature=0.8)
    toks = f(jax.random.normal(jax.random.PRNGKey(0), (2, 32)), p,
             jax.random.PRNGKey(1))
    assert toks.shape == (2,)
