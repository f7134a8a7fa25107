"""Multi-host coordination tests (single-process path; the broadcast is the
identity — wire format and lockstep application are what's under test)."""

import jax
import jax.numpy as jnp
import numpy as np

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
from deeppowers_tpu.models.presets import tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.serving.multihost import (
    Admission,
    CoordinatedEngine,
    StepDecision,
    decode_decision,
    encode_decision,
)


def test_decision_roundtrip():
    d = StepDecision(
        admissions=[
            Admission(slot=2, token_ids=[5, 6, 7],
                      gen=GenerationConfig(max_tokens=9, temperature=0.5,
                                           top_k=7, top_p=0.8, seed=42)),
            Admission(slot=0, token_ids=[1],
                      gen=GenerationConfig(temperature=0.0, do_sample=False)),
        ],
        decode_steps=3)
    back = decode_decision(*encode_decision(d, max_prompt=16))
    assert back.decode_steps == 3
    assert not back.stop
    assert len(back.admissions) == 2
    a0 = back.admissions[0]
    assert a0.slot == 2 and a0.token_ids == [5, 6, 7]
    assert a0.gen.max_tokens == 9 and a0.gen.top_k == 7
    assert np.isclose(a0.gen.temperature, 0.5)
    assert a0.gen.seed == 42
    a1 = back.admissions[1]
    assert a1.gen.do_sample is False and a1.gen.seed is None


def test_stop_roundtrip():
    back = decode_decision(*encode_decision(StepDecision(stop=True), 8))
    assert back.stop


def test_coordinated_engine_matches_direct():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64, prefill_buckets=(16,))
    gen = GenerationConfig(max_tokens=5, temperature=0.0, do_sample=False)

    ref = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32
                          ).generate([1, 2, 3], gen).token_ids

    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    driver = CoordinatedEngine(eng, max_prompt=16)
    assert driver.is_leader
    d, toks = driver.run(StepDecision(
        admissions=[Admission(slot=0, token_ids=[1, 2, 3], gen=gen,
                              request_id="r0")],
        decode_steps=10))
    done = eng.pop_finished()[0]
    assert done.token_ids == ref
