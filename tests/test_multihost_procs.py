"""Real multi-process coordination: leader and follower as separate OS
processes over jax.distributed (VERDICT round 1 item 3).

tests/test_multihost.py exercises the wire format and lockstep logic where
the broadcast is the identity; here broadcast_one_to_all actually crosses a
process boundary (2 processes, CPU backend, distributed coordinator on
localhost), and both processes' generations must match a single-process run
token-for-token.

Reference analogue: the MPI bootstrap + broadcast the reference's
DistributedContext does natively (reference:
src/core/distributed/distributed_context.cpp:19-55,124-142) — here it's
jax.distributed + multihost_utils, per SURVEY.md §5.8.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [str(tmp / f"out{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers pick their own device count
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_leader_follower_agree(two_process_results):
    leader, follower = two_process_results
    assert leader["pid"] == 0 and follower["pid"] == 1
    # every decode-step token stream must be identical across processes
    assert leader["steps"] == follower["steps"]
    assert leader["finished"] == follower["finished"]
    assert leader["steps"], "no tokens generated"


@pytest.fixture(scope="module")
def serving_spec(tmp_path_factory):
    """Reference run (single process, in-proc scheduler) + the request set
    the 2-process leader will serve over HTTP: one stop-sequence request,
    one guided (structured-output) request."""
    import jax.numpy as jnp
    from deeppowers_tpu.config import (GenerationConfig, RuntimeConfig,
                                       SchedulerConfig)
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine
    from deeppowers_tpu.serving import Scheduler
    from deeppowers_tpu.serving.request import Request
    from deeppowers_tpu.serving.structured import guide_for_choice
    from deeppowers_tpu.serving.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    cfg = tiny_test_config(vocab_size=tok.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,))

    def make_sched():
        eng = InferenceEngine(params, cfg, runtime=rt,
                              act_dtype=jnp.float32)
        s = Scheduler(eng, encode=tok.encode, decode=tok.decode,
                      config=SchedulerConfig())
        s.tokenizer = tok
        s.start()
        return s

    # derive a stop string that actually fires: substring of the untruncated
    # greedy continuation
    s0 = make_sched()
    probe = s0.submit_sync(Request(prompt="ab", config=GenerationConfig(
        max_tokens=12, temperature=0.0, do_sample=False)), timeout=300)
    assert probe.result.stop_reason == "max_tokens", probe.error
    full_text = probe.result.text
    stop = full_text[3:5]
    assert stop and stop in full_text
    s0.stop()

    sched = make_sched()
    ref_stop = sched.submit_sync(Request(prompt="ab", config=GenerationConfig(
        max_tokens=12, temperature=0.0, do_sample=False,
        stop_tokens=(stop,))), timeout=300)
    ref_guided = sched.submit_sync(Request(
        prompt="ab", config=GenerationConfig(
            max_tokens=12, temperature=0.0, do_sample=False,
            guide=guide_for_choice(["cat", "dog"], tok))), timeout=300)
    sched.stop()
    assert ref_stop.result.stop_reason == "stop_string"
    assert ref_guided.result.text in ("cat", "dog")

    return {
        "stop": stop,
        "ref": [
            {"text": ref_stop.result.text,
             "tokens": ref_stop.result.token_ids,
             "stop_reason": ref_stop.result.stop_reason},
            {"text": ref_guided.result.text,
             "tokens": ref_guided.result.token_ids,
             "stop_reason": ref_guided.result.stop_reason},
        ],
        "requests": [
            {"prompt": "ab", "max_tokens": 12, "temperature": 0.0,
             "do_sample": False, "stop": [stop]},
            {"prompt": "ab", "max_tokens": 12, "temperature": 0.0,
             "do_sample": False, "guided_choice": ["cat", "dog"]},
        ],
    }


@pytest.fixture(scope="module")
def two_process_serving(serving_spec, tmp_path_factory):
    """Leader HTTP server + follower replay as 2 real OS processes."""
    tmp = tmp_path_factory.mktemp("mhserve")
    coord = f"127.0.0.1:{_free_port()}"
    spec_path = str(tmp / "spec.json")
    json.dump({"port": _free_port(),
               "requests": serving_spec["requests"]}, open(spec_path, "w"))
    outs = [str(tmp / f"out{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_REPO, "tests", "multihost_serve_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), spec_path, outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("serving workers timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"serve worker {i} failed:\n{logs[i][-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_http_serving_over_two_processes(serving_spec, two_process_serving):
    """An HTTP request served by a 2-process leader/follower pair returns
    token-identical output to a single-process run — including a stop
    sequence and a guided (structured-output) request."""
    leader, follower = two_process_serving
    assert leader["pid"] == 0 and follower["pid"] == 1
    for got, ref in zip(leader["results"], serving_spec["ref"]):
        assert got["text"] == ref["text"]
        assert got["tokens"] == ref["tokens"]
        assert got["stop_reason"] == ref["stop_reason"]
    # the follower's engine saw the exact same token stream per request
    fin = follower["finished"]
    for got in leader["results"]:
        assert fin.get(got["id"]) == got["tokens"], \
            f"follower diverged for {got['id']}"


def test_follower_divergence_detected(tmp_path):
    """A follower whose state drifts mid-stream must fail LOUDLY: the
    injected fault (corrupted lengths mirror after the 3rd command) is
    caught by the next digest-carrying command as MultihostDivergence —
    not silently replayed past (VERDICT r3 weak #5)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(_REPO, "tests", "multihost_diverge_worker.py")
    outs = [str(tmp_path / f"div{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("divergence workers timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    leader, follower = [json.load(open(o)) for o in outs]
    assert follower["divergence"], \
        "follower fault went undetected (no MultihostDivergence)"
    assert "digest mismatch" in follower["divergence"]
    assert leader["finished"] == 1      # leader kept serving regardless


def test_matches_single_process(two_process_results):
    """The 2-process lockstep generation equals a plain single-process run
    of the same requests (same params seed, greedy)."""
    from deeppowers_tpu.config import GenerationConfig, RuntimeConfig
    from deeppowers_tpu.models.presets import tiny_test_config
    from deeppowers_tpu.models.transformer import init_params
    from deeppowers_tpu.runtime.engine import InferenceEngine

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rt = RuntimeConfig(max_batch_size=2, max_seq_len=64,
                       prefill_buckets=(16,))
    eng = InferenceEngine(params, cfg, runtime=rt, act_dtype=jnp.float32)
    ref0 = eng.generate([1, 2, 3], GenerationConfig(
        max_tokens=6, temperature=0.0, do_sample=False)).token_ids
    ref1 = eng.generate([4, 5], GenerationConfig(
        max_tokens=4, temperature=0.0, do_sample=False)).token_ids

    leader = two_process_results[0]
    seqs = sorted(leader["finished"].values(), key=len)
    assert sorted([ref0, ref1], key=len) == seqs
