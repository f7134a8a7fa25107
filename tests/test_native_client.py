"""Native C++ client SDK end-to-end test: dpclient binary -> HTTP server
-> scheduler -> engine (reference: api::Model C++ surface + client_sdk
retry semantics)."""

import os
import subprocess

import jax
import jax.numpy as jnp
import pytest

from deeppowers_tpu.config import GenerationConfig, RuntimeConfig, SchedulerConfig
from deeppowers_tpu.models.presets import tiny_test_config
from deeppowers_tpu.models.transformer import init_params
from deeppowers_tpu.runtime.engine import InferenceEngine
from deeppowers_tpu.serving import APIServer, ByteTokenizer, Scheduler

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_BIN = os.path.join(_REPO, "native", "build", "dpclient")


def _ensure_built():
    if os.path.exists(_BIN):
        return True
    try:
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_BIN)
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _ensure_built(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def server():
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
    sched.start()
    srv = APIServer(sched, port=0)
    srv.start()
    yield srv
    srv.stop()
    sched.stop()


def test_cpp_client_generate(server):
    out = subprocess.run(
        [_BIN, "127.0.0.1", str(server.port), "hello world", "5", "0"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    # tiny random model output is arbitrary bytes; success + non-error is
    # the contract (text may decode to replacement chars)
    assert out.stderr == ""


def test_cpp_client_retries_then_fails():
    out = subprocess.run(
        [_BIN, "127.0.0.1", "1", "x", "2"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 1
    assert "error" in out.stderr


def test_cpp_client_stream(server):
    """SSE streaming: deltas arrive incrementally, stream completes
    (reference: client_sdk generate_stream + SSE chunked wire)."""
    out = subprocess.run(
        [_BIN, "--stream", "127.0.0.1", str(server.port),
         "hello stream", "8", "0"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "[stream ok:" in out.stderr
    # at least one delta must have arrived over the stream
    import re
    m = re.search(r"(\d+) deltas", out.stderr)
    assert m and int(m.group(1)) >= 1, out.stderr


def test_cpp_client_async(server):
    """generate_async futures: two concurrent requests both complete and
    client metrics count them (reference: client_sdk.hpp:38-58)."""
    out = subprocess.run(
        [_BIN, "--async", "127.0.0.1", str(server.port), "hi", "4", "0"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "[async ok: requests=2" in out.stderr
