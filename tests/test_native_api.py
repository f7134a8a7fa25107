"""In-process C++ API (native/dpapi.cpp): build + drive the demo binary.

The demo embeds CPython, loads a tiny preset on the XLA:CPU backend and
exercises all three generation surfaces (generate / generate_batch /
generate_stream with a C++ callback). Mirrors the reference's in-process
C++ smoke (reference: examples/cpp/text_generation.cpp); the wire-protocol
client SDK is covered separately in test_native_client.py.
"""

import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")
DEMO = os.path.join(NATIVE, "build", "dpapi_demo")


def _have_toolchain() -> bool:
    if shutil.which("g++") is None:
        return False
    return subprocess.run(["python3-config", "--includes"],
                          capture_output=True).returncode == 0


pytestmark = pytest.mark.skipif(not _have_toolchain(),
                                reason="no g++/python3-config")


@pytest.fixture(scope="module")
def demo_bin():
    r = subprocess.run(["make", "-C", NATIVE, "api"], capture_output=True,
                       timeout=180)
    assert r.returncode == 0, r.stderr.decode()[:800]
    assert os.path.exists(DEMO)
    return DEMO


def _run(demo_bin, *args):
    env = dict(os.environ, DP_PLATFORM="cpu", DP_PACKAGE_ROOT=ROOT)
    return subprocess.run([demo_bin, *args], capture_output=True,
                          timeout=360, env=env)


def test_cpp_inprocess_generate(demo_bin):
    r = _run(demo_bin, "tiny-llama")
    out = r.stdout.decode()
    assert r.returncode == 0, (out, r.stderr.decode()[:800])
    assert "DPAPI_OK" in out
    assert "generate: 8 chars" in out          # greedy max_tokens=8
    assert "generate_batch: 2 results" in out
    assert "generate_stream:" in out
    assert "model=tiny-llama" in out


def test_cpp_inprocess_quantized(demo_bin):
    # int4 g128 through the same in-process surface: the engine quantizes
    # at load and decodes through the Pallas dequant path (interpret mode
    # on CPU)
    r = _run(demo_bin, "tiny-llama", "int4")
    out = r.stdout.decode()
    assert r.returncode == 0, (out, r.stderr.decode()[:800])
    assert "DPAPI_OK" in out
