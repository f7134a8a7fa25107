"""Test configuration: force an 8-device virtual CPU platform.

This is the JAX-standard way to test multi-device sharding without a pod
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count). Note: the
axon TPU plugin ignores the JAX_PLATFORMS *env var*, so the config update
after import (before first backend use) is what actually forces CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound (~90% of its
# wall clock is XLA:CPU compiles), and the per-module clear_caches below
# (SIGSEGV workaround) used to force recompiles of the same programs. With
# the persistent cache those recompiles become disk loads — measured 2.3x
# on test_scan_layers, and the whole suite drops well under the 5-minute
# -n 4 budget once warm (VERDICT r2 item 7). Machine-local, shared by all
# xdist workers and the multi-process worker subprocesses.
_cache_dir = os.environ.get(
    "DPT_TEST_XLA_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "deeppowers_tpu",
                 "xla_test_cache"))
if _cache_dir and _cache_dir != "off":
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    # subprocess-based tests (multihost workers) inherit via env
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.3")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module. A full-suite run
    accumulates many hundreds of compilations in one process; past ~75% the
    XLA:CPU compiler has crashed (SIGSEGV/SIGABRT in
    backend_compile_and_load) under that load. Bounding the live-executable
    set keeps the suite stable; the per-module recompiles this used to cost
    are now persistent-cache loads (see above)."""
    yield
    jax.clear_caches()
jax.config.update("jax_threefry_partitionable", True)
# Exactness-sensitive tests (decode == prefill) need real f32 matmuls even if
# a future change runs tests on TPU, where DEFAULT precision is bf16.
jax.config.update("jax_default_matmul_precision", "highest")


# Known-slow tests (>15 s warm at -n 4): dispatch them FIRST so the xdist
# tail is not stretched by a 40 s test starting late in the run — measured
# ~40 s off the suite wall clock at identical total work.
_SLOW_FIRST = (
    "test_70b_structure",
    "test_multihost_procs",
    "test_kt_attention",
    "test_optimizer_eval",
    "test_parallel",
    "test_gptq",
    "test_serving_load",
    "test_native_api",
)


def pytest_collection_modifyitems(items):
    def rank(item):
        for i, name in enumerate(_SLOW_FIRST):
            if name in item.nodeid:
                return i
        return len(_SLOW_FIRST)
    items.sort(key=rank)
