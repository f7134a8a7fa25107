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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module. A full-suite run
    accumulates many hundreds of compilations in one process; past ~75% the
    XLA:CPU compiler has crashed (SIGSEGV/SIGABRT in
    backend_compile_and_load) under that load. Bounding the live-executable
    set keeps the suite stable; per-module recompiles are the price."""
    yield
    jax.clear_caches()
jax.config.update("jax_threefry_partitionable", True)
# Exactness-sensitive tests (decode == prefill) need real f32 matmuls even if
# a future change runs tests on TPU, where DEFAULT precision is bf16.
jax.config.update("jax_default_matmul_precision", "highest")
