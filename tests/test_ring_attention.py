"""Ring attention (sequence parallelism) exactness tests on the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from deeppowers_tpu.ops.attention import attention_prefill, repeat_kv
from deeppowers_tpu.ops.ring_attention import ring_attention

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def run_ring(q, k, v, num_devices, lengths=None):
    mesh = Mesh(np.asarray(jax.devices()[:num_devices]), ("sp",))
    in_specs = (P(None, "sp"), P(None, "sp"), P(None, "sp"))
    args = (q, k, v)
    if lengths is not None:
        in_specs = in_specs + (P(),)
        args = args + (lengths,)

        def f(q, k, v, lens):
            return ring_attention(q, k, v, "sp", lengths=lens)
    else:
        def f(q, k, v):
            return ring_attention(q, k, v, "sp")

    mapped = shard_map(f, mesh=mesh, in_specs=in_specs,
                       out_specs=P(None, "sp"), check_vma=False)
    return jax.jit(mapped)(*args)


@pytest.mark.parametrize("p", [2, 4, 8])
def test_matches_single_device(p):
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    ref = attention_prefill(q, k, v, use_flash=False)
    out = run_ring(q, k, v, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_with_lengths():
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    lens = jnp.array([32, 20], dtype=jnp.int32)
    ref = attention_prefill(q, k, v, lengths=lens, use_flash=False)
    out = run_ring(q, k, v, 4, lengths=lens)
    for i in range(b):
        L = int(lens[i])
        np.testing.assert_allclose(np.asarray(out[i, :L]),
                                   np.asarray(ref[i, :L]),
                                   rtol=2e-4, atol=2e-4)


def test_gqa_via_pre_repeat():
    rng = np.random.default_rng(2)
    b, s, h, kvh, d = 1, 32, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, kvh, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, kvh, d)), dtype=jnp.float32)
    ref = attention_prefill(q, k, v, use_flash=False)
    out = run_ring(q, repeat_kv(k, 2), repeat_kv(v, 2), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
