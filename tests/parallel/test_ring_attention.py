"""Ring attention vs single-device attention on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sfast_tpu.ops.attention import xla_attention
from sfast_tpu.parallel import make_mesh
from sfast_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("s,d", [(128, 32), (256, 64)])
def test_ring_matches_single_device(s, d):
    mesh = make_mesh((8,), ("sp",))
    keys = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(keys[0], (2, 4, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (2, 4, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (2, 4, s, d), jnp.float32)

    ref = xla_attention(q, k, v)

    sharding = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))
    with mesh:
        out = ring_attention(qs, ks, vs, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ring_attention_jits_under_mesh():
    mesh = make_mesh((8,), ("sp",))
    q = jax.random.normal(jax.random.key(1), (1, 2, 64, 16), jnp.float32)
    sharding = NamedSharding(mesh, P(None, None, "sp", None))
    qs = jax.device_put(q, sharding)
    with mesh:
        fn = jax.jit(lambda a: ring_attention(a, a, a, mesh=mesh))
        out = fn(qs)
    ref = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
