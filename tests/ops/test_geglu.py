"""Fused GEGLU numerics vs torch reference (≙ reference
tests/operators/test_cutlass_dual_linear.py:42-58 parametrized sweep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.ops.geglu import linear_geglu, linear_geglu_pallas, linear_geglu_xla


def _torch_geglu(x, w, b, approximate="none"):
    """Literal replica of diffusers.models.activations.GEGLU.forward:
    ``hidden_states, gate = proj(x).chunk(2, -1); hidden_states * gelu(gate)``
    (the convention the reference fuses in jit_pass_fuse_linear_geglu)."""
    import torch
    import torch.nn.functional as F

    xt = torch.from_numpy(np.asarray(x, np.float32))
    wt = torch.from_numpy(np.asarray(w, np.float32))
    bt = torch.from_numpy(np.asarray(b, np.float32))
    y = xt @ wt + bt
    hidden_states, gate = y.chunk(2, dim=-1)
    return (hidden_states * F.gelu(gate, approximate=approximate)).numpy()


@pytest.mark.parametrize(
    "m,k,f",
    [
        (64, 128, 256),
        (256, 256, 512),
        (8, 384, 128),  # k not a multiple of block_k cap
    ],
)
@pytest.mark.parametrize("use_bias", [True, False])
def test_geglu_pallas_matches_torch(m, k, f, use_bias):
    keys = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(keys[0], (m, k), jnp.float32) * 0.5
    w = jax.random.normal(keys[1], (k, 2 * f), jnp.float32) * 0.05
    b = (
        jax.random.normal(keys[2], (2 * f,), jnp.float32)
        if use_bias
        else jnp.zeros((2 * f,), jnp.float32)
    )
    out = linear_geglu_pallas(x, w, b if use_bias else None, interpret=True)
    # the Pallas kernel uses tanh-approx GELU (Mosaic has no erf), like the
    # reference's CUTLASS tanh.approx epilogue
    ref = _torch_geglu(x, w, b, approximate="tanh")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_geglu_xla_matches_torch():
    keys = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(keys[0], (32, 64), jnp.float32)
    w = jax.random.normal(keys[1], (64, 128), jnp.float32) * 0.1
    b = jax.random.normal(keys[2], (128,), jnp.float32)
    out = linear_geglu_xla(x, w, b)
    ref = _torch_geglu(x, w, b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_geglu_batched_leading_dims():
    keys = jax.random.split(jax.random.key(2), 2)
    x = jax.random.normal(keys[0], (2, 16, 128), jnp.float32)
    w = jax.random.normal(keys[1], (128, 256), jnp.float32) * 0.1
    out = linear_geglu_pallas(x, w, None, interpret=True)
    ref = linear_geglu_xla(x, w, None)
    assert out.shape == (2, 16, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_geglu_tanh_approx():
    keys = jax.random.split(jax.random.key(3), 2)
    x = jax.random.normal(keys[0], (16, 128), jnp.float32)
    w = jax.random.normal(keys[1], (128, 256), jnp.float32) * 0.1
    a = linear_geglu_pallas(x, w, None, approx_gelu=True, interpret=True)
    b = linear_geglu_xla(x, w, None, approx_gelu=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
