"""GroupNorm numerics: pallas (interpret) and xla backends vs a torch
reference (torch is the ground truth the reference compares against —
tests/operators/test_cudnn_convolution.py discipline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.ops.group_norm import group_norm, group_norm_pallas, group_norm_xla


def _torch_group_norm(x_nhwc, gamma, beta, groups, eps, silu=False):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
    y = F.group_norm(
        x,
        groups,
        torch.from_numpy(np.asarray(gamma, np.float32)),
        torch.from_numpy(np.asarray(beta, np.float32)),
        eps,
    )
    if silu:
        y = F.silu(y)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize(
    "n,h,w,c,groups",
    [
        (2, 8, 8, 320, 32),  # SD1.5 down-block channels (cpg=10, unaligned)
        (1, 4, 4, 128, 32),  # VAE channels
        (1, 16, 16, 64, 16),
    ],
)
@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_group_norm_matches_torch(n, h, w, c, groups, backend):
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, h, w, c), jnp.float32) * 2 + 0.5
    gamma = jnp.linspace(0.5, 1.5, c, dtype=jnp.float32)
    beta = jnp.linspace(-0.2, 0.2, c, dtype=jnp.float32)
    if backend == "pallas":
        out = group_norm_pallas(x, gamma, beta, groups=groups, interpret=True)
    else:
        out = group_norm_xla(x, gamma, beta, groups=groups)
    ref = _torch_group_norm(x, gamma, beta, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_group_norm_silu_fused(backend):
    key = jax.random.key(1)
    x = jax.random.normal(key, (1, 8, 8, 320), jnp.float32)
    gamma = jnp.ones((320,), jnp.float32)
    beta = jnp.zeros((320,), jnp.float32)
    kwargs = dict(groups=32, act="silu")
    if backend == "pallas":
        out = group_norm_pallas(x, gamma, beta, interpret=True, **kwargs)
    else:
        out = group_norm_xla(x, gamma, beta, **kwargs)
    ref = _torch_group_norm(x, gamma, beta, 32, 1e-5, silu=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_group_norm_bf16():
    key = jax.random.key(2)
    x = jax.random.normal(key, (1, 8, 8, 128), jnp.bfloat16)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    out = group_norm_pallas(x, gamma, beta, groups=32, interpret=True)
    ref = _torch_group_norm(x, gamma, beta, 32, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=3e-2, atol=3e-2)


def test_group_norm_multiblock_grid():
    # hw larger than the block cap → accumulation across grid steps
    key = jax.random.key(3)
    x = jax.random.normal(key, (1, 32, 64, 128), jnp.float32)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    out = group_norm_pallas(
        x, gamma, beta, groups=32, block_hw_cap=256, interpret=True
    )
    ref = _torch_group_norm(x, gamma, beta, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_auto_backend_on_cpu_is_xla():
    x = jnp.ones((1, 4, 4, 32))
    out = group_norm(x, jnp.ones((32,)), jnp.zeros((32,)), groups=8)
    np.testing.assert_allclose(np.asarray(out), np.zeros((1, 4, 4, 32)), atol=1e-5)


def test_group_norm_hybrid_matches_xla():
    """Pallas-stats + XLA-apply hybrid == the plain XLA path."""
    from sfast_tpu.ops.group_norm import group_norm_hybrid, group_norm_xla

    key = jax.random.key(4)
    x = jax.random.normal(key, (2, 8, 8, 96), jnp.float32)
    gamma = jax.random.normal(jax.random.key(5), (96,)) + 1
    beta = jax.random.normal(jax.random.key(6), (96,))
    got = group_norm_hybrid(
        x, gamma, beta, groups=16, act="silu", interpret=True
    )
    ref = group_norm_xla(x, gamma, beta, groups=16, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
