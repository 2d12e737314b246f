"""Linear/LayerNorm/conv2d numerics vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.ops.linear import linear, linear_gelu, linear_relu, linear_add
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.conv import conv2d


def test_linear_matches_torch():
    import torch

    keys = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(keys[0], (4, 32), jnp.float32)
    w = jax.random.normal(keys[1], (32, 16), jnp.float32)
    b = jax.random.normal(keys[2], (16,), jnp.float32)
    ref = (
        torch.from_numpy(np.asarray(x)) @ torch.from_numpy(np.asarray(w))
        + torch.from_numpy(np.asarray(b))
    ).numpy()
    np.testing.assert_allclose(np.asarray(linear(x, w, b)), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(linear_relu(x, w, b)), np.maximum(ref, 0), rtol=1e-5, atol=1e-5
    )


def test_linear_gelu_matches_torch():
    import torch
    import torch.nn.functional as F

    keys = jax.random.split(jax.random.key(1), 2)
    x = jax.random.normal(keys[0], (4, 32), jnp.float32)
    w = jax.random.normal(keys[1], (32, 16), jnp.float32)
    ref = F.gelu(torch.from_numpy(np.asarray(x)) @ torch.from_numpy(np.asarray(w)))
    np.testing.assert_allclose(
        np.asarray(linear_gelu(x, w)), ref.numpy(), rtol=1e-4, atol=1e-4
    )


def test_linear_add():
    keys = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(keys[0], (4, 8), jnp.float32)
    w = jax.random.normal(keys[1], (8, 8), jnp.float32)
    r = jax.random.normal(keys[2], (4, 8), jnp.float32)
    out = linear_add(x, w, None, r)
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(r)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    import torch
    import torch.nn.functional as F

    key = jax.random.key(3)
    x = jax.random.normal(key, (2, 7, 64), jnp.float32) * 3 + 1
    g = jnp.linspace(0.5, 2.0, 64, dtype=jnp.float32)
    b = jnp.linspace(-1, 1, 64, dtype=jnp.float32)
    ref = F.layer_norm(
        torch.from_numpy(np.asarray(x)),
        (64,),
        torch.from_numpy(np.asarray(g)),
        torch.from_numpy(np.asarray(b)),
        1e-5,
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(layer_norm(x, g, b)), ref, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "stride,padding,cin,cout,k",
    [(1, 1, 8, 16, 3), (2, 1, 8, 8, 3), (1, 0, 4, 4, 1)],
)
def test_conv2d_matches_torch(stride, padding, cin, cout, k):
    import torch
    import torch.nn.functional as F

    keys = jax.random.split(jax.random.key(4), 3)
    x = jax.random.normal(keys[0], (2, 16, 16, cin), jnp.float32)
    w = jax.random.normal(keys[1], (k, k, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(keys[2], (cout,), jnp.float32)

    out = conv2d(x, w, b, stride=stride, padding=padding)

    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.asarray(w)).permute(3, 2, 0, 1)
    bt = torch.from_numpy(np.asarray(b))
    ref = F.conv2d(xt, wt, bt, stride=stride, padding=padding)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_conv2d_fused_residual_silu():
    import torch
    import torch.nn.functional as F

    keys = jax.random.split(jax.random.key(5), 3)
    x = jax.random.normal(keys[0], (1, 8, 8, 4), jnp.float32)
    w = jax.random.normal(keys[1], (3, 3, 4, 4), jnp.float32) * 0.2
    r = jax.random.normal(keys[2], (1, 8, 8, 4), jnp.float32)

    out = conv2d(x, w, None, padding=1, residual=r, act="silu")

    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.asarray(w)).permute(3, 2, 0, 1)
    rt = torch.from_numpy(np.asarray(r)).permute(0, 3, 1, 2)
    ref = F.silu(F.conv2d(xt, wt, padding=1) + rt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_conv2d_bf16_out_gate(monkeypatch):
    """SFAST_TPU_CONV_BF16_OUT is read at TRACE time (ADVICE r4 low):
    setting it after import must take effect, and the bf16-output path
    must stay within one bf16 rounding of the f32-epilogue path."""
    keys = jax.random.split(jax.random.key(7), 3)
    x = jax.random.normal(keys[0], (1, 8, 8, 8), jnp.bfloat16)
    w = (jax.random.normal(keys[1], (3, 3, 8, 8), jnp.bfloat16) * 0.2).astype(
        jnp.bfloat16
    )
    b = jax.random.normal(keys[2], (8,), jnp.bfloat16)

    monkeypatch.setenv("SFAST_TPU_CONV_BF16_OUT", "0")
    ref = np.asarray(
        conv2d(x, w, b, padding=1, act="silu"), dtype=np.float32
    )
    monkeypatch.setenv("SFAST_TPU_CONV_BF16_OUT", "1")
    got = np.asarray(
        conv2d(x, w, b, padding=1, act="silu"), dtype=np.float32
    )
    # bf16 epilogue: one extra rounding of the conv output (~2^-8 rel)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
