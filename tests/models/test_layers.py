"""Layer-level numerics vs hand-built torch equivalents (diffusers is not
installed in this image, so blocks are cross-checked against torch
modules implementing the same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.models import layers as L


def test_sinusoidal_timestep_embedding_matches_diffusers_semantics():
    # diffusers Timesteps(320, flip_sin_to_cos=True, downscale_freq_shift=0)
    import torch
    import math

    t = jnp.array([0.0, 1.0, 500.0, 999.0])
    out = L.sinusoidal_timestep_embedding(t, 320)

    tt = torch.tensor([0.0, 1.0, 500.0, 999.0])
    half = 160
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = tt[:, None] * exponent.exp()[None, :]
    ref = torch.cat([emb.cos(), emb.sin()], dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_resnet_block_matches_torch():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    cin, cout, temb_dim, groups = 32, 64, 128, 8
    rng = jax.random.key(0)
    p = L.init_resnet_block(rng, cin, cout, temb_dim, dtype=jnp.float32)

    x = jax.random.normal(jax.random.key(1), (2, 8, 8, cin), jnp.float32)
    temb = jax.random.normal(jax.random.key(2), (2, temb_dim), jnp.float32)
    out = L.resnet_block_fwd(p, x, temb, groups=groups, gn_backend="xla")

    # torch equivalent using the same weights
    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    xt = t(x).permute(0, 3, 1, 2)
    h = F.group_norm(xt, groups, t(p["norm1"]["scale"]), t(p["norm1"]["bias"]), 1e-5)
    h = F.silu(h)
    h = F.conv2d(h, t(p["conv1"]["w"]).permute(3, 2, 0, 1), t(p["conv1"]["b"]), padding=1)
    te = F.silu(t(temb)) @ t(p["time_emb_proj"]["w"]) + t(p["time_emb_proj"]["b"])
    h = h + te[:, :, None, None]
    h = F.group_norm(h, groups, t(p["norm2"]["scale"]), t(p["norm2"]["bias"]), 1e-5)
    h = F.silu(h)
    h = F.conv2d(h, t(p["conv2"]["w"]).permute(3, 2, 0, 1), t(p["conv2"]["b"]), padding=1)
    skip = F.conv2d(xt, t(p["conv_shortcut"]["w"]).permute(3, 2, 0, 1), t(p["conv_shortcut"]["b"]))
    ref = (skip + h).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_transformer_block_matches_torch():
    import torch
    import torch.nn.functional as F

    dim, heads, ctx_dim = 64, 4, 32
    p = L.init_transformer_block(jax.random.key(0), dim, heads, ctx_dim, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 16, dim), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (2, 7, ctx_dim), jnp.float32)
    out = L.transformer_block_fwd(p, x, ctx, heads=heads, attn_backend="xla")

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    def attn(pp, q_in, kv_in):
        q = q_in @ t(pp["to_q"]["w"])
        k = kv_in @ t(pp["to_k"]["w"])
        v = kv_in @ t(pp["to_v"]["w"])
        b, s, d = q.shape
        dh = d // heads
        q, k, v = (
            z.reshape(b, -1, heads, dh).transpose(1, 2) for z in (q, k, v)
        )
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, d)
        return o @ t(pp["to_out"]["w"]) + t(pp["to_out"]["b"])

    xt, ct = t(x), t(ctx)
    h = F.layer_norm(xt, (dim,), t(p["norm1"]["scale"]), t(p["norm1"]["bias"]))
    xt = xt + attn(p["attn1"], h, h)
    h = F.layer_norm(xt, (dim,), t(p["norm2"]["scale"]), t(p["norm2"]["bias"]))
    xt = xt + attn(p["attn2"], h, ct)
    h = F.layer_norm(xt, (dim,), t(p["norm3"]["scale"]), t(p["norm3"]["bias"]))
    y = h @ t(p["ff"]["proj"]["w"]) + t(p["ff"]["proj"]["b"])
    # diffusers GEGLU: hidden_states * gelu(gate), gate = second chunk
    hs, gate = y.chunk(2, -1)
    y = hs * F.gelu(gate)
    xt = xt + y @ t(p["ff"]["out"]["w"]) + t(p["ff"]["out"]["b"])

    np.testing.assert_allclose(np.asarray(out), xt.numpy(), rtol=2e-3, atol=2e-3)


def test_upsample_nearest_2x():
    p = L.init_upsample(jax.random.key(0), 4, dtype=jnp.float32)
    # identity-ish check of the nearest-neighbor part via shape
    x = jnp.arange(2 * 3 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 3, 4)
    out = L.upsample_fwd(p, x)
    assert out.shape == (2, 6, 6, 4)


def test_downsample_halves():
    p = L.init_downsample(jax.random.key(0), 4, dtype=jnp.float32)
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    assert L.downsample_fwd(p, x).shape == (1, 4, 4, 4)
