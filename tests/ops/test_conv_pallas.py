"""Fused GN+SiLU→conv3×3 Pallas kernel vs the XLA reference path
(interpret mode on CPU; tolerance discipline per reference
tests/operators/* — the kernel's bf16 VMEM staging matches the model's
bf16 activations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.conv_pallas import conv3x3_gn_silu, gn_affine
from sfast_tpu.ops.group_norm import group_norm


@pytest.mark.parametrize(
    "n,h,w,c,f,groups",
    [
        (2, 16, 16, 320, 320, 32),   # SD level-0-shaped (scaled down)
        (1, 8, 8, 1280, 640, 32),    # fat channels, K==C block
        (1, 8, 8, 2560, 320, 32),    # up-block concat channels, K-blocked
        (2, 6, 10, 64, 128, 16),     # odd spatial, channel change
        (1, 5, 7, 32, 32, 8),        # odd everything
    ],
)
def test_conv3x3_gn_silu_matches_xla(n, h, w, c, f, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)) * 0.3 + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    gn_out = group_norm(
        x, gamma, beta, groups=groups, backend="xla", act="silu"
    ).astype(jnp.bfloat16)
    ref = conv2d(gn_out, wgt.astype(jnp.bfloat16), b, padding=1)

    sc, sh = gn_affine(x, gamma, beta, groups=groups, interpret=True)
    got = conv3x3_gn_silu(
        x, wgt, b, gn_scale=sc, gn_shift=sh, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0,
        atol=3e-2 * float(jnp.max(jnp.abs(ref))),
    )


def test_conv3x3_plain_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 96)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 96, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    ref = conv2d(x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16), b, padding=1)
    got = conv3x3_gn_silu(x, wgt, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0,
        atol=3e-2 * float(jnp.max(jnp.abs(ref))),
    )


def test_gn_affine_equals_group_norm():
    """y = x*scale + shift must reproduce GN(x)*gamma+beta exactly."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((64,)) + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    sc, sh = gn_affine(x, gamma, beta, groups=16, interpret=True)
    got = x * sc[:, None, None, :] + sh[:, None, None, :]
    ref = group_norm(x, gamma, beta, groups=16, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4
    )


def test_resnet_block_fused_conv_path():
    """resnet_block_fwd(conv_backend='pallas') == the default XLA path
    (bf16-level tolerance) — exercises the model-level wiring."""
    from sfast_tpu.models import layers as L

    rng = np.random.default_rng(3)
    p = L.init_resnet_block(rng, 32, 32, 64, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.bfloat16)
    temb = jnp.asarray(rng.standard_normal((1, 64)), jnp.bfloat16)

    ref = L.resnet_block_fwd(p, x, temb, groups=8, conv_backend="xla")
    import sfast_tpu.ops.conv_pallas as cp

    orig_conv, orig_aff = cp.conv3x3_gn_silu, cp.gn_affine
    try:
        cp.conv3x3_gn_silu = lambda *a, **kw: orig_conv(
            *a, **{**kw, "interpret": True}
        )
        cp.gn_affine = lambda *a, **kw: orig_aff(*a, **{**kw, "interpret": True})
        got = L.resnet_block_fwd(p, x, temb, groups=8, conv_backend="pallas")
    finally:
        cp.conv3x3_gn_silu, cp.gn_affine = orig_conv, orig_aff
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0,
        atol=6e-2 * float(jnp.max(jnp.abs(np.asarray(ref, np.float32)))),
    )
