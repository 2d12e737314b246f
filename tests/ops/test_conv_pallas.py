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

    orig_blk, orig_aff = cp.conv3x3_block, cp.gn_affine
    try:
        cp.conv3x3_block = lambda *a, **kw: orig_blk(
            *a, **{**kw, "interpret": True}
        )
        cp.gn_affine = lambda *a, **kw: orig_aff(*a, **{**kw, "interpret": True})
        got = L.resnet_block_fwd(p, x, temb, groups=8, conv_backend="pallas")
    finally:
        cp.conv3x3_block, cp.gn_affine = orig_blk, orig_aff
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=0,
        atol=6e-2 * float(jnp.max(jnp.abs(np.asarray(ref, np.float32)))),
    )


def test_conv3x3_block_stats_residual_scale():
    """The full fused-resnet kernel: per-batch bias, residual add,
    output_scale, and the emitted per-channel stats must equal numpy
    sums of the actual output."""
    from sfast_tpu.ops.conv_pallas import affine_from_stats, conv3x3_block

    rng = np.random.default_rng(4)
    n, h, w_, c, f = 2, 10, 12, 64, 96
    x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05, jnp.float32)
    bias_b = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w_, f)), jnp.float32)

    y, s1, s2 = conv3x3_block(
        x, wgt, bias_batch=bias_b, residual=res, output_scale=2.0,
        emit_stats=True, interpret=True,
    )
    ref = (
        conv2d(x, wgt, None, padding=1).astype(np.float32)
        + np.asarray(bias_b)[:, None, None, :]
        + np.asarray(res)
    ) / 2.0
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=3e-2 * float(np.abs(np.asarray(ref)).max()),
    )
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(
        np.asarray(s1), yf.sum(axis=(1, 2)), rtol=2e-3, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(s2), (yf * yf).sum(axis=(1, 2)), rtol=2e-3, atol=2e-2
    )

    # affine_from_stats(s1, s2) must match gn_affine computed on y
    from sfast_tpu.ops.conv_pallas import gn_affine

    gamma = jnp.asarray(rng.standard_normal((f,)) + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    sc_a, sh_a = affine_from_stats(s1, s2, h * w_, gamma, beta, groups=16)
    sc_b, sh_b = gn_affine(y, gamma, beta, groups=16, interpret=True)
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sh_a), np.asarray(sh_b), rtol=5e-3, atol=5e-2)
