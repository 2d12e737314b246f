"""Flash-attention numerics vs the materializing reference
(tolerances per reference tests/operators/* discipline: rtol/atol
1e-3..3e-2 for low precision)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.ops.attention import dot_product_attention, xla_attention
from sfast_tpu.ops.flash_attention import flash_attention


def _ref_attention(q, k, v, scale=None, causal=False):
    # f64-ish reference in f32 numpy
    q, k, v = (np.asarray(t, np.float32) for t in (q, k, v))
    d = q.shape[-1]
    scale = scale or 1.0 / math.sqrt(d)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        sq, sk = s.shape[-2:]
        mask = np.tril(np.ones((sq, sk), bool))
        s = np.where(mask, s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (1, 2, 256, 256, 64),  # self-attention, aligned
        (1, 2, 256, 77, 40),  # cross-attention: ragged kv + odd head dim (SD1.5)
        (2, 1, 130, 130, 80),  # non-multiple seq lens
        (1, 1, 64, 64, 160),  # SD1.5 mid-block head dim
    ],
)
def test_flash_matches_reference(b, h, sq, sk, d):
    keys = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(keys[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, sk, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flash_causal():
    keys = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(keys[0], (1, 2, 128, 64), jnp.float32)
    k = jax.random.normal(keys[1], (1, 2, 128, 64), jnp.float32)
    v = jax.random.normal(keys[2], (1, 2, 128, 64), jnp.float32)
    out = flash_attention(q, k, v, causal=True, interpret=True, block_q=64, block_k=64)
    ref = _ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flash_bf16():
    keys = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(keys[0], (1, 1, 128, 64), jnp.bfloat16)
    k = jax.random.normal(keys[1], (1, 1, 128, 64), jnp.bfloat16)
    v = jax.random.normal(keys[2], (1, 1, 128, 64), jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=3e-2, atol=3e-2
    )


@pytest.mark.parametrize("mode", ["1", "2"])
@pytest.mark.parametrize(
    "sq,sk,causal",
    [
        (256, 256, False),  # hot SD1.5 level-0 config (even kv blocks)
        (200, 200, False),  # kv padding rows masked; ones column inert
        (256, 256, True),
    ],
)
def test_flash_fused_l_bf16_d40(sq, sk, causal, mode, monkeypatch):
    """d=40 + bf16 softmax + SFAST_TPU_FUSED_L triggers the opt-in
    fused-denominator path (ones column in V's d-padding, l via the PV
    matmul; mode "2" plants the column in-kernel on the VMEM sub-block
    instead of on the HBM tensor) — must match both the reference and
    the explicit-l kernel, including with staged kv sub-blocks."""
    keys = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(keys[0], (1, 2, sq, 40), jnp.bfloat16)
    k = jax.random.normal(keys[1], (1, 2, sk, 40), jnp.bfloat16)
    v = jax.random.normal(keys[2], (1, 2, sk, 40), jnp.bfloat16)
    kw = dict(
        causal=causal,
        interpret=True,
        block_q=128,
        block_k=128,
        kv_stages=2 if mode == "2" else 1,
        softmax_dtype=jnp.bfloat16,
    )
    monkeypatch.setenv("SFAST_TPU_FUSED_L", mode)
    fused = flash_attention(q, k, v, **kw)
    monkeypatch.delenv("SFAST_TPU_FUSED_L", raising=False)
    explicit = flash_attention(q, k, v, **kw)
    ref = _ref_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), ref, rtol=3e-2, atol=3e-2
    )
    # same bf16 p values, but the interpret backend sums them in a
    # different order than the MXU accumulator (device outputs measured
    # bitwise-identical; interpret differs by f32 rounding order, which
    # can flip the final bf16 output by one ulp ~ 1e-2 relative)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32),
        np.asarray(explicit, np.float32),
        rtol=1e-2,
        atol=1e-2,
    )


def test_xla_attention_matches_reference():
    keys = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(keys[0], (2, 4, 77, 64), jnp.float32)
    k = jax.random.normal(keys[1], (2, 4, 77, 64), jnp.float32)
    v = jax.random.normal(keys[2], (2, 4, 77, 64), jnp.float32)
    out = xla_attention(q, k, v, causal=True)
    ref = _ref_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_dispatcher_backends_agree():
    keys = jax.random.split(jax.random.key(4), 3)
    q = jax.random.normal(keys[0], (1, 2, 128, 64), jnp.float32)
    k = jax.random.normal(keys[1], (1, 2, 128, 64), jnp.float32)
    v = jax.random.normal(keys[2], (1, 2, 128, 64), jnp.float32)
    a = dot_product_attention(q, k, v, backend="xla")
    b = dot_product_attention(q, k, v, backend="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_custom_scale():
    keys = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(keys[0], (1, 1, 64, 32), jnp.float32)
    k = jax.random.normal(keys[1], (1, 1, 64, 32), jnp.float32)
    v = jax.random.normal(keys[2], (1, 1, 64, 32), jnp.float32)
    out = flash_attention(q, k, v, scale=0.5, interpret=True, block_q=64, block_k=64)
    ref = _ref_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flash_int8_matches_reference():
    """int8-compute flash vs f32 reference: quantization error bounded.
    K mean-centering + V mean-centering keep the error ~1e-2 relative on
    gaussian inputs (SageAttention-style design)."""
    from sfast_tpu.ops.flash_attention import flash_attention_int8

    B, H, S, D = 1, 2, 256, 40
    q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.float32) + 0.7
    v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.float32) - 0.3
    ref = xla_attention(q, k, v)
    out = flash_attention_int8(q, k, v, block_q=128, block_k=128, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    rms = np.sqrt((err**2).mean()) / np.sqrt((np.asarray(ref) ** 2).mean())
    # int8 p/v quantization floor: ~0.7% RMS, few-% max (SageAttention-
    # class); bf16 itself is ~0.4% — the e2e latent test guards quality
    assert err.max() / scale < 0.04, (err.max(), scale)
    assert rms < 0.015, rms


def test_flash_int8_kv_padding_masked():
    """kv length not a block multiple: padded rows must not leak into
    the softmax (int8 zero-scores are 0, not -inf — needs the mask)."""
    from sfast_tpu.ops.flash_attention import flash_attention_int8

    q = jax.random.normal(jax.random.key(0), (1, 1, 128, 32), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 1, 77, 32), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (1, 1, 77, 32), jnp.float32)
    ref = xla_attention(q, k, v)
    out = flash_attention_int8(q, k, v, block_q=128, block_k=128, interpret=True)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err / np.abs(np.asarray(ref)).max() < 0.03, err


def test_int8_backend_dispatch():
    """backend='int8' routes short sequences to XLA, long to the int8
    flash kernel."""
    from sfast_tpu.ops import attention as A

    q = jax.random.normal(jax.random.key(0), (1, 1, 64, 32), jnp.float32)
    short = A.dot_product_attention(q, q, q, backend="int8", interpret=True)
    ref = A.xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(short), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_auto_dispatch_short_kv_routes_xla():
    """Cross-attention (long q, kv=77) must route to XLA: the flash grid
    is pure overhead there (153 vs ~40 us at SD level-0, v5e 2026-08) —
    and on CPU the non-interpret Pallas kernel would fail outright, so
    this also guards the dispatch rule itself."""
    key = jax.random.key(7)
    q = jax.random.normal(key, (1, 2, 4096, 8), jnp.float32)
    k = jax.random.normal(jax.random.key(8), (1, 2, 77, 8), jnp.float32)
    v = jax.random.normal(jax.random.key(9), (1, 2, 77, 8), jnp.float32)
    out = dot_product_attention(q, k, v)  # auto backend
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
