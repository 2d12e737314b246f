"""Packed parameter trees (runtime/packed_params.py): few-buffer weight
residency with transparent in-executable unpacking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.runtime.packed_params import (
    PackedParams,
    device_put_packed,
    pack_tree,
    packed_zeros_like,
)


def _tree():
    rng = np.random.default_rng(0)
    return {
        "a": {"w": rng.standard_normal((4, 8)).astype(np.float32),
              "b": rng.standard_normal((8,)).astype(np.float32)},
        "blocks": [
            {"w": rng.standard_normal((8, 8)).astype(np.float32)}
            for _ in range(3)
        ],
        "scale": np.ones((16,), np.float32),
    }


def test_pack_unpack_roundtrip():
    tree = _tree()
    pp = pack_tree(tree)
    assert len(pp.packed) == 1  # single dtype → single flat buffer
    out = pp.unpack()
    flat_in, def_in = jax.tree_util.tree_flatten(tree)
    flat_out, def_out = jax.tree_util.tree_flatten(out)
    assert def_in == def_out
    for a, b in zip(flat_in, flat_out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_dtypes():
    tree = {"w": np.ones((3, 3), np.float32), "i": np.arange(5, dtype=np.int32)}
    pp = pack_tree(tree)
    assert set(pp.packed) == {"float32", "int32"}
    out = pp.unpack()
    np.testing.assert_array_equal(out["i"], tree["i"])


def test_packed_is_pytree():
    pp = device_put_packed(_tree())
    doubled = jax.tree_util.tree_map(lambda x: x * 2, pp)
    assert isinstance(doubled, PackedParams)
    np.testing.assert_allclose(
        np.asarray(doubled.unpack()["a"]["w"]),
        np.asarray(pp.unpack()["a"]["w"]) * 2,
    )


def test_packed_zeros_like_touches_no_data():
    tree = _tree()
    pp = packed_zeros_like(tree)
    out = pp.unpack()
    assert out["a"]["w"].shape == (4, 8)
    assert float(jnp.sum(jnp.abs(out["a"]["w"]))) == 0.0


def test_signature_is_shape_stable_and_value_free():
    from sfast_tpu.runtime.signature import arg_signature

    pp1 = device_put_packed(_tree())
    pp2 = jax.tree_util.tree_map(lambda x: x * 3, pp1)
    assert arg_signature(pp1) == arg_signature(pp2)


def test_model_apply_unpacks_transparently():
    """A Model holding PackedParams must produce identical outputs to the
    same Model with the plain tree (unpack happens inside the traced
    apply)."""
    from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet, init_unet_params

    host = init_unet_params(0, TINY_UNET)
    plain = create_unet(TINY_UNET, params=jax.tree_util.tree_map(jnp.asarray, host))
    packed = create_unet(TINY_UNET, params=device_put_packed(host))

    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    t = jnp.array([1.0], jnp.float32)
    ctx = jnp.zeros((1, 8, 32), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(plain(x, t, ctx)),
        np.asarray(packed(x, t, ctx)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_shape_only_init_is_shape_identical():
    from sfast_tpu.models import layers as L
    from sfast_tpu.models.unet_2d_condition import TINY_UNET, init_unet_params

    real = init_unet_params(0, TINY_UNET)
    with L.shape_only_init():
        fake = init_unet_params(0, TINY_UNET)
    rs = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), real)
    fs = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), fake)
    assert rs == fs
