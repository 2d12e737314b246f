"""Mesh + sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §2.3: no reference counterpart — TPU-native capability)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.parallel import make_mesh, shard_params
from sfast_tpu.parallel.sharding import unet_param_spec, param_shardings


def test_make_mesh_shapes():
    mesh = make_mesh((2, 4), ("dp", "tp"))
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = make_mesh(axis_names=("dp", "tp"))
    assert mesh.shape["tp"] == 8


def test_mesh_shape_mismatch_raises():
    with pytest.raises(ValueError):
        make_mesh((3, 3), ("dp", "tp"))


def test_param_spec_rules():
    w2d = jnp.zeros((8, 8))
    assert unet_param_spec(("a", "attn1", "to_q", "w"), w2d) == P(None, "tp")
    assert unet_param_spec(("a", "attn1", "to_out", "w"), w2d) == P("tp", None)
    assert unet_param_spec(("ff", "proj", "w"), w2d) == P(None, "tp")
    assert unet_param_spec(("conv1", "w"), jnp.zeros((3, 3, 4, 8))) == P()
    assert unet_param_spec(("norm1", "scale"), jnp.zeros((8,))) == P()


def test_sharded_unet_matches_unsharded():
    """TP-sharded forward must be numerically identical to single-device."""
    cfg = dataclasses.replace(TINY_UNET, num_heads=(4, 4))
    unet = create_unet(cfg, jax.random.key(0))
    ccfg = CompilationConfig.Default().replace(enable_pallas=False)
    apply = jax.jit(unet.apply_fn(ccfg))

    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([7.0, 7.0])
    ctx = jax.random.normal(jax.random.key(2), (2, 7, cfg.cross_attention_dim))
    ref = apply(unet.params, x, t, ctx)

    mesh = make_mesh((2, 4), ("dp", "tp"))
    with mesh:
        sharded_params = shard_params(unet.params, mesh)
        xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
        out = apply(sharded_params, xs, t, ctx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_param_shardings_tree_structure():
    unet = create_unet(TINY_UNET, jax.random.key(0))
    mesh = make_mesh((1, 8), ("dp", "tp"))
    sh = param_shardings(unet.params, mesh)
    q = sh["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["w"]
    assert q.spec == P(None, "tp")
