"""Converter correctness via round-trip: our params → diffusers-format
state dict → back through convert_unet_params → identical tree (values
and structure).  Catches naming drift in either direction without
needing diffusers installed."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.interop.convert_unet import convert_unet_params
from sfast_tpu.interop.export_unet import export_unet_state_dict
from sfast_tpu.models.unet_2d_condition import (
    SDXL_UNET,
    TINY_UNET,
    create_unet,
    init_unet_params,
)


def _assert_trees_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _assert_trees_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_trees_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-6, err_msg=path,
        )


def test_sd15_style_roundtrip():
    cfg = dataclasses.replace(TINY_UNET, dtype=jnp.float32)
    params = init_unet_params(jax.random.key(0), cfg)
    sd = export_unet_state_dict(params, cfg)
    back = convert_unet_params(sd, cfg)
    _assert_trees_equal(params, back)


def test_sdxl_style_roundtrip():
    cfg = dataclasses.replace(
        SDXL_UNET,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        transformer_layers_per_block=(1, 2),
        num_heads=(4, 4),
        cross_attention_dim=32,
        projection_class_embeddings_input_dim=96,
        layers_per_block=1,
        norm_num_groups=8,
        dtype=jnp.float32,
    )
    params = init_unet_params(jax.random.key(1), cfg)
    sd = export_unet_state_dict(params, cfg)
    # SDXL-style: linear projections + add_embedding present
    assert "add_embedding.linear_1.weight" in sd
    assert sd["down_blocks.1.attentions.0.proj_in.weight"].ndim == 2
    back = convert_unet_params(sd, cfg)
    _assert_trees_equal(params, back)


def test_lcm_cond_proj_roundtrip():
    """LCM-distilled checkpoints (time_cond_proj_dim=256, e.g.
    SimianLuo/LCM_Dreamshaper_v7) carry time_embedding.cond_proj.weight
    (bias-free); the converter must read it and the exporter write it."""
    cfg = dataclasses.replace(
        TINY_UNET, dtype=jnp.float32, time_cond_proj_dim=32
    )
    params = init_unet_params(jax.random.key(2), cfg)
    assert "cond_proj" in params["time_embedding"]
    assert "b" not in params["time_embedding"]["cond_proj"]
    sd = export_unet_state_dict(params, cfg)
    assert "time_embedding.cond_proj.weight" in sd
    assert "time_embedding.cond_proj.bias" not in sd
    back = convert_unet_params(sd, cfg)
    _assert_trees_equal(params, back)


def test_lcm_config_from_diffusers_reads_time_cond_proj_dim():
    from sfast_tpu.interop.convert_unet import unet_config_from_diffusers

    cfg = unet_config_from_diffusers(
        {
            "block_out_channels": [32, 64],
            "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
            "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
            "in_channels": 4,
            "out_channels": 4,
            "layers_per_block": 1,
            "attention_head_dim": 4,
            "cross_attention_dim": 32,
            "time_cond_proj_dim": 256,
        }
    )
    assert cfg.time_cond_proj_dim == 256


def test_forward_equivalence_after_roundtrip():
    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    sd = export_unet_state_dict(unet.params, cfg)
    back = convert_unet_params(sd, dataclasses.replace(cfg, dtype=jnp.float32))
    unet2 = unet.replace_params(back)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([3.0])
    c = jax.random.normal(jax.random.key(2), (1, 7, 64), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(unet(x, t, c)), np.asarray(unet2(x, t, c)), rtol=1e-4, atol=1e-5
    )


def test_vae_legacy_attention_naming():
    """Old diffusers VAE checkpoints use query/key/value/proj_attn (some
    as 1x1 convs) — the converter must accept both generations."""
    import torch

    from sfast_tpu.interop.convert_vae import _vae_attention

    c = 32
    modern = {
        "pre.to_q.weight": torch.randn(c, c),
        "pre.to_q.bias": torch.randn(c),
        "pre.to_k.weight": torch.randn(c, c),
        "pre.to_k.bias": torch.randn(c),
        "pre.to_v.weight": torch.randn(c, c),
        "pre.to_v.bias": torch.randn(c),
        "pre.to_out.0.weight": torch.randn(c, c),
        "pre.to_out.0.bias": torch.randn(c),
        "pre.group_norm.weight": torch.ones(c),
        "pre.group_norm.bias": torch.zeros(c),
    }
    legacy = {
        "pre.query.weight": modern["pre.to_q.weight"][:, :, None, None],
        "pre.query.bias": modern["pre.to_q.bias"],
        "pre.key.weight": modern["pre.to_k.weight"][:, :, None, None],
        "pre.key.bias": modern["pre.to_k.bias"],
        "pre.value.weight": modern["pre.to_v.weight"][:, :, None, None],
        "pre.value.bias": modern["pre.to_v.bias"],
        "pre.proj_attn.weight": modern["pre.to_out.0.weight"][:, :, None, None],
        "pre.proj_attn.bias": modern["pre.to_out.0.bias"],
        "pre.group_norm.weight": modern["pre.group_norm.weight"],
        "pre.group_norm.bias": modern["pre.group_norm.bias"],
    }
    import jax.numpy as jnp

    a = _vae_attention(modern, "pre.", jnp.float32)
    b = _vae_attention(legacy, "pre.", jnp.float32)
    for k in ("to_q", "to_k", "to_v", "to_out"):
        np.testing.assert_allclose(
            np.asarray(a[k]["w"]), np.asarray(b[k]["w"]), rtol=1e-6
        )
