"""diffusers UNetSpatioTemporalConditionModel state_dict → sfast_tpu params.

Naming: SpatioTemporalResBlock = ``spatial_res_block`` + ``temporal_res_block``
+ ``time_mixer.mix_factor``; TransformerSpatioTemporalModel =
``transformer_blocks`` + ``temporal_transformer_blocks`` +
``time_pos_embed`` + ``time_mixer``.  Conv3d OIDHW → DHWIO.
"""

from typing import Any, Dict

import jax.numpy as jnp

from sfast_tpu.models.unet_spatio_temporal import SVDUNetConfig
from sfast_tpu.interop.torch_bridge import torch_to_jnp, vec
from sfast_tpu.interop.convert_unet import (
    _conv,
    _lin,
    _norm,
    _resnet,
    _time_embedding,
    _transformer_block,
)


def svd_config_from_diffusers(cfg: Dict[str, Any], dtype=jnp.bfloat16) -> SVDUNetConfig:
    n = len(cfg["block_out_channels"])
    heads = cfg.get("num_attention_heads") or cfg.get("attention_head_dim")
    if isinstance(heads, int):
        heads = (heads,) * n
    tl = cfg.get("transformer_layers_per_block", 1)
    if isinstance(tl, int):
        tl = (tl,) * n
    return SVDUNetConfig(
        sample_size=cfg.get("sample_size", 96),
        in_channels=cfg.get("in_channels", 8),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        transformer_layers_per_block=tuple(tl),
        num_heads=tuple(heads),
        cross_attention_dim=cfg.get("cross_attention_dim", 1024),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim", 768
        ),
        num_frames=cfg.get("num_frames", 25),
        dtype=dtype,
    )


def _conv3d(sd, key, dt):
    return {
        "w": torch_to_jnp(sd[key + ".weight"].permute(2, 3, 4, 1, 0).contiguous(), dt),
        "b": vec(sd, key + ".bias", dt),
    }


def _conv3d_as2d(sd, key, dt):
    """Conv3d(3,1,1) weights → the 4-D (3, 1, C_in, C_out) storage the
    temporal resnets use (``unet_spatio_temporal._conv_temporal2d``):
    the kernel is spatially 1×1, so dropping the two singleton axes is a
    pure reshape of (kT, kH, kW, C_in, C_out) = (3, 1, 1, C, C)."""
    w = torch_to_jnp(
        sd[key + ".weight"].permute(2, 3, 4, 1, 0).contiguous(), dt
    )
    return {
        "w": w.reshape(w.shape[0], 1, w.shape[-2], w.shape[-1]),
        "b": vec(sd, key + ".bias", dt),
    }


def _temporal_resnet(sd, pre, dt):
    p = {
        "norm1": _norm(sd, pre + "norm1"),
        "conv1": _conv3d_as2d(sd, pre + "conv1", dt),
        "norm2": _norm(sd, pre + "norm2"),
        "conv2": _conv3d_as2d(sd, pre + "conv2", dt),
    }
    if pre + "time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, pre + "time_emb_proj", dt)
    return p


def _st_resnet(sd, pre, dt):
    return {
        "spatial": _resnet(sd, pre + "spatial_res_block.", dt),
        "temporal": _temporal_resnet(sd, pre + "temporal_res_block.", dt),
        "mix_factor": vec(sd, pre + "time_mixer.mix_factor", jnp.float32),
    }


def _temporal_transformer_block(sd, pre, dt):
    from sfast_tpu.interop.convert_unet import _attention

    return {
        "norm_in": _norm(sd, pre + "norm_in"),
        "ff_in": {
            "proj": _lin(sd, pre + "ff_in.net.0.proj", dt),
            "out": _lin(sd, pre + "ff_in.net.2", dt),
        },
        "norm1": _norm(sd, pre + "norm1"),
        "attn1": _attention(sd, pre + "attn1.", dt),
        "norm2": _norm(sd, pre + "norm2"),
        "attn2": _attention(sd, pre + "attn2.", dt),
        "norm3": _norm(sd, pre + "norm3"),
        "ff": {
            "proj": _lin(sd, pre + "ff.net.0.proj", dt),
            "out": _lin(sd, pre + "ff.net.2", dt),
        },
    }


def _st_transformer(sd, pre, depth, dt):
    return {
        "norm": _norm(sd, pre + "norm"),
        "proj_in": _lin(sd, pre + "proj_in", dt),
        "blocks": [
            _transformer_block(sd, f"{pre}transformer_blocks.{k}.", dt)
            for k in range(depth)
        ],
        "temporal_blocks": [
            _temporal_transformer_block(
                sd, f"{pre}temporal_transformer_blocks.{k}.", dt
            )
            for k in range(depth)
        ],
        "time_pos_embed": _time_embedding(sd, pre + "time_pos_embed.", dt),
        "proj_out": _lin(sd, pre + "proj_out", dt),
        "mix_factor": vec(sd, pre + "time_mixer.mix_factor", jnp.float32),
    }


def convert_svd_unet_params(sd: dict, cfg: SVDUNetConfig):
    dt = cfg.dtype
    n = len(cfg.block_out_channels)
    p: dict = {
        "conv_in": _conv(sd, "conv_in", dt),
        "time_embedding": _time_embedding(sd, "time_embedding.", dt),
        "add_embedding": _time_embedding(sd, "add_embedding.", dt),
    }

    down = []
    for i, btype in enumerate(cfg.down_block_types):
        pre = f"down_blocks.{i}."
        blk = {
            "resnets": [
                _st_resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block)
            ]
        }
        if btype.startswith("CrossAttn"):
            blk["attentions"] = [
                _st_transformer(
                    sd, f"{pre}attentions.{j}.",
                    cfg.transformer_layers_per_block[i], dt,
                )
                for j in range(cfg.layers_per_block)
            ]
        if f"{pre}downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd, f"{pre}downsamplers.0.conv", dt)}
        down.append(blk)
    p["down_blocks"] = down

    p["mid_block"] = {
        "resnets": [
            _st_resnet(sd, f"mid_block.resnets.{j}.", dt) for j in range(2)
        ],
        "attentions": [
            _st_transformer(
                sd, "mid_block.attentions.0.",
                cfg.transformer_layers_per_block[-1], dt,
            )
        ],
    }

    up = []
    for i, btype in enumerate(cfg.up_block_types):
        pre = f"up_blocks.{i}."
        level = n - 1 - i
        blk = {
            "resnets": [
                _st_resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if btype.startswith("CrossAttn"):
            blk["attentions"] = [
                _st_transformer(
                    sd, f"{pre}attentions.{j}.",
                    cfg.transformer_layers_per_block[level], dt,
                )
                for j in range(cfg.layers_per_block + 1)
            ]
        if f"{pre}upsamplers.0.conv.weight" in sd:
            blk["upsample"] = {"conv": _conv(sd, f"{pre}upsamplers.0.conv", dt)}
        up.append(blk)
    p["up_blocks"] = up

    p["conv_norm_out"] = _norm(sd, "conv_norm_out")
    p["conv_out"] = _conv(sd, "conv_out", dt)
    return p
