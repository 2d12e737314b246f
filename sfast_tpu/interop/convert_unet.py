"""diffusers UNet2DConditionModel state_dict → sfast_tpu params.

Works from a plain state_dict + config dict (the ``config.json`` of the
checkpoint), so it does not require diffusers to be installed — only its
key-naming and layout conventions:

- Linear ``(out, in)`` → ``(in, out)``; Conv ``OIHW`` → ``HWIO``.
- ``attention_head_dim`` is treated as the per-level head count for SD
  (diffusers' legacy naming — see models/unet_2d_condition.py).
- GEGLU fused weight ``ff.net.0.proj`` keeps its [value|gate] column
  order under transposition, matching ``ops/geglu.py``'s split.
"""

from typing import Any, Dict

import jax.numpy as jnp

from sfast_tpu.models.unet_2d_condition import UNetConfig
from sfast_tpu.interop.torch_bridge import conv_w, linear_w, vec


def unet_config_from_diffusers(cfg: Dict[str, Any], dtype=jnp.bfloat16) -> UNetConfig:
    n = len(cfg["block_out_channels"])
    heads = cfg.get("num_attention_heads") or cfg["attention_head_dim"]
    if isinstance(heads, int):
        heads = (heads,) * n
    tl = cfg.get("transformer_layers_per_block", 1)
    if isinstance(tl, int):
        tl = (tl,) * n
    return UNetConfig(
        sample_size=cfg.get("sample_size", 64),
        in_channels=cfg["in_channels"],
        out_channels=cfg["out_channels"],
        block_out_channels=tuple(cfg["block_out_channels"]),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        layers_per_block=cfg["layers_per_block"],
        transformer_layers_per_block=tuple(tl),
        num_heads=tuple(heads),
        cross_attention_dim=cfg["cross_attention_dim"],
        use_linear_projection=cfg.get("use_linear_projection", False),
        addition_embed_type=cfg.get("addition_embed_type"),
        addition_time_embed_dim=cfg.get("addition_time_embed_dim") or 256,
        projection_class_embeddings_input_dim=cfg.get(
            "projection_class_embeddings_input_dim"
        ),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        flip_sin_to_cos=cfg.get("flip_sin_to_cos", True),
        freq_shift=cfg.get("freq_shift", 0),
        time_cond_proj_dim=cfg.get("time_cond_proj_dim"),
        dtype=dtype,
    )


def _norm(sd, key):
    return {"scale": vec(sd, key + ".weight"), "bias": vec(sd, key + ".bias")}


def _lin(sd, key, dt, bias=True):
    p = {"w": linear_w(sd, key + ".weight", dt)}
    if bias and key + ".bias" in sd:
        p["b"] = vec(sd, key + ".bias", dt)
    return p


def _conv(sd, key, dt):
    return {"w": conv_w(sd, key + ".weight", dt), "b": vec(sd, key + ".bias", dt)}


def _resnet(sd, pre, dt):
    p = {
        "norm1": _norm(sd, pre + "norm1"),
        "conv1": _conv(sd, pre + "conv1", dt),
        "norm2": _norm(sd, pre + "norm2"),
        "conv2": _conv(sd, pre + "conv2", dt),
    }
    if pre + "time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, pre + "time_emb_proj", dt)
    if pre + "conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, pre + "conv_shortcut", dt)
    return p


def _attention(sd, pre, dt):
    return {
        "to_q": _lin(sd, pre + "to_q", dt),
        "to_k": _lin(sd, pre + "to_k", dt),
        "to_v": _lin(sd, pre + "to_v", dt),
        "to_out": _lin(sd, pre + "to_out.0", dt),
    }


def _transformer_block(sd, pre, dt):
    return {
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


def _spatial_transformer(sd, pre, depth, use_linear, dt):
    p = {
        "norm": _norm(sd, pre + "norm"),
        "blocks": [
            _transformer_block(sd, f"{pre}transformer_blocks.{k}.", dt)
            for k in range(depth)
        ],
    }
    if use_linear:
        p["proj_in"] = _lin(sd, pre + "proj_in", dt)
        p["proj_out"] = _lin(sd, pre + "proj_out", dt)
    else:
        p["proj_in"] = _conv(sd, pre + "proj_in", dt)
        p["proj_out"] = _conv(sd, pre + "proj_out", dt)
    return p


def _time_embedding(sd, pre, dt):
    p = {
        "linear_1": _lin(sd, pre + "linear_1", dt),
        "linear_2": _lin(sd, pre + "linear_2", dt),
    }
    if pre + "cond_proj.weight" in sd:
        # LCM guidance-embedding projection (bias-free in diffusers)
        p["cond_proj"] = _lin(sd, pre + "cond_proj", dt, bias=False)
    return p


def convert_unet_params(sd: dict, cfg: UNetConfig):
    dt = cfg.dtype
    n = len(cfg.block_out_channels)
    p: dict = {
        "conv_in": _conv(sd, "conv_in", dt),
        "time_embedding": _time_embedding(sd, "time_embedding.", dt),
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = _time_embedding(sd, "add_embedding.", dt)

    down = []
    for i, btype in enumerate(cfg.down_block_types):
        pre = f"down_blocks.{i}."
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block)
            ]
        }
        if btype == "CrossAttnDownBlock2D":
            blk["attentions"] = [
                _spatial_transformer(
                    sd,
                    f"{pre}attentions.{j}.",
                    cfg.transformer_layers_per_block[i],
                    cfg.use_linear_projection,
                    dt,
                )
                for j in range(cfg.layers_per_block)
            ]
        if f"{pre}downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd, f"{pre}downsamplers.0.conv", dt)}
        down.append(blk)
    p["down_blocks"] = down

    p["mid_block"] = {
        "resnets": [
            _resnet(sd, f"mid_block.resnets.{j}.", dt) for j in range(2)
        ],
        "attentions": [
            _spatial_transformer(
                sd,
                "mid_block.attentions.0.",
                cfg.transformer_layers_per_block[-1],
                cfg.use_linear_projection,
                dt,
            )
        ],
    }

    up = []
    for i, btype in enumerate(cfg.up_block_types):
        pre = f"up_blocks.{i}."
        level = n - 1 - i
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if btype == "CrossAttnUpBlock2D":
            blk["attentions"] = [
                _spatial_transformer(
                    sd,
                    f"{pre}attentions.{j}.",
                    cfg.transformer_layers_per_block[level],
                    cfg.use_linear_projection,
                    dt,
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
