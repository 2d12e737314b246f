"""sfast_tpu UNet params → diffusers-format torch state dict.

The inverse of ``convert_unet.py`` — lets fine-tuned (e.g. LoRA-merged or
quant-dequantized) weights flow back to the torch ecosystem, and gives
the converters a round-trip correctness test that needs no diffusers
install.
"""

from typing import Dict

import numpy as np

from sfast_tpu.models.unet_2d_condition import UNetConfig


def _t(x):
    import torch

    arr = np.asarray(x)
    if arr.dtype not in (np.float32, np.float64):
        arr = arr.astype(np.float32)
    return torch.from_numpy(arr)


def _put_lin(sd, key, p):
    sd[key + ".weight"] = _t(p["w"]).T.contiguous()
    if "b" in p:
        sd[key + ".bias"] = _t(p["b"])


def _put_conv(sd, key, p):
    sd[key + ".weight"] = _t(p["w"]).permute(3, 2, 0, 1).contiguous()
    sd[key + ".bias"] = _t(p["b"])


def _put_norm(sd, key, p):
    sd[key + ".weight"] = _t(p["scale"])
    sd[key + ".bias"] = _t(p["bias"])


def _put_resnet(sd, pre, p):
    _put_norm(sd, pre + "norm1", p["norm1"])
    _put_conv(sd, pre + "conv1", p["conv1"])
    _put_norm(sd, pre + "norm2", p["norm2"])
    _put_conv(sd, pre + "conv2", p["conv2"])
    if "time_emb_proj" in p:
        _put_lin(sd, pre + "time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _put_conv(sd, pre + "conv_shortcut", p["conv_shortcut"])


def _put_attention(sd, pre, p):
    _put_lin(sd, pre + "to_q", p["to_q"])
    _put_lin(sd, pre + "to_k", p["to_k"])
    _put_lin(sd, pre + "to_v", p["to_v"])
    _put_lin(sd, pre + "to_out.0", p["to_out"])


def _put_transformer_block(sd, pre, p):
    _put_norm(sd, pre + "norm1", p["norm1"])
    _put_attention(sd, pre + "attn1.", p["attn1"])
    _put_norm(sd, pre + "norm2", p["norm2"])
    _put_attention(sd, pre + "attn2.", p["attn2"])
    _put_norm(sd, pre + "norm3", p["norm3"])
    _put_lin(sd, pre + "ff.net.0.proj", p["ff"]["proj"])
    _put_lin(sd, pre + "ff.net.2", p["ff"]["out"])


def _put_spatial_transformer(sd, pre, p, use_linear):
    _put_norm(sd, pre + "norm", p["norm"])
    if use_linear:
        _put_lin(sd, pre + "proj_in", p["proj_in"])
        _put_lin(sd, pre + "proj_out", p["proj_out"])
    else:
        _put_conv(sd, pre + "proj_in", p["proj_in"])
        _put_conv(sd, pre + "proj_out", p["proj_out"])
    for k, blk in enumerate(p["blocks"]):
        _put_transformer_block(sd, f"{pre}transformer_blocks.{k}.", blk)


def _put_time_embedding(sd, pre, p):
    _put_lin(sd, pre + "linear_1", p["linear_1"])
    _put_lin(sd, pre + "linear_2", p["linear_2"])
    if "cond_proj" in p:  # LCM guidance projection (bias-free)
        _put_lin(sd, pre + "cond_proj", p["cond_proj"])


def export_unet_state_dict(params, cfg: UNetConfig) -> Dict:
    sd: Dict = {}
    _put_conv(sd, "conv_in", params["conv_in"])
    _put_time_embedding(sd, "time_embedding.", params["time_embedding"])
    if "add_embedding" in params:
        _put_time_embedding(sd, "add_embedding.", params["add_embedding"])

    for i, blk in enumerate(params["down_blocks"]):
        pre = f"down_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_resnet(sd, f"{pre}resnets.{j}.", rn)
        for j, at in enumerate(blk.get("attentions", [])):
            _put_spatial_transformer(
                sd, f"{pre}attentions.{j}.", at, cfg.use_linear_projection
            )
        if "downsample" in blk:
            _put_conv(sd, f"{pre}downsamplers.0.conv", blk["downsample"]["conv"])

    for j, rn in enumerate(params["mid_block"]["resnets"]):
        _put_resnet(sd, f"mid_block.resnets.{j}.", rn)
    _put_spatial_transformer(
        sd, "mid_block.attentions.0.", params["mid_block"]["attentions"][0],
        cfg.use_linear_projection,
    )

    for i, blk in enumerate(params["up_blocks"]):
        pre = f"up_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_resnet(sd, f"{pre}resnets.{j}.", rn)
        for j, at in enumerate(blk.get("attentions", [])):
            _put_spatial_transformer(
                sd, f"{pre}attentions.{j}.", at, cfg.use_linear_projection
            )
        if "upsample" in blk:
            _put_conv(sd, f"{pre}upsamplers.0.conv", blk["upsample"]["conv"])

    _put_norm(sd, "conv_norm_out", params["conv_norm_out"])
    _put_conv(sd, "conv_out", params["conv_out"])
    return sd
