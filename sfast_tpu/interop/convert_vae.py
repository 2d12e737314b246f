"""diffusers AutoencoderKL state_dict → sfast_tpu params.

Supports both VAE attention key generations: modern
(``to_q/to_k/to_v/to_out.0``, weights (C, C)) and legacy
(``query/key/value/proj_attn``).
"""

from typing import Any, Dict

import jax.numpy as jnp

from sfast_tpu.models.autoencoder_kl import VAEConfig
from sfast_tpu.interop.torch_bridge import linear_w, vec
from sfast_tpu.interop.convert_unet import _conv, _norm, _resnet


def vae_config_from_diffusers(cfg: Dict[str, Any], dtype=jnp.bfloat16) -> VAEConfig:
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
        dtype=dtype,
    )


def _vae_attention(sd, pre, dt):
    if pre + "to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:  # legacy naming
        names = ("query", "key", "value", "proj_attn")
    out = {}
    for ours, theirs in zip(("to_q", "to_k", "to_v", "to_out"), names):
        w = sd[pre + theirs + ".weight"]
        if w.ndim == 4:  # very old checkpoints used 1x1 convs
            w = w[:, :, 0, 0]
        out[ours] = {
            "w": linear_w({"w": w}, "w", dt),
            "b": vec(sd, pre + theirs + ".bias", dt),
        }
    out["group_norm"] = _norm(sd, pre + "group_norm")
    return out


def _mid(sd, pre, dt):
    return {
        "resnet1": _resnet(sd, pre + "resnets.0.", dt),
        "attn": _vae_attention(sd, pre + "attentions.0.", dt),
        "resnet2": _resnet(sd, pre + "resnets.1.", dt),
    }


def convert_vae_params(sd: dict, cfg: VAEConfig):
    dt = cfg.dtype
    n = len(cfg.block_out_channels)

    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in", dt),
        "down_blocks": [],
        "mid": _mid(sd, "encoder.mid_block.", dt),
        "norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out", dt),
    }
    for i in range(n):
        pre = f"encoder.down_blocks.{i}."
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"{pre}downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd, f"{pre}downsamplers.0.conv", dt)}
        enc["down_blocks"].append(blk)

    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in", dt),
        "mid": _mid(sd, "decoder.mid_block.", dt),
        "up_blocks": [],
        "norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out", dt),
    }
    for i in range(n):
        pre = f"decoder.up_blocks.{i}."
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"{pre}upsamplers.0.conv.weight" in sd:
            blk["upsample"] = {"conv": _conv(sd, f"{pre}upsamplers.0.conv", dt)}
        dec["up_blocks"].append(blk)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv", dt),
        "post_quant_conv": _conv(sd, "post_quant_conv", dt),
    }


# ---------------------------------------------------------------------------
# AutoencoderKLTemporalDecoder (SVD video VAE)
# ---------------------------------------------------------------------------


def temporal_vae_config_from_diffusers(cfg: Dict[str, Any], dtype=jnp.bfloat16):
    from sfast_tpu.models.autoencoder_kl_temporal import TemporalVAEConfig

    return TemporalVAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
        dtype=dtype,
    )


def _encoder_params(sd, cfg, dt):
    n = len(cfg.block_out_channels)
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in", dt),
        "down_blocks": [],
        "mid": _mid(sd, "encoder.mid_block.", dt),
        "norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out", dt),
    }
    for i in range(n):
        pre = f"encoder.down_blocks.{i}."
        blk = {
            "resnets": [
                _resnet(sd, f"{pre}resnets.{j}.", dt)
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"{pre}downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd, f"{pre}downsamplers.0.conv", dt)}
        enc["down_blocks"].append(blk)
    return enc


def convert_temporal_vae_params(sd: dict, cfg) -> dict:
    """diffusers AutoencoderKLTemporalDecoder state_dict → sfast_tpu params.

    Decoder naming: SpatioTemporalResBlock = ``spatial_res_block`` +
    ``temporal_res_block`` + ``time_mixer.mix_factor``; single mid-block
    attention; final ``time_conv_out`` Conv3d; no post_quant_conv."""
    from sfast_tpu.interop.convert_svd import _conv3d, _st_resnet

    dt = cfg.dtype
    n = len(cfg.block_out_channels)

    def st_resnets(pre, count):
        return [_st_resnet(sd, f"{pre}resnets.{j}.", dt) for j in range(count)]

    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in", dt),
        "mid": {
            "resnets": st_resnets("decoder.mid_block.", cfg.layers_per_block),
            "attn": _vae_attention(sd, "decoder.mid_block.attentions.0.", dt),
        },
        "up_blocks": [],
        "norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out", dt),
        "time_conv_out": _conv3d(sd, "decoder.time_conv_out", dt),
    }
    for i in range(n):
        pre = f"decoder.up_blocks.{i}."
        blk = {"resnets": st_resnets(pre, cfg.layers_per_block + 1)}
        if f"{pre}upsamplers.0.conv.weight" in sd:
            blk["upsample"] = {"conv": _conv(sd, f"{pre}upsamplers.0.conv", dt)}
        dec["up_blocks"].append(blk)

    return {
        "encoder": _encoder_params(sd, cfg, dt),
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv", dt),
    }
