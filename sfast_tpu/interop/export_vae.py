"""sfast_tpu VAE params → diffusers-format torch state dict (inverse of
convert_vae; enables round-trip tests and torch-ecosystem export)."""

from typing import Dict

from sfast_tpu.models.autoencoder_kl import VAEConfig
from sfast_tpu.interop.export_unet import (
    _put_conv,
    _put_lin,
    _put_norm,
    _put_resnet,
    _t,
)


def _put_vae_attention(sd, pre, p):
    _put_lin(sd, pre + "to_q", p["to_q"])
    _put_lin(sd, pre + "to_k", p["to_k"])
    _put_lin(sd, pre + "to_v", p["to_v"])
    _put_lin(sd, pre + "to_out.0", p["to_out"])
    _put_norm(sd, pre + "group_norm", p["group_norm"])


def _put_mid(sd, pre, p):
    _put_resnet(sd, pre + "resnets.0.", p["resnet1"])
    _put_vae_attention(sd, pre + "attentions.0.", p["attn"])
    _put_resnet(sd, pre + "resnets.1.", p["resnet2"])


def export_vae_state_dict(params, cfg: VAEConfig) -> Dict:
    sd: Dict = {}
    enc = params["encoder"]
    _put_conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        pre = f"encoder.down_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_resnet(sd, f"{pre}resnets.{j}.", rn)
        if "downsample" in blk:
            _put_conv(sd, f"{pre}downsamplers.0.conv", blk["downsample"]["conv"])
    _put_mid(sd, "encoder.mid_block.", enc["mid"])
    _put_norm(sd, "encoder.conv_norm_out", enc["norm_out"])
    _put_conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _put_conv(sd, "decoder.conv_in", dec["conv_in"])
    _put_mid(sd, "decoder.mid_block.", dec["mid"])
    for i, blk in enumerate(dec["up_blocks"]):
        pre = f"decoder.up_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_resnet(sd, f"{pre}resnets.{j}.", rn)
        if "upsample" in blk:
            _put_conv(sd, f"{pre}upsamplers.0.conv", blk["upsample"]["conv"])
    _put_norm(sd, "decoder.conv_norm_out", dec["norm_out"])
    _put_conv(sd, "decoder.conv_out", dec["conv_out"])

    _put_conv(sd, "quant_conv", params["quant_conv"])
    _put_conv(sd, "post_quant_conv", params["post_quant_conv"])
    return sd


# ---------------------------------------------------------------------------
# AutoencoderKLTemporalDecoder (SVD video VAE)
# ---------------------------------------------------------------------------


def _put_conv3d(sd, key, p):
    # DHWIO → torch Conv3d OIDHW
    sd[key + ".weight"] = _t(p["w"]).permute(4, 3, 0, 1, 2).contiguous()
    sd[key + ".bias"] = _t(p["b"])


def _put_conv2d_as3d(sd, key, p):
    """4-D (kT, 1, C_in, C_out) temporal-conv storage
    (``unet_spatio_temporal._conv_temporal2d``) → torch Conv3d
    OIDHW (C_out, C_in, kT, 1, 1): un-drop the singleton kW axis."""
    w = _t(p["w"])  # (kT, 1, Cin, Cout)
    sd[key + ".weight"] = (
        w.reshape(w.shape[0], 1, 1, w.shape[2], w.shape[3])
        .permute(4, 3, 0, 1, 2)
        .contiguous()
    )
    sd[key + ".bias"] = _t(p["b"])


def _put_temporal_resnet(sd, pre, p):
    _put_norm(sd, pre + "norm1", p["norm1"])
    _put_conv2d_as3d(sd, pre + "conv1", p["conv1"])
    _put_norm(sd, pre + "norm2", p["norm2"])
    _put_conv2d_as3d(sd, pre + "conv2", p["conv2"])
    if "time_emb_proj" in p:
        _put_lin(sd, pre + "time_emb_proj", p["time_emb_proj"])


def _put_st_resnet(sd, pre, p):
    _put_resnet(sd, pre + "spatial_res_block.", p["spatial"])
    _put_temporal_resnet(sd, pre + "temporal_res_block.", p["temporal"])
    sd[pre + "time_mixer.mix_factor"] = _t(p["mix_factor"]).reshape(1)


def export_temporal_vae_state_dict(params, cfg) -> Dict:
    sd: Dict = {}
    enc = params["encoder"]
    _put_conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        pre = f"encoder.down_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_resnet(sd, f"{pre}resnets.{j}.", rn)
        if "downsample" in blk:
            _put_conv(sd, f"{pre}downsamplers.0.conv", blk["downsample"]["conv"])
    _put_mid(sd, "encoder.mid_block.", enc["mid"])
    _put_norm(sd, "encoder.conv_norm_out", enc["norm_out"])
    _put_conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _put_conv(sd, "decoder.conv_in", dec["conv_in"])
    for j, rn in enumerate(dec["mid"]["resnets"]):
        _put_st_resnet(sd, f"decoder.mid_block.resnets.{j}.", rn)
    _put_vae_attention(sd, "decoder.mid_block.attentions.0.", dec["mid"]["attn"])
    for i, blk in enumerate(dec["up_blocks"]):
        pre = f"decoder.up_blocks.{i}."
        for j, rn in enumerate(blk["resnets"]):
            _put_st_resnet(sd, f"{pre}resnets.{j}.", rn)
        if "upsample" in blk:
            _put_conv(sd, f"{pre}upsamplers.0.conv", blk["upsample"]["conv"])
    _put_norm(sd, "decoder.conv_norm_out", dec["norm_out"])
    _put_conv(sd, "decoder.conv_out", dec["conv_out"])
    _put_conv3d(sd, "decoder.time_conv_out", dec["time_conv_out"])

    _put_conv(sd, "quant_conv", params["quant_conv"])
    return sd
