"""ControlNetModel — pure-JAX mirror of diffusers' ControlNet.

The reference compiles ``m.controlnet`` exactly like the UNet
(``diffusion_pipeline_compiler.py:89-90``) and its outputs feed the UNet
as additional residuals (SURVEY.md §3.4).  Architecture: the UNet's
conv_in/time-embedding/down-blocks/mid-block, plus

- ``controlnet_cond_embedding``: a small conv stack embedding the
  control image (e.g. canny edges) from pixel space into latent space,
  added to the conv_in output;
- per-residual zero-initialized 1×1 ``controlnet_down_blocks`` convs and
  one ``controlnet_mid_block`` conv projecting each residual.

Returns ``(down_block_res_samples, mid_block_res_sample)`` scaled by
``conditioning_scale`` — plug straight into
``unet_fwd(down_block_additional_residuals=..., mid_block_additional_residual=...)``.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.models.unet_2d_condition import (
    UNetConfig,
    SD15_UNET,
    TINY_UNET,
    _backends,
    init_unet_params,
)
from sfast_tpu.ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    unet: UNetConfig = SD15_UNET
    conditioning_channels: int = 3
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)


SD15_CONTROLNET = ControlNetConfig()
TINY_CONTROLNET = ControlNetConfig(
    unet=TINY_UNET, conditioning_embedding_out_channels=(16, 32)
)


def _zero_conv(c_in: int, c_out: int, dtype):
    return {
        "w": jnp.zeros((1, 1, c_in, c_out), dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def init_controlnet_params(rng, cfg: ControlNetConfig):
    ucfg = cfg.unet
    dt = ucfg.dtype
    gen = L.as_host_rng(rng)

    # reuse the UNet init and drop the decoder side
    up = init_unet_params(gen, ucfg)
    p = {
        k: up[k]
        for k in (
            "conv_in",
            "time_embedding",
            "down_blocks",
            "mid_block",
        )
    }
    if "add_embedding" in up:
        p["add_embedding"] = up["add_embedding"]

    # conditioning embedding: conv stack 3 -> ... -> block_out[0], last conv zero
    emb = {"conv_in": L.init_conv(gen, 3, 3, cfg.conditioning_channels,
                                  cfg.conditioning_embedding_out_channels[0], dtype=dt)}
    blocks = []
    chans = cfg.conditioning_embedding_out_channels
    for i in range(len(chans) - 1):
        blocks.append(L.init_conv(gen, 3, 3, chans[i], chans[i], dtype=dt))
        blocks.append(L.init_conv(gen, 3, 3, chans[i], chans[i + 1], dtype=dt))
    emb["blocks"] = blocks
    # conv_out in diffusers is a 3x3 zero conv
    emb["conv_out"] = {
        "w": jnp.zeros((3, 3, chans[-1], ucfg.block_out_channels[0]), dt),
        "b": jnp.zeros((ucfg.block_out_channels[0],), dt),
    }
    p["controlnet_cond_embedding"] = emb

    # zero 1x1 convs per down residual + mid
    n_blocks = len(ucfg.block_out_channels)
    zero_convs = [_zero_conv(ucfg.block_out_channels[0], ucfg.block_out_channels[0], dt)]
    for i in range(n_blocks):
        c = ucfg.block_out_channels[i]
        for _ in range(ucfg.layers_per_block):
            zero_convs.append(_zero_conv(c, c, dt))
        if i != n_blocks - 1:
            zero_convs.append(_zero_conv(c, c, dt))
    p["controlnet_down_blocks"] = zero_convs
    c_mid = ucfg.block_out_channels[-1]
    p["controlnet_mid_block"] = _zero_conv(c_mid, c_mid, dt)
    return p


def controlnet_cond_embed(
    cfg: ControlNetConfig, params, controlnet_cond: jax.Array
) -> jax.Array:
    """Control-image → latent-resolution hint features (pixel-res conv
    stack with stride-2 downsamples).  Pure in the control image: safe to
    hoist out of the denoising loop."""
    ucfg = cfg.unet
    ce = params["controlnet_cond_embedding"]
    c = conv2d(
        controlnet_cond.astype(ucfg.dtype), ce["conv_in"]["w"], ce["conv_in"]["b"],
        padding=1, act="silu",
    )
    for i in range(0, len(ce["blocks"]), 2):
        c = conv2d(c, ce["blocks"][i]["w"], ce["blocks"][i]["b"], padding=1, act="silu")
        c = conv2d(
            c, ce["blocks"][i + 1]["w"], ce["blocks"][i + 1]["b"],
            padding=1, stride=2, act="silu",
        )
    return conv2d(c, ce["conv_out"]["w"], ce["conv_out"]["b"], padding=1)


def controlnet_fwd(
    cfg: ControlNetConfig,
    ccfg: CompilationConfig,
    params,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    controlnet_cond: jax.Array,
    *,
    conditioning_scale: float = 1.0,
    added_cond_kwargs: Optional[dict] = None,
    cond_embed: Optional[jax.Array] = None,
):
    """sample: (B,h,w,4) latents; controlnet_cond: (B, H, W, 3) control
    image in [0,1] at pixel resolution (or ``cond_embed``: its
    precomputed latent-resolution embedding).  Returns
    (down_residuals, mid)."""
    ucfg = cfg.unet
    be = _backends(ccfg)
    groups = ucfg.norm_num_groups

    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    t_emb = L.sinusoidal_timestep_embedding(
        timesteps, ucfg.block_out_channels[0],
        flip_sin_to_cos=ucfg.flip_sin_to_cos, freq_shift=ucfg.freq_shift,
    ).astype(ucfg.dtype)
    emb = L.time_embedding_fwd(params["time_embedding"], t_emb)
    if ucfg.addition_embed_type == "text_time" and "add_embedding" in params:
        ac = added_cond_kwargs or {}
        t_ids = L.sinusoidal_timestep_embedding(
            ac["time_ids"].reshape(-1), ucfg.addition_time_embed_dim,
            flip_sin_to_cos=ucfg.flip_sin_to_cos, freq_shift=ucfg.freq_shift,
        ).reshape(ac["text_embeds"].shape[0], -1)
        add_emb = jnp.concatenate(
            [ac["text_embeds"].astype(jnp.float32), t_ids], axis=-1
        ).astype(ucfg.dtype)
        emb = emb + L.time_embedding_fwd(params["add_embedding"], add_emb)

    context = encoder_hidden_states.astype(ucfg.dtype)

    # control-image embedding: the conv stack runs at PIXEL resolution
    # (512² for SD1.5) on a loop-invariant input — callers that evaluate
    # the ControlNet once per denoising step (the fused loop,
    # pipelines/stable_diffusion.py) precompute it ONCE per call and pass
    # ``cond_embed``; diffusers (and the reference wrapping it,
    # controlnet flow per SURVEY.md §3.4) recompute it every step
    if cond_embed is not None:
        c = cond_embed.astype(ucfg.dtype)
    else:
        c = controlnet_cond_embed(cfg, params, controlnet_cond)

    h = conv2d(
        sample.astype(ucfg.dtype), params["conv_in"]["w"], params["conv_in"]["b"],
        padding=1,
    )
    h = h + c

    res_stack = [h]
    for i, blk in enumerate(params["down_blocks"]):
        has_attn = "attentions" in blk
        for j, rn in enumerate(blk["resnets"]):
            h = L.resnet_block_fwd(rn, h, emb, groups=groups, gn_backend=be["gn"])
            if has_attn:
                h = L.spatial_transformer_fwd(
                    blk["attentions"][j], h, context,
                    heads=ucfg.num_heads[i],
                    use_linear_projection=ucfg.use_linear_projection,
                    gn_backend=be["gn"], attn_backend=be["attn"],
                    geglu_backend=be["geglu"],
                )
            res_stack.append(h)
        if "downsample" in blk:
            h = L.downsample_fwd(blk["downsample"], h)
            res_stack.append(h)

    mid = params["mid_block"]
    h = L.resnet_block_fwd(mid["resnets"][0], h, emb, groups=groups, gn_backend=be["gn"])
    h = L.spatial_transformer_fwd(
        mid["attentions"][0], h, context, heads=ucfg.num_heads[-1],
        use_linear_projection=ucfg.use_linear_projection,
        gn_backend=be["gn"], attn_backend=be["attn"], geglu_backend=be["geglu"],
    )
    h = L.resnet_block_fwd(mid["resnets"][1], h, emb, groups=groups, gn_backend=be["gn"])

    scale = jnp.asarray(conditioning_scale, jnp.float32)
    down_out = tuple(
        (conv2d(r, zc["w"], zc["b"]).astype(jnp.float32) * scale).astype(r.dtype)
        for r, zc in zip(res_stack, params["controlnet_down_blocks"])
    )
    mid_out = (
        conv2d(h, params["controlnet_mid_block"]["w"], params["controlnet_mid_block"]["b"])
        .astype(jnp.float32) * scale
    ).astype(h.dtype)
    return down_out, mid_out


def create_controlnet(
    cfg: ControlNetConfig = SD15_CONTROLNET,
    rng: Optional[jax.Array] = None,
    params=None,
) -> Model:
    if params is None:
        params = L.device_put_tree(
            init_controlnet_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    return Model(
        config=cfg, params=params, forward=controlnet_fwd, name="controlnet"
    )
