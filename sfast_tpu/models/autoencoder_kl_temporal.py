"""AutoencoderKLTemporalDecoder — the SVD video VAE.

Mirror of diffusers' ``AutoencoderKLTemporalDecoder``, which the
reference compiles when optimizing SVD pipelines
(``examples/optimize_stable_video_diffusion_pipeline.py:49-51,229``
exercises it via ``decode_chunk_size``).  The encoder is the standard
AutoencoderKL encoder; the decoder adds temporal mixing:

- every resnet is a SpatioTemporalResBlock: spatial ResnetBlock2D
  (eps 1e-6) + temporal resnet (3×1×1 conv over frames, eps 1e-5),
  alpha-blended with ``switch_spatial_to_temporal_mix=True`` — i.e.
  ``out = (1-σ(mix))·spatial + σ(mix)·temporal`` (the SVD UNet blocks
  use the un-switched orientation);
- mid block: resnet → single-head full-spatial attention → resnet;
- after ``conv_out`` a final ``time_conv_out`` Conv3d(3,1,1) smooths
  across frames — the piece a per-frame standard KL decoder misses;
- there is NO ``post_quant_conv`` (unlike AutoencoderKL).

TPU layout: frames fold into the batch for all spatial ops
((B·F, H, W, C) NHWC); the temporal convs view (B, F, H, W, C).
``num_frames`` is a compile-time static (chunked decode compiles one
executable per chunk size, like every other shape bucket).
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.models.autoencoder_kl import (
    VAEConfig,
    _init_vae_attention,
    _vae_attention_fwd,
    init_vae_params,
    vae_encode_fwd,
)
from sfast_tpu.models.unet_spatio_temporal import (
    _alpha,
    _conv_temporal,
    _init_temporal_resnet,
    _temporal_resnet_fwd,
)
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.group_norm import group_norm


@dataclasses.dataclass(frozen=True)
class TemporalVAEConfig(VAEConfig):
    # marker the pipelines dispatch on (decode takes num_frames)
    temporal_decoder: bool = True


SVD_VAE = TemporalVAEConfig()
TINY_TEMPORAL_VAE = TemporalVAEConfig(
    block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
    dtype=jnp.float32,
)


def _init_dec_st_resnet(gen, cin, cout, dtype):
    return {
        "spatial": L.init_resnet_block(gen, cin, cout, None, dtype=dtype),
        "temporal": _init_temporal_resnet(gen, cout, None, dtype),
        "mix_factor": jnp.zeros((), jnp.float32),  # merge_factor=0.0
    }


def _dec_st_resnet_fwd(p, x, *, num_frames, groups, gn_backend):
    """Decoder SpatioTemporalResBlock: spatial eps 1e-6, temporal eps
    1e-5, SWITCHED alpha blend (diffusers MidBlock/UpBlockTemporalDecoder
    pass switch_spatial_to_temporal_mix=True)."""
    h = L.resnet_block_fwd(
        p["spatial"], x, None, groups=groups, eps=1e-6, gn_backend=gn_backend
    )
    bf, hh, ww, c = h.shape
    b = bf // num_frames
    h5 = h.reshape(b, num_frames, hh, ww, c)
    t5 = _temporal_resnet_fwd(
        p["temporal"], h5, None, groups=groups, gn_backend=gn_backend
    )
    a = 1.0 - _alpha(p)  # switch_spatial_to_temporal_mix
    out = a * h5.astype(jnp.float32) + (1.0 - a) * t5.astype(jnp.float32)
    return out.astype(x.dtype).reshape(bf, hh, ww, c)


def init_temporal_vae_params(rng, cfg: TemporalVAEConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    n = len(cfg.block_out_channels)
    c_mid = cfg.block_out_channels[-1]

    # encoder + quant_conv are the standard AutoencoderKL ones; the
    # temporal model has no post_quant_conv
    base = init_vae_params(gen, cfg)
    enc, quant_conv = base["encoder"], base["quant_conv"]

    dec: dict = {
        "conv_in": L.init_conv(gen, 3, 3, cfg.latent_channels, c_mid, dtype=dt),
        "mid": {
            "resnets": [
                _init_dec_st_resnet(gen, c_mid, c_mid, dt)
                for _ in range(cfg.layers_per_block)
            ],
            "attn": _init_vae_attention(gen, c_mid, dt),
        },
        "up_blocks": [],
    }
    rev = list(reversed(cfg.block_out_channels))
    c_prev = rev[0]
    for i in range(n):
        c_out = rev[i]
        blk = {
            "resnets": [
                _init_dec_st_resnet(gen, c_prev if j == 0 else c_out, c_out, dt)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i != n - 1:
            blk["upsample"] = L.init_upsample(gen, c_out, dtype=dt)
        dec["up_blocks"].append(blk)
        c_prev = c_out
    dec["norm_out"] = L.init_norm(cfg.block_out_channels[0])
    dec["conv_out"] = L.init_conv(
        gen, 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype=dt
    )
    dec["time_conv_out"] = {
        "w": L._randn(
            gen,
            (3, 1, 1, cfg.out_channels, cfg.out_channels),
            dt,
            1.0 / (3 * cfg.out_channels) ** 0.5,
        ),
        "b": jnp.zeros((cfg.out_channels,), dt),
    }
    return {"encoder": enc, "decoder": dec, "quant_conv": quant_conv}


def temporal_vae_decode_fwd(
    cfg: TemporalVAEConfig,
    ccfg: CompilationConfig,
    params,
    latents: jax.Array,
    *,
    num_frames: int = 1,
) -> jax.Array:
    """latents: (B·num_frames, h, w, latent_channels), already divided by
    scaling_factor.  Returns (B·num_frames, H, W, 3) in [-1, 1].
    num_frames is static (one executable per chunk size)."""
    be = None if ccfg.enable_pallas else "xla"
    groups = cfg.norm_num_groups
    p = params["decoder"]
    bf = latents.shape[0]
    assert bf % num_frames == 0, (bf, num_frames)
    b = bf // num_frames

    # NOTE: no post_quant_conv in the temporal model
    h = conv2d(
        latents.astype(cfg.dtype), p["conv_in"]["w"], p["conv_in"]["b"], padding=1
    )

    # mid: resnet0 → attention → resnet1 (diffusers MidBlockTemporalDecoder
    # iterates resnets[1:] after the single attention)
    mid = p["mid"]
    h = _dec_st_resnet_fwd(
        mid["resnets"][0], h, num_frames=num_frames, groups=groups, gn_backend=be
    )
    for rn in mid["resnets"][1:]:
        h = _vae_attention_fwd(mid["attn"], h, groups=groups)
        h = _dec_st_resnet_fwd(
            rn, h, num_frames=num_frames, groups=groups, gn_backend=be
        )

    for blk in p["up_blocks"]:
        for rn in blk["resnets"]:
            h = _dec_st_resnet_fwd(
                rn, h, num_frames=num_frames, groups=groups, gn_backend=be
            )
        if "upsample" in blk:
            h = L.upsample_fwd(blk["upsample"], h)

    h = group_norm(
        h, p["norm_out"]["scale"], p["norm_out"]["bias"], groups=groups,
        eps=1e-6, act="silu", backend=be,
    )
    h = conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)

    # temporal smoothing across frames: Conv3d(3,1,1) over (B, F, H, W, C)
    hh, ww, c = h.shape[1:]
    h5 = h.reshape(b, num_frames, hh, ww, c)
    h5 = _conv_temporal(h5, p["time_conv_out"]["w"], p["time_conv_out"]["b"])
    return h5.reshape(bf, hh, ww, c)


def temporal_vae_encode_fwd(
    cfg: TemporalVAEConfig, ccfg: CompilationConfig, params, image: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Standard AutoencoderKL encoder (the temporal model only differs on
    the decode side)."""
    return vae_encode_fwd(cfg, ccfg, params, image)


def create_temporal_vae(
    cfg: TemporalVAEConfig = SVD_VAE,
    rng: Optional[jax.Array] = None,
    params=None,
) -> Tuple[Model, Model]:
    """Returns (decoder_model, encoder_model) sharing one param tree."""
    if params is None:
        params = L.device_put_tree(
            init_temporal_vae_params(
                rng if rng is not None else jax.random.key(0), cfg
            )
        )
    dec = Model(
        config=cfg,
        params=params,
        forward=temporal_vae_decode_fwd,
        name="vae",
        static_argnames=("num_frames",),
    )
    enc = Model(
        config=cfg, params=params, forward=temporal_vae_encode_fwd,
        name="vae_encode",
    )
    return dec, enc
