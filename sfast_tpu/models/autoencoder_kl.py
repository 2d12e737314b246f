"""AutoencoderKL (SD VAE) — pure-JAX mirror of diffusers' AutoencoderKL.

The reference compiles the VAE per-submodule with its recursive auto-trace
hook and deliberately skips CUDA graphs for it
(``diffusion_pipeline_compiler.py:154-190``); here both ``decode`` and
``encode`` are ordinary pure functions compiled like everything else.

Structure (SD1.5/SDXL share it): Encoder(conv_in → 4 DownEncoderBlocks →
mid(resnet, attention, resnet) → GN+SiLU → conv_out → quant_conv) and
Decoder(post_quant_conv → conv_in → mid → 4 UpDecoderBlocks → GN+SiLU →
conv_out).  The mid attention is single-head full-spatial attention over
(HW, C) tokens.  NHWC throughout.
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.group_norm import group_norm
from sfast_tpu.ops.linear import linear
from sfast_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.bfloat16


SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
TINY_TEST_VAE = VAEConfig(
    block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
    dtype=jnp.float32,
)


def _init_vae_attention(rng, c: int, dtype):
    p = L.init_attention(rng, c, 1, qkv_bias=True, dtype=dtype)
    p["group_norm"] = L.init_norm(c)
    return p


def _vae_attention_fwd(p, x, *, groups: int):
    b, h, w, c = x.shape
    hn = group_norm(
        x, p["group_norm"]["scale"], p["group_norm"]["bias"], groups=groups, eps=1e-6
    ).reshape(b, h * w, c)
    q = linear(hn, p["to_q"]["w"], p["to_q"].get("b"))[:, None]
    k = linear(hn, p["to_k"]["w"], p["to_k"].get("b"))[:, None]
    v = linear(hn, p["to_v"]["w"], p["to_v"].get("b"))[:, None]
    o = dot_product_attention(q, k, v, backend="xla")[:, 0]
    o = linear(o, p["to_out"]["w"], p["to_out"].get("b")).reshape(b, h, w, c)
    return x + o


def init_vae_params(rng, cfg: VAEConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    keys = iter(lambda: gen, None)  # infinite host-rng stream
    n = len(cfg.block_out_channels)

    # --- encoder ---
    enc: dict = {
        "conv_in": L.init_conv(
            next(keys), 3, 3, cfg.in_channels, cfg.block_out_channels[0], dtype=dt
        ),
        "down_blocks": [],
    }
    c_out = cfg.block_out_channels[0]
    for i in range(n):
        c_in, c_out = c_out, cfg.block_out_channels[i]
        blk = {
            "resnets": [
                L.init_resnet_block(
                    next(keys), c_in if j == 0 else c_out, c_out, None, dtype=dt
                )
                for j in range(cfg.layers_per_block)
            ]
        }
        if i != n - 1:
            blk["downsample"] = L.init_downsample(next(keys), c_out, dtype=dt)
        enc["down_blocks"].append(blk)
    c_mid = cfg.block_out_channels[-1]
    enc["mid"] = {
        "resnet1": L.init_resnet_block(next(keys), c_mid, c_mid, None, dtype=dt),
        "attn": _init_vae_attention(next(keys), c_mid, dt),
        "resnet2": L.init_resnet_block(next(keys), c_mid, c_mid, None, dtype=dt),
    }
    enc["norm_out"] = L.init_norm(c_mid)
    enc["conv_out"] = L.init_conv(
        next(keys), 3, 3, c_mid, 2 * cfg.latent_channels, dtype=dt
    )

    # --- decoder ---
    dec: dict = {
        "conv_in": L.init_conv(
            next(keys), 3, 3, cfg.latent_channels, c_mid, dtype=dt
        ),
        "mid": {
            "resnet1": L.init_resnet_block(next(keys), c_mid, c_mid, None, dtype=dt),
            "attn": _init_vae_attention(next(keys), c_mid, dt),
            "resnet2": L.init_resnet_block(next(keys), c_mid, c_mid, None, dtype=dt),
        },
        "up_blocks": [],
    }
    rev = list(reversed(cfg.block_out_channels))
    c_prev = rev[0]
    for i in range(n):
        c_out = rev[i]
        blk = {
            "resnets": [
                L.init_resnet_block(
                    next(keys), c_prev if j == 0 else c_out, c_out, None, dtype=dt
                )
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i != n - 1:
            blk["upsample"] = L.init_upsample(next(keys), c_out, dtype=dt)
        dec["up_blocks"].append(blk)
        c_prev = c_out
    dec["norm_out"] = L.init_norm(cfg.block_out_channels[0])
    dec["conv_out"] = L.init_conv(
        next(keys), 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype=dt
    )

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.init_conv(
            next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels,
            dtype=dt,
        ),
        "post_quant_conv": L.init_conv(
            next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels, dtype=dt
        ),
    }


def stack_iso_decoder(params):
    """Weight-stack consecutive iso-shaped decoder resnets for
    ``lax.scan`` (same codegen-dedup rationale as
    ``unet_2d_condition.stack_iso_blocks``; the SD VAE decoder's 512²
    convs are the largest per-site code emitters in the full-pipeline
    executable).  Levels 0/1 scan all 3 resnets (512→512), levels 2/3
    the last two.  Returns a new tree consumed via the per-block
    ``"segments"`` key; the encoder (one call per img2img) is left
    unrolled."""
    out = dict(params)
    dec = dict(params["decoder"])
    new_blocks = []
    for blk in dec["up_blocks"]:
        nblk = {"segments": L.segment_iso_runs(blk["resnets"])}
        if "upsample" in blk:
            nblk["upsample"] = blk["upsample"]
        new_blocks.append(nblk)
    dec["up_blocks"] = new_blocks
    out["decoder"] = dec
    return out


def maybe_stack_iso_vae(params):
    """``stack_iso_decoder`` gated by SFAST_TPU_STACK_ISO_VAE=1 — a
    SEPARATE opt-in from the UNet's SFAST_TPU_STACK_ISO so the two costs
    can be paid independently (v5e same-session A/B pairs, 2026-08-19,
    SD1.5 512² 50-step fused): UNet+VAE stacking cost +67.6 ms/image
    e2e, UNet-only +40.2 — the VAE decoder's 512² resnets (Pallas
    fused-conv path) lose cross-block scheduling under scan on top of
    the UNet's fusion loss.  Both shrink compiled code and warm-start
    compile (−40-44% measured), so they stay available for
    warm-start-critical serving."""
    import os

    if os.environ.get("SFAST_TPU_STACK_ISO_VAE", "0") == "1":
        return stack_iso_decoder(params)
    return params


def vae_decode_fwd(
    cfg: VAEConfig, ccfg: CompilationConfig, params, latents: jax.Array
) -> jax.Array:
    """latents: (B, h, w, latent_channels) — already divided by
    scaling_factor by the caller (pipeline applies 1/0.18215 like
    diffusers).  Returns (B, 8h, 8w, 3) in [-1, 1]."""
    be = None if ccfg.enable_pallas else "xla"
    groups = cfg.norm_num_groups
    # trace-time gate: decode runs once per image, so the stacking copy
    # (a few MB of weights) is negligible here — applied inside the
    # forward so every caller (fused pipeline, stepwise, bare decode)
    # gets the deduplicated codegen
    params = maybe_stack_iso_vae(params)
    p = params["decoder"]
    h = conv2d(
        latents.astype(cfg.dtype),
        params["post_quant_conv"]["w"],
        params["post_quant_conv"]["b"],
    )
    h = conv2d(h, p["conv_in"]["w"], p["conv_in"]["b"], padding=1)
    h = L.resnet_block_fwd(p["mid"]["resnet1"], h, groups=groups, eps=1e-6, gn_backend=be)
    h = _vae_attention_fwd(p["mid"]["attn"], h, groups=groups)
    h = L.resnet_block_fwd(p["mid"]["resnet2"], h, groups=groups, eps=1e-6, gn_backend=be)
    for blk in p["up_blocks"]:
        if "segments" in blk:
            # weight-stacked iso runs (stack_iso_decoder): one compiled
            # body per run instead of one per resnet
            for seg in blk["segments"]:
                if "one" in seg:
                    h = L.resnet_block_fwd(
                        seg["one"], h, groups=groups, eps=1e-6, gn_backend=be
                    )
                else:

                    def _body(hh, rp):
                        hh = L.resnet_block_fwd(
                            rp, hh, groups=groups, eps=1e-6, gn_backend=be
                        )
                        return hh, None

                    h, _ = jax.lax.scan(_body, h, seg["scan"])
        else:
            for rn in blk["resnets"]:
                h = L.resnet_block_fwd(rn, h, groups=groups, eps=1e-6, gn_backend=be)
        if "upsample" in blk:
            h = L.upsample_fwd(blk["upsample"], h)
    h = group_norm(
        h, p["norm_out"]["scale"], p["norm_out"]["bias"], groups=groups, eps=1e-6,
        act="silu", backend=be,
    )
    return conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)


def vae_encode_fwd(
    cfg: VAEConfig, ccfg: CompilationConfig, params, image: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """image: (B, H, W, 3) in [-1, 1].  Returns (mean, logvar) of the
    latent posterior, each (B, H/8, W/8, latent_channels)."""
    be = None if ccfg.enable_pallas else "xla"
    groups = cfg.norm_num_groups
    p = params["encoder"]
    h = conv2d(image.astype(cfg.dtype), p["conv_in"]["w"], p["conv_in"]["b"], padding=1)
    for blk in p["down_blocks"]:
        for rn in blk["resnets"]:
            h = L.resnet_block_fwd(rn, h, groups=groups, eps=1e-6, gn_backend=be)
        if "downsample" in blk:
            # diffusers' VAE encoder Downsample2D is built with padding=0
            # and pads (0,1,0,1) asymmetrically before the stride-2 conv
            # (unlike the UNet's symmetric padding=1) — same output size,
            # different window alignment.
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(
                h, blk["downsample"]["conv"]["w"], blk["downsample"]["conv"]["b"],
                stride=2,
            )
    h = L.resnet_block_fwd(p["mid"]["resnet1"], h, groups=groups, eps=1e-6, gn_backend=be)
    h = _vae_attention_fwd(p["mid"]["attn"], h, groups=groups)
    h = L.resnet_block_fwd(p["mid"]["resnet2"], h, groups=groups, eps=1e-6, gn_backend=be)
    h = group_norm(
        h, p["norm_out"]["scale"], p["norm_out"]["bias"], groups=groups, eps=1e-6,
        act="silu", backend=be,
    )
    h = conv2d(h, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)
    h = conv2d(h, params["quant_conv"]["w"], params["quant_conv"]["b"])
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def create_vae(
    cfg: VAEConfig = SD_VAE, rng: Optional[jax.Array] = None, params=None
) -> Tuple[Model, Model]:
    """Returns (decoder_model, encoder_model) sharing one param tree."""
    if params is None:
        params = L.device_put_tree(
            init_vae_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    dec = Model(config=cfg, params=params, forward=vae_decode_fwd, name="vae")
    enc = Model(config=cfg, params=params, forward=vae_encode_fwd, name="vae_encode")
    return dec, enc
