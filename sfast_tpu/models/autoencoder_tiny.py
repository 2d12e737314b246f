"""AutoencoderTiny (TAESD) — the distilled tiny VAE.

The reference's e2e benchmarks include a tiny-VAE variant
(``tests/compilers/test_stable_diffusion_pipeline_compiler.py``, SURVEY.md
§4) because VAE decode is a visible slice of short-step pipelines (LCM).
TAESD architecture (madebyollin/taesd, mirrored by diffusers
AutoencoderTiny): plain conv stacks of width 64 with ReLU blocks —
no norms, no attention.

Block(n): 3×(conv3x3+ReLU-chain) with residual skip, ReLU fuse.
Decoder: tanh-clamp → conv → ReLU → [blocks ×N, nearest-×2 upsample,
conv(bias-free)] per stage → final block → conv to RGB.
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class TinyVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    hidden: int = 64
    encoder_blocks: Tuple[int, ...] = (1, 3, 3, 3)
    decoder_blocks: Tuple[int, ...] = (3, 3, 3, 1)
    scaling_factor: float = 1.0
    dtype: Any = jnp.bfloat16

    # pipeline compatibility (vae_scale_factor derivation)
    @property
    def block_out_channels(self):
        return (self.hidden,) * len(self.decoder_blocks)


TAESD = TinyVAEConfig()
TINY_TEST_TAESD = TinyVAEConfig(hidden=16, encoder_blocks=(1, 1), decoder_blocks=(1, 1), dtype=jnp.float32)


def _init_block(gen, cin, cout, dt):
    p = {
        "conv1": L.init_conv(gen, 3, 3, cin, cout, dtype=dt),
        "conv2": L.init_conv(gen, 3, 3, cout, cout, dtype=dt),
        "conv3": L.init_conv(gen, 3, 3, cout, cout, dtype=dt),
    }
    if cin != cout:
        p["skip"] = L.init_conv(gen, 1, 1, cin, cout, dtype=dt)
    return p


def _block_fwd(p, x):
    h = conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1, act="relu")
    h = conv2d(h, p["conv2"]["w"], p["conv2"]["b"], padding=1, act="relu")
    h = conv2d(h, p["conv3"]["w"], p["conv3"]["b"], padding=1)
    skip = x
    if "skip" in p:
        skip = conv2d(x, p["skip"]["w"], p["skip"]["b"])
    return jax.nn.relu(
        h.astype(jnp.float32) + skip.astype(jnp.float32)
    ).astype(x.dtype)


def init_tiny_vae_params(rng, cfg: TinyVAEConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    h = cfg.hidden

    enc = {"conv_in": L.init_conv(gen, 3, 3, cfg.in_channels, h, dtype=dt), "stages": []}
    for si, nb in enumerate(cfg.encoder_blocks):
        stage = {"blocks": [_init_block(gen, h, h, dt) for _ in range(nb)]}
        if si != len(cfg.encoder_blocks) - 1:
            stage["down"] = L.init_conv(gen, 3, 3, h, h, dtype=dt)
        enc["stages"].append(stage)
    enc["conv_out"] = L.init_conv(gen, 3, 3, h, cfg.latent_channels, dtype=dt)

    dec = {"conv_in": L.init_conv(gen, 3, 3, cfg.latent_channels, h, dtype=dt), "stages": []}
    for si, nb in enumerate(cfg.decoder_blocks):
        stage = {"blocks": [_init_block(gen, h, h, dt) for _ in range(nb)]}
        if si != len(cfg.decoder_blocks) - 1:
            stage["up_conv"] = L.init_conv(gen, 3, 3, h, h, dtype=dt)
        dec["stages"].append(stage)
    dec["conv_out"] = L.init_conv(gen, 3, 3, h, cfg.out_channels, dtype=dt)
    return {"encoder": enc, "decoder": dec}


def tiny_vae_decode_fwd(cfg: TinyVAEConfig, ccfg: CompilationConfig, params, latents):
    p = params["decoder"]
    x = jnp.tanh(latents.astype(jnp.float32) / 3.0) * 3.0  # TAESD clamp
    x = x.astype(cfg.dtype)
    x = conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"], padding=1, act="relu")
    for stage in p["stages"]:
        for blk in stage["blocks"]:
            x = _block_fwd(blk, x)
        if "up_conv" in stage:
            b, hh, ww, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, hh, 2, ww, 2, c))
            x = x.reshape(b, hh * 2, ww * 2, c)
            x = conv2d(x, stage["up_conv"]["w"], stage["up_conv"]["b"], padding=1)
    x = conv2d(x, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)
    # TAESD decodes to [0,1]; match AutoencoderKL's [-1,1] contract
    return (x.astype(jnp.float32) * 2.0 - 1.0).astype(cfg.dtype)


def tiny_vae_encode_fwd(cfg: TinyVAEConfig, ccfg: CompilationConfig, params, image):
    p = params["encoder"]
    # TAESD takes [0,1] images; accept the pipeline's [-1,1]
    x = ((image.astype(jnp.float32) + 1.0) / 2.0).astype(cfg.dtype)
    x = conv2d(x, p["conv_in"]["w"], p["conv_in"]["b"], padding=1)
    for stage in p["stages"]:
        for blk in stage["blocks"]:
            x = _block_fwd(blk, x)
        if "down" in stage:
            x = conv2d(x, stage["down"]["w"], stage["down"]["b"], stride=2, padding=1)
    x = conv2d(x, p["conv_out"]["w"], p["conv_out"]["b"], padding=1)
    # deterministic "posterior": mean = x, logvar = -inf-ish (tiny VAE is
    # deterministic); keep the (mean, logvar) contract of AutoencoderKL
    return x, jnp.full_like(x, -30.0)


def create_tiny_vae(
    cfg: TinyVAEConfig = TAESD, rng: Optional[jax.Array] = None, params=None
) -> Tuple[Model, Model]:
    if params is None:
        params = L.device_put_tree(
            init_tiny_vae_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    dec = Model(config=cfg, params=params, forward=tiny_vae_decode_fwd, name="vae")
    enc = Model(config=cfg, params=params, forward=tiny_vae_encode_fwd, name="vae_encode")
    return dec, enc
