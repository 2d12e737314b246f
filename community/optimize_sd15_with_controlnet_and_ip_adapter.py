#!/usr/bin/env python
"""SD1.5 + ControlNet + IP-Adapter in one compiled graph — parity with the
reference's community example of the same name (which the BASELINE tracks
as the multi-branch fused-graph config).

Shows the full combination: control image steers structure via ControlNet
residuals while an image prompt steers appearance via IP-Adapter
decoupled cross-attention — all inside the same per-step executables.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu import CompilationConfig
from sfast_tpu.models.unet_2d_condition import SD15_UNET, create_unet
from sfast_tpu.models.controlnet import SD15_CONTROLNET, create_controlnet
from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae
from sfast_tpu.models.clip_text import SD15_TEXT_ENCODER, create_text_encoder
from sfast_tpu.models.clip_vision import VIT_H_IMAGE_ENCODER, create_image_encoder
from sfast_tpu.ip_adapter import init_ip_adapter_params, ip_image_embed
from sfast_tpu.schedulers import DPMSolverMultistepScheduler
from sfast_tpu.pipelines import StableDiffusionPipeline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--control-scale", type=float, default=0.8)
    p.add_argument("--ip-scale", type=float, default=0.6)
    args = p.parse_args()

    # models (random weights here; use sfast_tpu.interop converters +
    # sfast_tpu.ip_adapter.load_ip_adapter for real checkpoints)
    unet = create_unet(SD15_UNET)
    ip_params, image_proj = init_ip_adapter_params(
        jax.random.key(7), SD15_UNET, unet.params, clip_embed_dim=1024
    )
    unet = unet.replace_params(ip_params)
    dec, enc = create_vae(SD_VAE)

    pipe = StableDiffusionPipeline(
        unet=unet,
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(SD15_TEXT_ENCODER),
        controlnet=create_controlnet(SD15_CONTROLNET),
        scheduler=DPMSolverMultistepScheduler(),
    )
    sfast_tpu.compile(pipe, CompilationConfig.Default())

    # image prompt → CLIP embedding → IP tokens (CFG-stacked: zeros for uncond)
    image_encoder = create_image_encoder(VIT_H_IMAGE_ENCODER)
    clip_px = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    image_embeds = image_encoder(clip_px)["image_embeds"]
    tokens = ip_image_embed(image_proj, image_embeds)
    tokens = jnp.concatenate([jnp.zeros_like(tokens), tokens], axis=0)

    control = np.random.RandomState(0).randint(
        0, 255, (1, args.size, args.size, 3), np.uint8
    )
    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, dtype=jnp.int32)

    kw = dict(
        prompt_ids=ids, height=args.size, width=args.size,
        num_inference_steps=args.steps,
        control_image=control, controlnet_conditioning_scale=args.control_scale,
        ip_adapter_embeds=tokens, ip_adapter_scale=args.ip_scale,
    )
    t0 = time.time()
    pipe(seed=0, **kw)
    print(f"warmup (incl. compile): {time.time()-t0:.1f} s")
    t0 = time.time()
    out = pipe(seed=1, **kw)
    dt = time.time() - t0
    print(f"e2e: {dt*1e3:.0f} ms ({args.steps/dt:.1f} it/s), image {out.images.shape}")


if __name__ == "__main__":
    main()
