#!/usr/bin/env python
"""LCM 4-step inference (≙ reference examples/optimize_lcm_pipeline.py /
optimize_lcm_lora.py).  Tiny step counts stress fixed per-call overhead —
exactly what the executable cache + fused loop eliminate."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp

import sfast_tpu
from sfast_tpu import CompilationConfig
from sfast_tpu.schedulers import LCMScheduler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    if args.model:
        from diffusers import StableDiffusionPipeline as TorchSD

        pipe = TorchSD.from_pretrained(args.model)
        pipe.scheduler = None  # adapter maps it; LCM set below
        pipe = sfast_tpu.compile(pipe, CompilationConfig.Default())
    else:
        from sfast_tpu.models.unet_2d_condition import SD15_UNET, create_unet
        from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae
        from sfast_tpu.models.clip_text import (
            SD15_TEXT_ENCODER,
            create_text_encoder,
        )
        from sfast_tpu.pipelines import StableDiffusionPipeline

        dec, enc = create_vae(SD_VAE)
        pipe = StableDiffusionPipeline(
            unet=create_unet(SD15_UNET),
            vae=dec,
            vae_encode=enc,
            text_encoder=create_text_encoder(SD15_TEXT_ENCODER),
            scheduler=LCMScheduler(),
        )
        pipe = sfast_tpu.compile(
            pipe, CompilationConfig.Default().replace(fuse_denoising_loop=True)
        )
    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, dtype=jnp.int32)
    kw = dict(
        prompt_ids=ids, height=args.size, width=args.size,
        num_inference_steps=args.steps, guidance_scale=1.0,
    )
    pipe(seed=0, **kw)  # warmup
    t0 = time.time()
    pipe(seed=1, **kw)
    print(f"LCM {args.steps}-step e2e: {(time.time()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
