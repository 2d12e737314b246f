#!/usr/bin/env python
"""LCM-LoRA: turn a regular SD1.5 into a 4-step model by merging the
latent-consistency LoRA and switching to the LCM scheduler
(≙ reference examples/optimize_lcm_lora.py — load_lora_weights +
fuse_lora + LCMScheduler + guidance_scale 0).

With ``--lora`` pointing at a LoRA checkpoint (diffusers/PEFT or kohya
safetensors/pt) the real weights are merged; without one, a random LoRA
demonstrates the flow (merge → hot-swap, zero recompiles).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

import sfast_tpu
from sfast_tpu import CompilationConfig
from sfast_tpu.lora import convert_diffusers_lora, init_lora_params, merge_lora, switch_lora
from sfast_tpu.schedulers import LCMScheduler


def load_lora_state_dict(path):
    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    import torch

    return torch.load(path, map_location="cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="diffusers SD checkpoint dir")
    p.add_argument("--lora", default=None, help="LCM-LoRA weights file")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--warmups", type=int, default=1)
    args = p.parse_args()

    ccfg = CompilationConfig.Default().replace(fuse_denoising_loop=True)

    if args.model:
        from diffusers import StableDiffusionPipeline as TorchSD

        tpipe = TorchSD.from_pretrained(args.model)
        pipe = sfast_tpu.compile(tpipe, ccfg)
    else:
        from sfast_tpu.models.unet_2d_condition import SD15_UNET, create_unet
        from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae
        from sfast_tpu.models.clip_text import SD15_TEXT_ENCODER, create_text_encoder
        from sfast_tpu.pipelines import StableDiffusionPipeline

        dec, enc = create_vae(SD_VAE)
        pipe = StableDiffusionPipeline(
            unet=create_unet(SD15_UNET),
            vae=dec,
            vae_encode=enc,
            text_encoder=create_text_encoder(SD15_TEXT_ENCODER),
            scheduler=LCMScheduler(),
        )
        pipe = sfast_tpu.compile(pipe, ccfg)

    # the LCM scheduler is what makes 4 steps work
    pipe.scheduler = LCMScheduler()

    base = pipe.unet.model.params
    if args.lora:
        lora, _ = convert_diffusers_lora(load_lora_state_dict(args.lora))
    else:
        lora = init_lora_params(
            jax.random.key(7), base, rank=4, targets=("to_q", "to_v")
        )
        print("note: no --lora given; merging a random demo LoRA")

    # fuse_lora analog: merge into the weights and hot-swap in place —
    # the executable cache must not grow (zero recompiles)
    before = pipe.unet.cache_size
    switch_lora(pipe.unet, base, lora, scale=args.lora_scale)
    assert pipe.unet.cache_size == before

    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, dtype=jnp.int32)
    kw = dict(
        prompt_ids=ids, height=args.size, width=args.size,
        num_inference_steps=args.steps, guidance_scale=1.0,
    )
    for i in range(args.warmups):
        pipe(seed=i, **kw)
    t0 = time.time()
    out = pipe(seed=99, **kw)
    dt = time.time() - t0
    print(f"LCM-LoRA {args.steps}-step e2e: {dt*1e3:.1f} ms "
          f"({out.images.shape})")

    # and back to the base weights — still zero recompiles
    pipe.unet.update_params(base)
    assert pipe.unet.cache_size == before


if __name__ == "__main__":
    main()
