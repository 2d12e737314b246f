#!/usr/bin/env python
"""InstantID-style identity-preserving generation
(≙ reference examples/optimize_instant_id_pipeline.py).

InstantID is the composition of two conditioning paths driven by ONE
face image:

- an **IP-Adapter** branch: the face (identity) embedding becomes extra
  cross-attention tokens in every attn2 (decoupled KV, scaled by
  ``ip_adapter_scale``);
- a **ControlNet** branch: the face-keypoint image conditions spatial
  structure (scaled by ``controlnet_conditioning_scale``).

The reference drives the community InstantID pipeline with insightface
for the face analysis; this example drives the same composition through
sfast_tpu's native pipeline.  With ``--model``/``--controlnet``/
``--ip-adapter`` pointing at real checkpoints, real weights are used;
without them, random weights demonstrate (and time) the compiled
composition.

The face-detection step (insightface) is out of scope for the compiler
in both frameworks — pass a precomputed face embedding (``--face-embed``
.npy) and keypoint image, exactly what the reference's FaceAnalysis
produces before the pipeline runs.
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
from sfast_tpu.ip_adapter import init_ip_adapter_params, ip_image_embed, load_ip_adapter
from sfast_tpu.schedulers import EulerAncestralDiscreteScheduler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="diffusers SD checkpoint dir")
    p.add_argument("--controlnet", default=None, help="InstantID ControlNet dir")
    p.add_argument("--ip-adapter", default=None, help="ip-adapter.bin path")
    p.add_argument("--face-embed", default=None, help=".npy identity embedding")
    p.add_argument("--kps-image", default=None, help="keypoint image (npy/png)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--controlnet-scale", type=float, default=0.8)
    p.add_argument("--ip-adapter-scale", type=float, default=0.8)
    p.add_argument("--warmups", type=int, default=1)
    args = p.parse_args()

    ccfg = CompilationConfig.Default()

    if args.model:
        from diffusers import StableDiffusionControlNetPipeline, ControlNetModel

        cn = ControlNetModel.from_pretrained(args.controlnet)
        tpipe = StableDiffusionControlNetPipeline.from_pretrained(
            args.model, controlnet=cn
        )
        pipe = sfast_tpu.compile(tpipe, ccfg)
        unet_model = pipe.unet.model
        ucfg, base = unet_model.config, unet_model.params
    else:
        from sfast_tpu.models.unet_2d_condition import SD15_UNET, create_unet
        from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae
        from sfast_tpu.models.clip_text import SD15_TEXT_ENCODER, create_text_encoder
        from sfast_tpu.models.controlnet import SD15_CONTROLNET, create_controlnet
        from sfast_tpu.pipelines import StableDiffusionPipeline

        dec, enc = create_vae(SD_VAE)
        unet = create_unet(SD15_UNET)
        ucfg, base = unet.config, unet.params
        pipe = StableDiffusionPipeline(
            unet=unet,
            vae=dec,
            vae_encode=enc,
            text_encoder=create_text_encoder(SD15_TEXT_ENCODER),
            controlnet=create_controlnet(SD15_CONTROLNET),
            scheduler=EulerAncestralDiscreteScheduler(),
        )
        pipe = sfast_tpu.compile(pipe, ccfg)

    # IP-Adapter: inject decoupled KV projections into every attn2
    if args.ip_adapter:
        import torch

        sd = torch.load(args.ip_adapter, map_location="cpu")
        new_params, image_proj = load_ip_adapter(ucfg, base, sd)
    else:
        new_params, image_proj = init_ip_adapter_params(
            jax.random.key(3), ucfg, base
        )
        print("note: no --ip-adapter given; random adapter weights")
    pipe.unet.update_params(new_params)  # hot-swap: zero recompiles

    # the identity embedding (insightface output in the reference flow)
    if args.face_embed:
        face = jnp.asarray(np.load(args.face_embed), jnp.float32)[None]
    else:
        face = jax.random.normal(jax.random.key(5), (1, 1024), jnp.float32)
    ip_tokens = ip_image_embed(image_proj, face)
    ip_tokens = jnp.concatenate([jnp.zeros_like(ip_tokens), ip_tokens], axis=0)

    # keypoint conditioning image for the ControlNet branch
    if args.kps_image:
        kps = np.load(args.kps_image) if args.kps_image.endswith(".npy") else None
        if kps is None:
            from PIL import Image

            kps = np.asarray(Image.open(args.kps_image).convert("RGB"))[None]
    else:
        kps = np.zeros((1, args.size, args.size, 3), np.uint8)

    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, dtype=jnp.int32)
    kw = dict(
        prompt_ids=ids, height=args.size, width=args.size,
        num_inference_steps=args.steps,
        control_image=kps,
        controlnet_conditioning_scale=args.controlnet_scale,
        ip_adapter_embeds=ip_tokens,
        ip_adapter_scale=args.ip_adapter_scale,
    )
    for i in range(args.warmups):
        pipe(seed=i, **kw)
    t0 = time.time()
    out = pipe(seed=42, **kw)
    dt = time.time() - t0
    print(
        f"InstantID-style {args.steps}-step e2e: {dt*1e3:.1f} ms "
        f"({dt*1e3/args.steps:.1f} ms/step, {out.images.shape})"
    )


if __name__ == "__main__":
    main()
