#!/usr/bin/env python
"""SVD image-to-video (≙ reference
examples/optimize_stable_video_diffusion_pipeline.py): 25-frame clip with
chunked VAE decode (decode_chunk_size)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import numpy as np

import sfast_tpu
from sfast_tpu import CompilationConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, help="diffusers SVD checkpoint")
    p.add_argument("--image", default=None, help="conditioning image (png)")
    p.add_argument("--frames", type=int, default=25)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--decode-chunk-size", type=int, default=5)
    args = p.parse_args()

    if args.model:
        from diffusers import StableVideoDiffusionPipeline as TorchSVD

        pipe = sfast_tpu.compile(
            TorchSVD.from_pretrained(args.model), CompilationConfig.Default()
        )
    else:
        import jax

        from sfast_tpu.models.unet_spatio_temporal import SVD_UNET, create_svd_unet
        from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae
        from sfast_tpu.models.clip_vision import (
            VIT_H_IMAGE_ENCODER,
            create_image_encoder,
        )
        from sfast_tpu.pipelines.stable_video_diffusion import (
            StableVideoDiffusionPipeline,
        )

        dec, enc = create_vae(SD_VAE)
        pipe = sfast_tpu.compile(
            StableVideoDiffusionPipeline(
                unet=create_svd_unet(SVD_UNET),
                vae=dec,
                vae_encode=enc,
                image_encoder=create_image_encoder(VIT_H_IMAGE_ENCODER),
            ),
            CompilationConfig.Default(),
        )

    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))[None]
    else:
        img = np.random.RandomState(0).randint(
            0, 255, (1, args.height, args.width, 3), np.uint8
        )

    kw = dict(
        num_frames=args.frames, height=args.height, width=args.width,
        num_inference_steps=args.steps, decode_chunk_size=args.decode_chunk_size,
    )
    t0 = time.time()
    pipe(img, seed=0, **kw)
    print(f"warmup (incl. compile): {time.time()-t0:.1f} s")
    t0 = time.time()
    out = pipe(img, seed=1, **kw)
    print(f"SVD e2e: {time.time()-t0:.1f} s/clip, frames: {out.images.shape}")


if __name__ == "__main__":
    main()
