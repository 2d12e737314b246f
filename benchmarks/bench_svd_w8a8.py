#!/usr/bin/env python
"""SVD-XT W8A8 end-to-end: latency + latent-quality bound vs bf16.

Round-5 follow-through on the SDXL result (bench_w8a8.py: calibrated
static W8A8 paid +20% on the compute-dominated config): the SVD loop is
the other compute-dominated tracked config (2.03 s/step while-loop,
trace 2026-08-19) — its spatial resnet convs and attention/FF linears
carry the same int8-MXU opportunity (v5e int8 ≈ 2× bf16 MXU rate).
5-D temporal convs and the time/add embeddings stay bf16.

Phases run in subprocesses like SDXL (bf16 weight set + int8 copy +
both whole-loop executables brush the 16 GB HBM ceiling; measured
RESOURCE_EXHAUSTED pattern from bench_w8a8 2026-08-19 applies a
fortiori to the 25-frame activations).

Usage: python benchmarks/bench_svd_w8a8.py [--steps 25] [--frames 25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig

_T0 = time.time()


def log(msg):
    print(f"[svd-w8a8 +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def build(seed: int = 0):
    from sfast_tpu.models.autoencoder_kl_temporal import (
        SVD_VAE,
        create_temporal_vae,
        init_temporal_vae_params,
    )
    from sfast_tpu.models.clip_vision import (
        VIT_H_IMAGE_ENCODER,
        create_image_encoder,
    )
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.models.unet_spatio_temporal import (
        SVD_UNET,
        create_svd_unet,
        init_svd_unet_params,
    )
    from sfast_tpu.pipelines.stable_video_diffusion import (
        StableVideoDiffusionPipeline,
    )
    from sfast_tpu.runtime.packed_params import packed_normal_like

    def normal_params(init_fn, i):
        with shape_only_init():
            host = init_fn()
        return packed_normal_like(host, seed=seed + i)

    unet = create_svd_unet(
        SVD_UNET, params=normal_params(lambda: init_svd_unet_params(0, SVD_UNET), 0)
    )
    dec, enc = create_temporal_vae(
        SVD_VAE, params=normal_params(lambda: init_temporal_vae_params(0, SVD_VAE), 1)
    )
    pipe = StableVideoDiffusionPipeline(
        unet=unet,
        vae=dec,
        vae_encode=enc,
        image_encoder=create_image_encoder(VIT_H_IMAGE_ENCODER),
    )
    return sfast_tpu.compile(
        pipe, CompilationConfig.Default().replace(fuse_denoising_loop=True)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--quality-steps", type=int, default=5)
    ap.add_argument(
        "--no-convs", action="store_true",
        help="quantize only the linear sites",
    )
    ap.add_argument("--phase", default="subprocess",
                    choices=["subprocess", "bf16", "w8a8"])
    ap.add_argument("--io-file", default=None, help="phase handoff npz")
    args = ap.parse_args()

    if args.phase == "subprocess":
        import subprocess
        import tempfile

        io_file = tempfile.mktemp(suffix=".npz", prefix="svd_w8a8_")
        base = [
            sys.executable, os.path.abspath(__file__),
            "--frames", str(args.frames), "--height", str(args.height),
            "--width", str(args.width), "--steps", str(args.steps),
            "--chunk", str(args.chunk), "--repeats", str(args.repeats),
            "--quality-steps", str(args.quality_steps),
            "--io-file", io_file,
        ]
        if args.no_convs:
            base += ["--no-convs"]
        for phase in ("bf16", "w8a8"):
            r = subprocess.run(base + ["--phase", phase])
            if r.returncode != 0:
                log(
                    f"phase {phase} failed (rc={r.returncode}); handoff at "
                    f"{io_file} — resume with --phase w8a8 --io-file {io_file}"
                )
                sys.exit(r.returncode)
        try:
            os.unlink(io_file)
        except OSError:
            pass
        return

    pipe = build()
    log("pipeline built")
    img = np.zeros((1, args.height, args.width, 3), np.uint8)
    kw = dict(
        num_frames=args.frames, height=args.height, width=args.width,
        num_inference_steps=args.steps, decode_chunk_size=args.chunk,
    )
    lat_kw = dict(kw, num_inference_steps=args.quality_steps,
                  output_type="latent")

    def median_e2e():
        t0 = time.time()
        pipe(img, seed=0, **kw)  # compile + warm
        log(f"warm/compile done in {time.time() - t0:.0f}s")
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            out = pipe(img, seed=i + 1, **kw)
            assert out.images.shape[-1] == 3
            times.append(time.time() - t0)
            log(f"clip {i}: {times[-1]:.1f}s")
        return sorted(times)[len(times) // 2]

    if args.phase == "bf16":
        bf16_s = median_e2e()
        log(f"bf16 e2e {bf16_s:.1f}s; capturing {args.quality_steps}-step latents")
        lat_bf16 = np.asarray(pipe(img, seed=7, **lat_kw).images, np.float32)
        np.savez(args.io_file, bf16_s=bf16_s, lat_bf16=lat_bf16)
        return

    blob = np.load(args.io_file)
    bf16_s, lat_bf16 = float(blob["bf16_s"]), blob["lat_bf16"]

    from sfast_tpu.quant import calibrate_svd_pipeline, quantize_pipeline

    log("calibrating activation ranges (2 UNet evals)")
    cal = calibrate_svd_pipeline(
        pipe, img, num_frames=args.frames, height=args.height,
        width=args.width, num_inference_steps=args.steps,
        step_indices=(0, args.steps - 1),
    )
    log(f"calibration done ({len(cal.amax)} sites)")
    quantize_pipeline(
        pipe, mode="w8a8", quantize_convs=not args.no_convs, act_scales=cal
    )
    import gc

    cal = None
    gc.collect()
    jax.clear_caches()
    live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
    log(
        f"live device bytes: {sum(a.nbytes for a in live)/1e9:.2f} GB in "
        f"{len(live)} arrays"
    )
    log("quantize transform done; measuring w8a8 e2e")
    w8a8_s = median_e2e()
    log(f"w8a8 e2e {w8a8_s:.1f}s; capturing {args.quality_steps}-step latents")
    lat_q = np.asarray(pipe(img, seed=7, **lat_kw).images, np.float32)

    rel_rmse = float(
        np.sqrt(np.mean((lat_q - lat_bf16) ** 2))
        / (np.sqrt(np.mean(lat_bf16**2)) + 1e-12)
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"svd_xt_{args.frames}f_{args.height}x{args.width}_"
                    f"{args.steps}step_w8a8_e2e_s"
                ),
                "value": round(w8a8_s, 1),
                "unit": "s",
                "bf16_e2e_s": round(bf16_s, 1),
                "speedup_vs_bf16": round(bf16_s / w8a8_s, 3),
                "latent_rel_rmse": round(rel_rmse, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
