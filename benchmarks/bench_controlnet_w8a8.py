#!/usr/bin/env python
"""ControlNet W8A8 end-to-end A/B: bf16 vs calibrated static int8 on the
UNet + ControlNet trunk, same process and session.

Rationale: the ControlNet 30-step config runs 25.1 ms/step vs SD1.5's
18.8 (trace 2026-08-19) — the CN branch adds ~6.3 ms/step of extra conv
and attention compute on top of the same fixed cost, so the config sits
further toward the compute end of the roofline than bare SD1.5 (whose
W8A8 A/B was a measured loss).  This measures whether the int8 MXU pays
once the per-step compute share is this much larger.

Usage: python benchmarks/bench_controlnet_w8a8.py [--steps 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig

_T0 = time.time()


def log(msg):
    print(f"[cn-w8a8 +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def build(seed: int = 0):
    from sfast_tpu.models.autoencoder_kl import SD_VAE, create_vae, init_vae_params
    from sfast_tpu.models.clip_text import (
        SD15_TEXT_ENCODER,
        create_text_encoder,
        init_clip_text_params,
    )
    from sfast_tpu.models.controlnet import (
        SD15_CONTROLNET,
        create_controlnet,
        init_controlnet_params,
    )
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.models.unet_2d_condition import (
        SD15_UNET,
        create_unet,
        init_unet_params,
    )
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.runtime.packed_params import packed_normal_like
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler

    def normal_params(init_fn, i):
        with shape_only_init():
            host = init_fn()
        return packed_normal_like(host, seed=seed + i)

    dec, enc = create_vae(
        SD_VAE, params=normal_params(lambda: init_vae_params(0, SD_VAE), 0)
    )
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            SD15_UNET, params=normal_params(lambda: init_unet_params(0, SD15_UNET), 1)
        ),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(
            SD15_TEXT_ENCODER,
            params=normal_params(lambda: init_clip_text_params(0, SD15_TEXT_ENCODER), 2),
        ),
        controlnet=create_controlnet(
            SD15_CONTROLNET,
            params=normal_params(lambda: init_controlnet_params(0, SD15_CONTROLNET), 3),
        ),
        scheduler=DPMSolverMultistepScheduler(),
    )
    return sfast_tpu.compile(
        pipe, CompilationConfig.Default().replace(fuse_denoising_loop=True)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    pipe = build()
    log("pipeline built")
    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, dtype=jnp.int32)
    control = np.zeros((1, args.size, args.size, 3), np.uint8)
    kw = dict(
        prompt_ids=ids, height=args.size, width=args.size,
        num_inference_steps=args.steps, control_image=control,
    )
    lat_kw = dict(kw, num_inference_steps=10, output_type="latent")

    def median_e2e():
        t0 = time.time()
        pipe(seed=0, **kw)
        log(f"warm/compile done in {time.time() - t0:.0f}s")
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            out = pipe(seed=i + 1, **kw)
            assert out.images.shape[1] == args.size
            times.append((time.time() - t0) * 1e3)
            log(f"image {i}: {times[-1]:.1f} ms")
        return sorted(times)[len(times) // 2]

    bf16_ms = median_e2e()
    log(f"bf16 e2e {bf16_ms:.1f} ms; capturing 10-step latents")
    lat_bf16 = np.asarray(pipe(seed=7, **lat_kw).images, np.float32)

    from sfast_tpu.quant import calibrate_controlnet_pipeline, quantize_pipeline

    log("joint UNet+CN calibration")
    cal_u, cal_cn = calibrate_controlnet_pipeline(
        pipe, ids, control, height=args.size, width=args.size
    )
    log(f"calibration done ({len(cal_u.amax)} unet / {len(cal_cn.amax)} cn sites)")
    quantize_pipeline(
        pipe, mode="w8a8", quantize_convs=True, act_scales=cal_u,
        quantize_controlnet=True, controlnet_act_scales=cal_cn,
    )
    import gc

    cal_u = cal_cn = None
    gc.collect()
    jax.clear_caches()
    log("quantize transform done; measuring w8a8 e2e")
    w8a8_ms = median_e2e()
    log(f"w8a8 e2e {w8a8_ms:.1f} ms; capturing 10-step latents")
    lat_q = np.asarray(pipe(seed=7, **lat_kw).images, np.float32)

    rel_rmse = float(
        np.sqrt(np.mean((lat_q - lat_bf16) ** 2))
        / (np.sqrt(np.mean(lat_bf16**2)) + 1e-12)
    )
    print(
        json.dumps(
            {
                "metric": f"sd15_controlnet_{args.size}_{args.steps}step_w8a8_e2e_ms",
                "value": round(w8a8_ms, 1),
                "unit": "ms",
                "bf16_e2e_ms": round(bf16_ms, 1),
                "speedup_vs_bf16": round(bf16_ms / w8a8_ms, 3),
                "latent_rel_rmse_10step": round(rel_rmse, 4),
                "its_per_s": round(args.steps / (w8a8_ms / 1e3), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
