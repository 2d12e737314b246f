#!/usr/bin/env python
"""W8A8 end-to-end: latency + latent-MSE quality bound vs bf16.

VERDICT r2 #2/#6: the quant pieces (ops/quant.py, quant/dynamic_quant.py)
existed without a measured full-model number.  This harness measures, on
the same process and device:

1. bf16 e2e (SD1.5 512² 50-step fused pipeline) — the tracked headline;
2. W8A8 e2e — UNet linears + resnet convs int8 (v5e int8 MXU ≈ 2× bf16);
3. an on-device latent agreement bound between the two paths at 10 steps
   with NONZERO weights (packed_normal_like) — the driver-visible check
   that the int8 path computes the same function (rel RMSE, not a
   cosmetic zeros==zeros pass).

Usage: python benchmarks/bench_w8a8.py [--model sd15|sdxl] [--steps 50]
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
from sfast_tpu.quant import quantize_pipeline


def build(model: str, seed: int = 0):
    from sfast_tpu.models.unet_2d_condition import (
        SD15_UNET,
        SDXL_UNET,
        create_unet,
        init_unet_params,
    )
    from sfast_tpu.models.autoencoder_kl import (
        SD_VAE,
        SDXL_VAE,
        create_vae,
        init_vae_params,
    )
    from sfast_tpu.models.clip_text import (
        SD15_TEXT_ENCODER,
        SDXL_TEXT_ENCODER_2,
        create_text_encoder,
        init_clip_text_params,
    )
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.runtime.packed_params import packed_normal_like
    from sfast_tpu.schedulers import (
        DPMSolverMultistepScheduler,
        EulerDiscreteScheduler,
    )

    def normal_params(init_fn, i):
        with shape_only_init():
            host = init_fn()
        return packed_normal_like(host, seed=seed + i)

    ucfg = SD15_UNET if model == "sd15" else SDXL_UNET
    vcfg = SD_VAE if model == "sd15" else SDXL_VAE
    unet = create_unet(ucfg, params=normal_params(lambda: init_unet_params(0, ucfg), 0))
    dec, enc = create_vae(vcfg, params=normal_params(lambda: init_vae_params(0, vcfg), 1))
    te = create_text_encoder(
        SD15_TEXT_ENCODER,
        params=normal_params(
            lambda: init_clip_text_params(0, SD15_TEXT_ENCODER), 2
        ),
    )
    if model == "sd15":
        from sfast_tpu.pipelines import StableDiffusionPipeline

        pipe = StableDiffusionPipeline(
            unet=unet, vae=dec, vae_encode=enc, text_encoder=te,
            scheduler=DPMSolverMultistepScheduler(),
        )
    else:
        from sfast_tpu.pipelines.stable_diffusion_xl import (
            StableDiffusionXLPipeline,
        )

        te2 = create_text_encoder(
            SDXL_TEXT_ENCODER_2,
            params=normal_params(
                lambda: init_clip_text_params(0, SDXL_TEXT_ENCODER_2), 3
            ),
        )
        pipe = StableDiffusionXLPipeline(
            unet=unet, vae=dec, vae_encode=enc, text_encoder=te,
            text_encoder_2=te2, scheduler=EulerDiscreteScheduler(),
        )
    return sfast_tpu.compile(
        pipe, CompilationConfig.Default().replace(fuse_denoising_loop=True)
    )


_T0 = time.time()


def log(msg):
    print(f"[w8a8 +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def median_e2e(pipe, kw, repeats):
    pipe(seed=0, **kw)  # compile + warm
    log(f"warm/compile done ({kw['num_inference_steps']} steps)")
    times = []
    for i in range(repeats):
        t0 = time.time()
        out = pipe(seed=i, **kw)
        assert out.images.shape[-1] == 3
        times.append((time.time() - t0) * 1e3)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--no-convs", action="store_true",
        help="quantize only the linear sites (attention/GEGLU projections)",
    )
    ap.add_argument(
        "--static", action="store_true",
        help="calibrated static activation scales (no per-site max pass)",
    )
    ap.add_argument(
        "--phase", default="auto", choices=["auto", "all", "bf16", "w8a8"],
        help="SDXL at 1024² cannot hold the bf16 AND w8a8 executables + "
        "weight sets in HBM at once (measured RESOURCE_EXHAUSTED at the "
        "w8a8 warmup, 2026-08-19); 'auto' splits the two measurements "
        "into subprocesses for sdxl and stays in-process for sd15",
    )
    ap.add_argument("--io-file", default=None, help="phase handoff npz")
    args = ap.parse_args()
    size = args.size or (512 if args.model == "sd15" else 1024)

    if args.phase == "auto":
        args.phase = "all" if args.model == "sd15" else "subprocess"
    if args.phase == "subprocess":
        import subprocess, tempfile

        io_file = tempfile.mktemp(suffix=".npz", prefix="w8a8_")
        base = [sys.executable, os.path.abspath(__file__),
                "--model", args.model, "--steps", str(args.steps),
                "--repeats", str(args.repeats), "--io-file", io_file]
        if args.size:
            base += ["--size", str(args.size)]
        if args.no_convs:
            base += ["--no-convs"]
        if args.static:
            base += ["--static"]
        for phase in ("bf16", "w8a8"):
            r = subprocess.run(base + ["--phase", phase])
            if r.returncode != 0:
                log(
                    f"phase {phase} failed (rc={r.returncode}); bf16 "
                    f"handoff kept at {io_file} — resume with "
                    f"--phase w8a8 --io-file {io_file}"
                )
                sys.exit(r.returncode)
        try:
            os.unlink(io_file)
        except OSError:
            pass
        return

    pipe = build(args.model)
    ids = jax.random.randint(jax.random.key(0), (1, 77), 0, 49408, jnp.int32)
    kw = dict(
        prompt_ids=ids, height=size, width=size,
        num_inference_steps=args.steps,
    )
    lat_kw = dict(kw, num_inference_steps=10, output_type="latent")

    if args.phase in ("all", "bf16"):
        log("pipeline built; measuring bf16 e2e")
        bf16_ms = median_e2e(pipe, kw, args.repeats)
        log(f"bf16 e2e {bf16_ms:.1f} ms; capturing 10-step bf16 latents")
        lat_bf16 = np.asarray(pipe(seed=3, **lat_kw).images, np.float32)
        if args.phase == "bf16":
            np.savez(args.io_file, bf16_ms=bf16_ms, lat_bf16=lat_bf16)
            return
    else:
        blob = np.load(args.io_file)
        bf16_ms, lat_bf16 = float(blob["bf16_ms"]), blob["lat_bf16"]

    cal = None
    if args.static:
        from sfast_tpu.quant import calibrate_pipeline

        log("calibrating activation ranges")
        cal = calibrate_pipeline(pipe, ids, height=size, width=size)
        log(f"calibration done ({len(cal.amax)} sites)")
    quantize_pipeline(
        pipe, mode="w8a8", quantize_convs=not args.no_convs, act_scales=cal
    )
    # Free the bf16 weight set + calibration executables before the big
    # w8a8 compile/run: at SDXL 1024² the bf16 UNet (5.1 GB) + int8 copy
    # + executables brush the 16 GB HBM ceiling (RESOURCE_EXHAUSTED at
    # the w8a8 warmup, 2026-08-19).
    import gc

    cal = None
    gc.collect()
    jax.clear_caches()
    live = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)
    log(
        f"live device bytes: {sum(a.nbytes for a in live)/1e9:.2f} GB in "
        f"{len(live)} arrays; top: "
        + ", ".join(f"{a.dtype}{list(a.shape)}={a.nbytes/1e6:.0f}MB" for a in live[:6])
    )
    log("quantize transform done; measuring w8a8 e2e")
    w8a8_ms = median_e2e(pipe, kw, args.repeats)
    log(f"w8a8 e2e {w8a8_ms:.1f} ms; capturing 10-step w8a8 latents")
    lat_q = np.asarray(pipe(seed=3, **lat_kw).images, np.float32)

    rel_rmse = float(
        np.sqrt(np.mean((lat_q - lat_bf16) ** 2))
        / (np.sqrt(np.mean(lat_bf16**2)) + 1e-12)
    )
    print(
        json.dumps(
            {
                "metric": f"{args.model}_{size}_w8a8_e2e_ms",
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
