#!/usr/bin/env python
"""On-hardware numeric correctness (VERDICT r2 weakness #6).

All numeric parity tests run on CPU jax (interpret-mode kernels); nothing
previously asserted that the REAL Mosaic-compiled kernels and the bf16
TPU pipeline produce the same numbers.  This closes it, two ways:

1. in-process, on device: flash attention (both softmax dtypes, the
   d<=64-native path, int8 variant) and the fused conv kernel against
   their XLA references at model-relevant shapes;
2. cross-backend: a tiny full pipeline with identical seeded weights run
   in THIS process (TPU) and in a JAX_PLATFORMS=cpu subprocess, latents
   compared (threefry RNG is backend-invariant, so weights and noise
   match exactly).

Prints one JSON line; nonzero exit on any bound violation.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(
        np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12)
    )


def kernel_checks():
    from sfast_tpu.ops.attention import xla_attention
    from sfast_tpu.ops.flash_attention import flash_attention, flash_attention_int8
    from sfast_tpu.ops.conv_pallas import conv3x3_gn_silu
    from sfast_tpu.ops.conv import conv2d

    out = {}
    key = jax.random.key(0)
    # SD1.5 L0 (d=40 -> 64-pad) and SDXL L1 (d=64-native) shapes
    for label, shape in [
        ("flash_d40_4096", (2, 8, 4096, 40)),
        ("flash_d64_4096", (2, 10, 4096, 64)),
        ("flash_d64_1024", (2, 20, 1024, 64)),
    ]:
        q = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), shape, jnp.bfloat16)
        ref = xla_attention(q, k, v)
        out[label + "_f32sm"] = rel_err(
            flash_attention(q, k, v), ref
        )
        out[label + "_bf16sm"] = rel_err(
            flash_attention(q, k, v, softmax_dtype=jnp.bfloat16), ref
        )
        out[label + "_int8"] = rel_err(flash_attention_int8(q, k, v), ref)

    # fused conv kernel at the VAE upsample shape class (auto-on region)
    x = jax.random.normal(jax.random.fold_in(key, 4), (1, 128, 128, 256), jnp.bfloat16)
    w = 0.05 * jax.random.normal(
        jax.random.fold_in(key, 5), (3, 3, 256, 256), jnp.bfloat16
    )
    b = 0.05 * jax.random.normal(jax.random.fold_in(key, 6), (256,), jnp.bfloat16)
    ref = conv2d(x, w, b, padding=1)
    out["conv3x3_pallas"] = rel_err(conv3x3_gn_silu(x, w, b), ref)

    # calibrated static-scale W8A8 linear + conv (the quantize_pipeline
    # act_scales path) vs their bf16 references at UNet shape classes
    from sfast_tpu.ops.quant import (
        conv2d_w8a8_static,
        linear_w8a8_static,
        quantize_conv_weight,
        quantize_weight,
    )
    from sfast_tpu.ops.linear import linear as linear_ref

    xl = jax.random.normal(jax.random.fold_in(key, 7), (4096, 640), jnp.bfloat16)
    wl = 0.05 * jax.random.normal(
        jax.random.fold_in(key, 8), (640, 640), jnp.bfloat16
    )
    wq, ws = quantize_weight(wl)
    a = float(jnp.max(jnp.abs(xl)).astype(jnp.float32)) / 127.0
    out["linear_w8a8_static"] = rel_err(
        linear_w8a8_static(xl, wq.astype(jnp.int8), ws, jnp.float32(a)),
        linear_ref(xl, wl),
    )
    wq4, ws4 = quantize_conv_weight(w)
    ac = float(jnp.max(jnp.abs(x)).astype(jnp.float32)) / 127.0
    out["conv_w8a8_static"] = rel_err(
        conv2d_w8a8_static(x, wq4.astype(jnp.int8), ws4, jnp.float32(ac), b, padding=1),
        ref,
    )
    return out


def pipeline_latents():
    """Tiny seeded pipeline -> 4-step latents on whichever backend this
    process runs (bf16 weights; threefry weights/noise match across
    backends, rounding differs)."""
    import dataclasses

    import sfast_tpu
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet, init_unet_params
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae, init_vae_params
    from sfast_tpu.models.clip_text import (
        TINY_TEXT_ENCODER,
        create_text_encoder,
        init_clip_text_params,
    )
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.runtime.packed_params import packed_normal_like
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler

    ucfg = dataclasses.replace(
        TINY_UNET, cross_attention_dim=64, dtype=jnp.bfloat16
    )
    vcfg = dataclasses.replace(TINY_TEST_VAE, dtype=jnp.bfloat16)
    tcfg = dataclasses.replace(TINY_TEXT_ENCODER, dtype=jnp.bfloat16)

    def normal_params(init_fn, i):
        with shape_only_init():
            host = init_fn()
        return packed_normal_like(host, seed=100 + i)

    dec, enc = create_vae(vcfg, params=normal_params(lambda: init_vae_params(0, vcfg), 1))
    pipe = StableDiffusionPipeline(
        unet=create_unet(ucfg, params=normal_params(lambda: init_unet_params(0, ucfg), 0)),
        vae=dec, vae_encode=enc,
        text_encoder=create_text_encoder(
            tcfg, params=normal_params(lambda: init_clip_text_params(0, tcfg), 2)
        ),
        scheduler=DPMSolverMultistepScheduler(),
    )
    sfast_tpu.compile(pipe, CompilationConfig.Default())
    ids = jax.random.randint(jax.random.key(7), (1, 77), 0, 999, jnp.int32)
    out = pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=4, seed=0,
        output_type="latent",
    )
    return np.asarray(out.images, np.float32)


# bounds: bf16 kernels vs f32-softmax XLA ~ 1e-2; int8 attention ~ 3e-2
# (the documented quality trade); cross-backend bf16 pipeline over 4
# steps accumulates rounding differences -> 0.15
BOUNDS = {"_int8": 0.05, "conv3x3_pallas": 0.02, "default": 0.02}
CROSS_BACKEND_BOUND = 0.15


def main():
    if "--emit-latents" in sys.argv:
        # env alone is not enough: sitecustomize pre-imports jax pointed
        # at the tunneled TPU; force the platform before backend init or
        # the "CPU" run silently executes on the same TPU (observed as a
        # suspiciously exact 0.0 cross-backend error)
        jax.config.update("jax_platforms", "cpu")
        assert jax.devices()[0].platform == "cpu", jax.devices()
        np.save(sys.argv[-1], pipeline_latents())
        return

    results = {"device": str(jax.devices()[0])}
    failures = []
    for k, v in kernel_checks().items():
        results[k] = round(v, 5)
        bound = next(
            (b for pat, b in BOUNDS.items() if pat != "default" and pat in k),
            BOUNDS["default"],
        )
        if v > bound:
            failures.append(f"{k}={v:.4f}>{bound}")

    here = pipeline_latents()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cpu_latents.npy")
        env = dict(os.environ, JAX_PLATFORMS="cpu", SFAST_TPU_DISABLE_CACHE="1")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--emit-latents", path],
            check=True, env=env, timeout=1200,
        )
        cpu = np.load(path)
    results["pipeline_tpu_vs_cpu"] = round(rel_err(here, cpu), 5)
    if results["pipeline_tpu_vs_cpu"] > CROSS_BACKEND_BOUND:
        failures.append(f"pipeline={results['pipeline_tpu_vs_cpu']}")

    results["ok"] = not failures
    if failures:
        results["failures"] = failures
    print(json.dumps(results))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
