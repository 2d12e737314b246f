#!/usr/bin/env python
"""Piecewise generated-code-size census of the fused SD1.5 pipeline.

analyze_exec_size.py says the fused 50-step executable is 338 MB of
*generated code* (constants ~0).  This probe compiles each stage as its
own executable and prints per-stage generated-code size, to locate the
duplication:

  unpack   — maybe_unpack(packed) alone (700 static slices + relayouts)
  te       — one CLIP text-encoder eval
  vae      — one VAE decode at 64x64 latents
  unet     — ONE UNet CFG eval (unpacked params as args)
  loop50   — the 50-step fori_loop (packed params, unpack hoisted)

Usage: python benchmarks/analyze_exec_size_parts.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def code_mb(fn, *args):
    t0 = time.time()
    exe = jax.jit(fn).lower(*args).compile()
    dt = time.time() - t0
    ma = exe.memory_analysis()
    return {
        "generated_code_MB": round(ma.generated_code_size_in_bytes / 1e6, 1),
        "temp_MB": round(ma.temp_size_in_bytes / 1e6, 1),
        "compile_s": round(dt, 1),
    }


def main():
    from bench import build_pipeline

    pipe = build_pipeline()
    from sfast_tpu.runtime.packed_params import maybe_unpack

    ccfg = pipe._ccfg
    te_model = pipe.text_encoder.model if hasattr(pipe.text_encoder, "model") else pipe.text_encoder
    vae_model = pipe.vae.model if hasattr(pipe.vae, "model") else pipe.vae
    te_apply = te_model.apply_fn(ccfg)
    vae_apply = vae_model.apply_fn(ccfg)
    unet_apply = pipe.unet_model.apply_fn(ccfg)

    unet_packed = pipe.unet.params
    te_params = pipe.text_encoder.params
    vae_params = pipe.vae.params

    ids = jnp.zeros((1, 77), jnp.int32)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)

    out = {}
    out["unpack"] = code_mb(lambda p: maybe_unpack(p), unet_packed)
    print("unpack", out["unpack"], file=sys.stderr, flush=True)

    out["te"] = code_mb(lambda p, i: te_apply(p, i), te_params, ids)
    print("te", out["te"], file=sys.stderr, flush=True)

    out["vae"] = code_mb(
        lambda p, l: vae_apply(p, l), vae_params, lat.astype(jnp.bfloat16)
    )
    print("vae", out["vae"], file=sys.stderr, flush=True)

    # one UNet eval, packed params (unpack fused in — what the stepwise
    # path compiles)
    out["unet_packed_1eval"] = code_mb(
        lambda p, l, t, c: unet_apply(maybe_unpack(p), l, t, c),
        unet_packed, lat2, tt, ctx,
    )
    print("unet_packed_1eval", out["unet_packed_1eval"], file=sys.stderr, flush=True)

    # the 50-step loop with hoisted unpack (what the fused path embeds)
    scheduler = pipe.scheduler
    state = pipe._scheduler_state(50)
    if hasattr(scheduler, "prepare_state"):
        state = scheduler.prepare_state(state, lat)

    def loop50(p, latents, context, st, gs, key):
        params = maybe_unpack(p)

        def body(i, carry):
            la, s, k = carry
            lat_in = jnp.concatenate([la, la], axis=0)
            lat_in = scheduler.scale_model_input(s, lat_in, i)
            t = s["timesteps"][i]
            t2 = jnp.broadcast_to(t, (lat_in.shape[0],))
            eps = unet_apply(params, lat_in, t2, context)
            eu, ec = jnp.split(eps, 2, axis=0)
            eps = eu + gs * (ec - eu)
            la, s = scheduler.step(s, eps, i, la)
            return (la, s, k)

        la, _, _ = jax.lax.fori_loop(0, 50, body, (latents, st, key))
        return la

    out["loop50"] = code_mb(
        loop50, unet_packed, lat, ctx, state,
        jnp.float32(7.5), jax.random.key(0),
    )
    print("loop50", out["loop50"], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
