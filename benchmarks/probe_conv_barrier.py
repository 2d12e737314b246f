#!/usr/bin/env python
"""Does forcing bf16 materialization at the conv→GN boundary help SDXL?

XLA's excess-precision pass elides our f32→bf16→f32 convert pairs,
keeping conv outputs f32 through the GN stats + normalize reads (the
24 ms/eval convert_reduce pool in the round-3 trace).  The flag that
disables this (`xla_allow_excess_precision=false`) crashes the remote
compiler, so this probe forces it in code instead: an
``optimization_barrier`` after the conv's bf16 cast pins the bf16
materialization.  Measures the SDXL UNet eval with/without.

Usage: python benchmarks/probe_conv_barrier.py [--size 1024]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from benchmarks.common import zeros_on_device
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.unet_2d_condition import (
        SDXL_UNET, create_unet, init_unet_params,
    )
    from sfast_tpu.runtime.packed_params import maybe_unpack
    import sfast_tpu.ops.conv as conv_mod
    import sfast_tpu.models.layers as layers_mod

    unet = create_unet(
        SDXL_UNET,
        params=zeros_on_device(lambda: init_unet_params(1, SDXL_UNET)),
    )
    ccfg = CompilationConfig.Default()
    p = unet.params
    s = args.size // 8
    lat2 = jnp.zeros((2, s, s, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)
    te = jnp.zeros((2, 1280), jnp.bfloat16)
    ti = jnp.zeros((2, 6), jnp.float32)

    orig_conv2d = conv_mod.conv2d

    def barrier_conv2d(*a, **kw):
        return jax.lax.optimization_barrier(orig_conv2d(*a, **kw))

    fetch = jax.jit(lambda o: o.astype(jnp.float32).sum())

    for label, patched in [("baseline", False), ("conv_barrier", True)]:
        conv_mod.conv2d = barrier_conv2d if patched else orig_conv2d
        layers_mod.conv2d = conv_mod.conv2d
        unet_apply = unet.apply_fn(ccfg)

        def fn(p, l, t, c, te, ti):
            return unet_apply(
                maybe_unpack(p), l, t, c,
                added_cond_kwargs={"text_embeds": te, "time_ids": ti},
            )

        try:
            t0 = time.time()
            exe = jax.jit(fn).lower(p, lat2, tt, ctx, te, ti).compile()
            compile_s = time.time() - t0
            call = lambda: np.asarray(fetch(exe(p, lat2, tt, ctx, te, ti)))
            call()
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                call()
                ts.append((time.time() - t0) * 1e3)
            ts.sort()
            print(json.dumps({label: {
                "eval_ms_med": round(ts[len(ts) // 2], 2),
                "eval_ms_min": round(ts[0], 2),
                "compile_s": round(compile_s, 1),
            }}), flush=True)
        except Exception as e:
            print(json.dumps({label: {"error": str(e)[:300]}}), flush=True)
    conv_mod.conv2d = orig_conv2d
    layers_mod.conv2d = orig_conv2d


if __name__ == "__main__":
    main()
