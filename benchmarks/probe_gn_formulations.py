#!/usr/bin/env python
"""Same-session A/B of GroupNorm-stats formulations inside the UNet eval.

The cross-session tracked-bench numbers moved the WRONG way after the
lane-aligned rewrite of ``group_norm_xla`` (SDXL 7.64 -> 7.21 it/s),
but session noise and a cache-invalidation warmup differ between those
runs.  This probe compiles the SAME UNet eval under each formulation in
ONE session, interleaved, so the only variable is the GN stats graph:

- grouped:   reshape (N,HW,G,cpg), reduce axes (1,3)  [shipped]
- lane:      per-channel sums over HW, fold (N,C)->(N,G)

VERDICT (v5e, 2026-08-18): grouped wins on both models —
SDXL 164.6 vs 166.4 ms/eval, SD1.5 55.9 vs 57.1 (best-of-3 medians of
20 reps).  The lane rewrite was reverted; grouped ships.

Usage: python benchmarks/probe_gn_formulations.py [--model sdxl|sd15]
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

import importlib

gn_mod = importlib.import_module("sfast_tpu.ops.group_norm")
_apply_act = gn_mod._apply_act


def gn_xla_lane(x, gamma, beta, *, groups=32, eps=1e-5, act=None):
    """Lane-aligned formulation: per-channel HW sums, tiny group fold.

    Measured slower than grouped inside both UNets (see module
    docstring) — kept here so the A/B is re-runnable."""
    n, h, w, c = x.shape
    cpg = c // groups
    xf = x.reshape(n, h * w, c).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    cnt = jnp.float32(h * w * cpg)
    gs1 = jnp.sum(s1.reshape(n, groups, cpg), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, groups, cpg), axis=-1)
    mean_g = gs1 / cnt
    var_g = gs2 / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cpg, axis=-1).reshape(n, 1, c)
    rstd = jnp.repeat(rstd_g, cpg, axis=-1).reshape(n, 1, c)
    scale = rstd * gamma.reshape(1, 1, c).astype(jnp.float32)
    shift = beta.reshape(1, 1, c).astype(jnp.float32) - mean * scale
    y = xf * scale + shift
    return _apply_act(y, act).astype(x.dtype).reshape(n, h, w, c)


FORMULATIONS = {
    "grouped": gn_mod.group_norm_xla,
    "lane": gn_xla_lane,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sdxl", "sd15"], default="sdxl")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from benchmarks.common import zeros_on_device
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.unet_2d_condition import (
        SD15_UNET, SDXL_UNET, create_unet, init_unet_params,
    )
    from sfast_tpu.runtime.packed_params import maybe_unpack

    cfg = SDXL_UNET if args.model == "sdxl" else SD15_UNET
    size = 1024 if args.model == "sdxl" else 512
    unet = create_unet(
        cfg, params=zeros_on_device(lambda: init_unet_params(1, cfg))
    )
    ccfg = CompilationConfig.Default()
    unet_apply = unet.apply_fn(ccfg)
    p = unet.params
    s = size // 8
    lat2 = jnp.zeros((2, s, s, 4), jnp.bfloat16)
    cross = 2048 if args.model == "sdxl" else 768
    ctx = jnp.zeros((2, 77, cross), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)
    te = jnp.zeros((2, 1280), jnp.bfloat16)
    ti = jnp.zeros((2, 6), jnp.float32)

    fetch = jax.jit(lambda o: o.astype(jnp.float32).sum())
    exes = {}
    orig = gn_mod.group_norm_xla
    for label, fm in FORMULATIONS.items():
        gn_mod.group_norm_xla = fm
        try:
            if args.model == "sdxl":
                fn = lambda p, l, t, c, a, b: unet_apply(
                    maybe_unpack(p), l, t, c,
                    added_cond_kwargs={"text_embeds": a, "time_ids": b},
                )
            else:
                fn = lambda p, l, t, c, a, b: unet_apply(
                    maybe_unpack(p), l, t, c
                )
            t0 = time.time()
            exe = jax.jit(fn).lower(p, lat2, tt, ctx, te, ti).compile()
            exes[label] = exe
            print(json.dumps({label: {
                "compile_s": round(time.time() - t0, 1),
                "code_MB": round(
                    exe.memory_analysis().generated_code_size_in_bytes / 1e6, 1
                ),
            }}), flush=True)
        finally:
            gn_mod.group_norm_xla = orig

    results = {k: [] for k in exes}
    for _ in range(args.rounds):
        for label, exe in exes.items():
            call = lambda: np.asarray(fetch(exe(p, lat2, tt, ctx, te, ti)))
            call()
            ts = []
            for _ in range(args.reps):
                t0 = time.time()
                call()
                ts.append((time.time() - t0) * 1e3)
            ts.sort()
            results[label].append(round(ts[len(ts) // 2], 2))
    print(json.dumps({
        "model": args.model,
        "eval_ms_medians_per_round": results,
        "best": {k: min(v) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
