#!/usr/bin/env python
"""UNet eval timing/profiling harness with tunnel-proof methodology.

Two lessons from round 2 measurement archaeology (2026-08):

1. ``block_until_ready`` does NOT fence device work through the axon
   tunnel — a 50-matmul chain "finished" in microseconds.  Only a
   device→host read is a true sync.
2. Every synced call pays a ~24 ms fixed RPC round trip, which made
   single-op numbers garbage (the round-1 "XLA runs UNet GEMMs at
   6.5 TF/s" finding was an artifact: at roofline it's 131 TF/s-eff).
   Cure: time a fori_loop chain at TWO iteration counts and divide the
   difference — the fixed cost cancels exactly.

Usage: python benchmarks/profile_unet.py [--trace] [--steps 500]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import jax.profiler  # noqa: F401  (used under --trace)


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[:1]))


def time_two_point(make_chain, n_lo=10, n_hi=30, repeats=4):
    """Per-iteration device time with the fixed RPC cost cancelled."""
    lo, hi = make_chain(n_lo), make_chain(n_hi)
    _sync(lo())
    _sync(hi())
    best_lo = best_hi = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(lo())
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(hi())
        best_hi = min(best_hi, time.perf_counter() - t0)
    return (best_hi - best_lo) / (n_hi - n_lo)


def build_unet(ccfg=None, model_name="sd15"):
    from sfast_tpu.models.unet_2d_condition import (
        SD15_UNET,
        SDXL_UNET,
        create_unet,
        init_unet_params,
    )
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.runtime.packed_params import packed_zeros_like

    cfg = {"sd15": SD15_UNET, "sdxl": SDXL_UNET}[model_name]
    with shape_only_init():
        host = init_unet_params(0, cfg)
    params = packed_zeros_like(host)
    model = create_unet(cfg, params=params)
    if ccfg is None:
        return model, None
    return model, model.apply_fn(ccfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true", help="dump jax profiler trace")
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="FIELD=VALUE",
        help="override a CompilationConfig field, e.g. enable_fused_conv=0",
    )
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl"])
    args = ap.parse_args()

    from sfast_tpu.config import CompilationConfig

    ccfg = CompilationConfig.Default()
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(ccfg, k)
        ccfg = ccfg.replace(
            **{k: type(cur)(int(v) if isinstance(cur, bool) else v)}
        )
        print(f"ccfg.{k} = {getattr(ccfg, k)}")

    unet, fn = build_unet(ccfg, args.model)
    params = unet.params
    if args.model == "sdxl":
        x = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
        ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
        added = {
            "text_embeds": jnp.zeros((2, 1280), jnp.bfloat16),
            "time_ids": jnp.zeros((2, 6), jnp.float32),
        }
        kwargs = {"added_cond_kwargs": added}
    else:
        x = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
        ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
        kwargs = {}
    t = jnp.array([500.0, 500.0], jnp.float32)

    def make_chain(n):
        # params passed as an ARGUMENT, not closed over: closure capture
        # hoists the full weight tree into the lowering as constants
        # (5.1 GB for SDXL) and stalls compilation through the tunnel
        @jax.jit
        def run(p):
            def body(i, y):
                out = fn(p, y, t, ctx, **kwargs)
                return y + 1e-6 * out.astype(y.dtype)

            return jax.lax.fori_loop(0, n, body, x)

        return lambda: run(params)

    per = time_two_point(make_chain)
    print(f"UNet CFG eval [{args.model}]: {per*1e3:.2f} ms/eval (two-point fit, RPC-corrected)")

    if args.trace:
        chain = make_chain(10)
        _sync(chain())
        with jax.profiler.trace(args.trace_dir):
            _sync(chain())
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
