#!/usr/bin/env python
"""Compiler-option sweep on the SDXL UNet eval (VERDICT r3 next-step #2).

The round-3 trace put 24.0 ms/eval in GN convert_reduce (XLA keeping
conv outputs f32 through the bf16 convert pair — "excess precision")
and 12.6 ms in layout churn.  Sweeps the options that target exactly
those pools on ONE CFG-batched SDXL UNet eval at 1024².

Usage: python benchmarks/sweep_sdxl_opts.py [--size 1024]
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

CONFIGS = {
    "baseline": {},
    "no_excess_precision": {"xla_allow_excess_precision": "false"},
    "conv_downcast_fusion": {
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"
    },
    "autotune_layouts": {"xla_tpu_autotune_layouts": "true"},
    "no_excess+downcast": {
        "xla_allow_excess_precision": "false",
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()

    from benchmarks.common import zeros_on_device
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.unet_2d_condition import (
        SDXL_UNET, create_unet, init_unet_params,
    )
    from sfast_tpu.runtime.packed_params import maybe_unpack
    from sfast_tpu.runtime.tracing import tpu_compiler_options

    unet = create_unet(
        SDXL_UNET,
        params=zeros_on_device(lambda: init_unet_params(1, SDXL_UNET)),
    )
    ccfg = CompilationConfig.Default()
    unet_apply = unet.apply_fn(ccfg)
    p = unet.params
    s = args.size // 8
    lat2 = jnp.zeros((2, s, s, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)
    added = {
        "text_embeds": jnp.zeros((2, 1280), jnp.bfloat16),
        "time_ids": jnp.zeros((2, 6), jnp.float32),
    }

    def fn(p, l, t, c, te, ti):
        return unet_apply(
            maybe_unpack(p), l, t, c,
            added_cond_kwargs={"text_embeds": te, "time_ids": ti},
        )

    lowered = jax.jit(fn).lower(p, lat2, tt, ctx, added["text_embeds"], added["time_ids"])
    fetch = jax.jit(lambda o: o.astype(jnp.float32).sum())

    base = tpu_compiler_options() or {}
    for label in args.configs:
        opts = dict(base)
        opts.update(CONFIGS[label])
        try:
            t0 = time.time()
            exe = lowered.compile(compiler_options=opts or None)
            compile_s = time.time() - t0
            ma = exe.memory_analysis()
            call = lambda: np.asarray(
                fetch(exe(p, lat2, tt, ctx, added["text_embeds"], added["time_ids"]))
            )
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
                "code_MB": round(ma.generated_code_size_in_bytes / 1e6, 1),
                "compile_s": round(compile_s, 1),
            }}), flush=True)
        except Exception as e:
            print(json.dumps({label: {"error": str(e)[:300]}}), flush=True)


if __name__ == "__main__":
    main()
