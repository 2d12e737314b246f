#!/usr/bin/env python
"""Attribute the UNet's 255 MB of generated code: Pallas vs XLA.

analyze_exec_size_parts.py showed ONE SD1.5 UNet eval compiles to 255 MB
of generated code.  This probe compiles the same eval with
``enable_pallas=False`` (pure XLA) and with flash-only / no-flash
configurations, plus isolated single kernels, to find whether the bytes
are (a) per-call-site embedded Mosaic kernel binaries or (b) XLA conv
codegen.

Usage: python benchmarks/analyze_exec_size_pallas.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def code_mb(fn, *args):
    t0 = time.time()
    exe = jax.jit(fn).lower(*args).compile()
    ma = exe.memory_analysis()
    return {
        "generated_code_MB": round(ma.generated_code_size_in_bytes / 1e6, 1),
        "compile_s": round(time.time() - t0, 1),
    }


def main():
    from bench import build_pipeline

    pipe = build_pipeline()
    unet_packed = pipe.unet.params

    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)

    from sfast_tpu.runtime.packed_params import maybe_unpack

    out = {}
    for label, repl in [
        ("default", {}),
        ("no_pallas", dict(enable_pallas=False)),
        ("no_flash", dict(enable_flash_attention=False)),
        ("no_geglu", dict(enable_fused_linear_geglu=False)),
    ]:
        ccfg = pipe._ccfg.replace(**repl) if repl else pipe._ccfg
        unet_apply = pipe.unet_model.apply_fn(ccfg)
        out[label] = code_mb(
            lambda p, l, t, c: unet_apply(maybe_unpack(p), l, t, c),
            unet_packed, lat2, tt, ctx,
        )
        print(label, out[label], file=sys.stderr, flush=True)

    # isolated kernels
    from sfast_tpu.ops.flash_attention import flash_attention

    q = jnp.zeros((2, 8, 4096, 40), jnp.bfloat16)
    out["flash_4096_d40"] = code_mb(
        lambda q: flash_attention(q, q, q), q
    )
    print("flash_4096_d40", out["flash_4096_d40"], file=sys.stderr, flush=True)

    q2 = jnp.zeros((2, 8, 1024, 80), jnp.bfloat16)
    out["flash_1024_d80"] = code_mb(
        lambda q: flash_attention(q, q, q), q2
    )
    print("flash_1024_d80", out["flash_1024_d80"], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
