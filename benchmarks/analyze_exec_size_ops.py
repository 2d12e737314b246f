#!/usr/bin/env python
"""Single-op generated-code sizes — find what XLA spends 250 MB on.

Compiles representative SD1.5 UNet ops at real shapes and prints each
one's generated-code size.  Also sweeps a few XLA flag candidates if
SWEEP=1 (flags must be set before backend init, so the sweep re-execs
subprocesses).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def code_mb(fn, *args):
    t0 = time.time()
    exe = jax.jit(fn).lower(*args).compile()
    ma = exe.memory_analysis()
    return {
        "MB": round(ma.generated_code_size_in_bytes / 1e6, 2),
        "s": round(time.time() - t0, 1),
    }


def conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def gn(x):
    b, h, w, c = x.shape
    g = 32
    xr = x.reshape(b, h * w, g, c // g).astype(jnp.float32)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    return ((xr - mean) / jnp.sqrt(var + 1e-5)).reshape(b, h, w, c).astype(x.dtype)


def main():
    out = {}
    shapes = [
        ("conv3x3_64x64x320", (2, 64, 64, 320), (3, 3, 320, 320)),
        ("conv3x3_32x32x640", (2, 32, 32, 640), (3, 3, 640, 640)),
        ("conv3x3_16x16x1280", (2, 16, 16, 1280), (3, 3, 1280, 1280)),
        ("conv3x3_8x8x1280", (2, 8, 8, 1280), (3, 3, 1280, 1280)),
    ]
    for name, xs, ws in shapes:
        x = jnp.zeros(xs, jnp.bfloat16)
        w = jnp.zeros(ws, jnp.bfloat16)
        out[name] = code_mb(conv3x3, x, w)
        print(name, out[name], file=sys.stderr, flush=True)

    x = jnp.zeros((2, 64, 64, 320), jnp.bfloat16)
    out["gn_64x64x320"] = code_mb(gn, x)
    print("gn", out["gn_64x64x320"], file=sys.stderr, flush=True)

    # conv + gn + silu fused chain (what a resnet block does twice)
    w = jnp.zeros((3, 3, 320, 320), jnp.bfloat16)
    out["conv_gn_silu"] = code_mb(
        lambda x, w: jax.nn.silu(gn(conv3x3(x, w).astype(jnp.bfloat16))), x, w
    )
    print("conv_gn_silu", out["conv_gn_silu"], file=sys.stderr, flush=True)

    # attention projections: 4096x320 @ 320x320
    a = jnp.zeros((2, 4096, 320), jnp.bfloat16)
    wp = jnp.zeros((320, 320), jnp.bfloat16)
    out["proj_4096x320"] = code_mb(
        lambda a, w: jnp.einsum("bsd,df->bsf", a, w), a, wp
    )
    print("proj", out["proj_4096x320"], file=sys.stderr, flush=True)

    # materialized attention at 4096 tokens, 8 heads x 40
    q = jnp.zeros((2, 8, 4096, 40), jnp.bfloat16)
    def attn(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q) * 0.158
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, q)
    out["xla_attn_4096_d40"] = code_mb(attn, q)
    print("xla_attn", out["xla_attn_4096_d40"], file=sys.stderr, flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
