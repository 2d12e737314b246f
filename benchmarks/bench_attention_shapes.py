#!/usr/bin/env python
"""Attention backend shootout at model-relevant shapes (tunnel-proof
two-point timing).  Drives the flash/XLA dispatch thresholds in
``ops/attention.py`` — numbers in the table docstrings there must come
from here.

Usage: python benchmarks/bench_attention_shapes.py [--shapes sdxl|sd15|svd|all]
"""

import argparse
import functools
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[:1]))


def time_two_point(make_chain, n_lo=20, n_hi=60, repeats=4):
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


# (label, batch, heads, seq_q, seq_kv, head_dim)
SHAPES = {
    "sdxl": [
        ("xl L1 self 64^2", 2, 10, 4096, 4096, 64),
        ("xl L2 self 32^2", 2, 20, 1024, 1024, 64),
        ("xl L1 cross", 2, 10, 4096, 77, 64),
        ("xl L2 cross", 2, 20, 1024, 77, 64),
    ],
    "sd15": [
        ("sd15 L0 self 64^2", 2, 8, 4096, 4096, 40),
        ("sd15 L1 self 32^2", 2, 8, 1024, 1024, 80),
        ("sd15 L2 self 16^2", 2, 8, 256, 256, 160),
        ("sd15 L0 cross", 2, 8, 4096, 77, 40),
    ],
    "svd": [
        ("svd spatial 72x128", 25, 5, 9216, 9216, 64),
        ("svd temporal", 2, 5, 25, 25, 64),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="sdxl")
    ap.add_argument(
        "--backends", default="xla,flash", help="comma list: xla,flash,flash_int8"
    )
    args = ap.parse_args()

    from sfast_tpu.ops.attention import dot_product_attention

    groups = (
        [v for v in SHAPES.values() for v in v]
        if args.shapes == "all"
        else SHAPES[args.shapes]
    )
    for label, b, h, sq, skv, d in groups:
        key = jax.random.key(0)
        q = jax.random.normal(key, (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, skv, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, skv, d), jnp.bfloat16)
        row = [f"{label:22s} ({b},{h},{sq},{skv},{d})"]
        for backend in args.backends.split(","):
            fn = functools.partial(dot_product_attention, backend=backend)

            def make_chain(n, fn=fn):
                @jax.jit
                def run(q, k, v):
                    def body(i, y):
                        out = fn(y, k, v)
                        return y + 1e-6 * out.astype(y.dtype)

                    return jax.lax.fori_loop(0, n, body, q)

                return lambda: run(q, k, v)

            try:
                per = time_two_point(make_chain)
                row.append(f"{backend}: {per*1e6:8.1f} us")
            except Exception as e:
                row.append(f"{backend}: FAIL {type(e).__name__}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
