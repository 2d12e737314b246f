#!/usr/bin/env python
"""VAE decoder timing with the tunnel-proof two-point methodology
(see profile_unet.py for why block_until_ready and single-shot timings
are unusable over the axon tunnel)."""

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


def time_two_point(make_chain, n_lo=3, n_hi=10, repeats=4):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace_vae")
    args = ap.parse_args()

    from sfast_tpu.models.autoencoder_kl import (
        SD_VAE,
        create_vae,
        init_vae_params,
    )

    host = init_vae_params(0, SD_VAE)
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host
    )
    del host
    params = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
    )()
    dec, _ = create_vae(SD_VAE, params=params)

    z = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)

    def make_chain(n):
        @jax.jit
        def run():
            def body(i, carry):
                img = dec(z + carry * 1e-6)
                return jnp.sum(img.astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    per = time_two_point(make_chain)
    print(f"VAE decode 64x64x4 -> 512x512x3: {per*1e3:.2f} ms")

    if args.trace:
        chain = make_chain(3)
        _sync(chain())
        with jax.profiler.trace(args.trace_dir):
            _sync(chain())
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
