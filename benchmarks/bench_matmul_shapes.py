#!/usr/bin/env python
"""Measure XLA matmul/conv throughput at SD-UNet shapes on the live chip.

Methodology: chain ITERS data-dependent invocations inside ONE jitted
fori_loop so the ~0.6 ms per-dispatch tunnel floor (STATUS.md round 2)
amortizes away; report TF/s from device wall time, min of REPEATS.

The round-2 open question this answers: does XLA really leave 4-8x on
the table at (M=8k, K/N 320-2560) GEMMs / level-0 convs, or was the
21-50 TF/s figure a measurement artifact?  A Pallas GEMM/conv only makes
sense if the former.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

ITERS = 50
REPEATS = 5


def _sync(out):
    # Over the axon tunnel block_until_ready can return before the device
    # work drains (measured: a 50-iteration matmul chain "finishes" in
    # microseconds).  A 1-element device→host read is a true fence.
    import numpy as np

    np.asarray(jax.device_get(out[:1, :1]))


def timeit(fn, *args):
    _sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def chain_matmul(m, k, n, dtype=jnp.bfloat16):
    """y_{i+1} = f(y_i @ W_i) with W ping-pong to defeat CSE."""
    x = jnp.ones((m, k), dtype)
    w1 = jnp.ones((k, n), dtype) * 0.01
    w2 = jnp.ones((n, k), dtype) * 0.01

    @jax.jit
    def run(x, w1, w2):
        def body(i, y):
            a = jax.lax.dot_general(
                y, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            return jax.lax.dot_general(
                a, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(run, x, w1, w2)  # t is per fori iteration = 2 matmuls
    flops = 2 * m * k * n + 2 * m * n * k
    return flops / t / 1e12


def chain_conv(nhwc, cout, kh=3, dtype=jnp.bfloat16):
    n, h, w, cin = nhwc
    x = jnp.ones(nhwc, dtype)
    w1 = jnp.ones((kh, kh, cin, cout), dtype) * 0.01
    w2 = jnp.ones((kh, kh, cout, cin), dtype) * 0.01
    dn = ("NHWC", "HWIO", "NHWC")
    pad = [(kh // 2, kh // 2)] * 2

    @jax.jit
    def run(x, w1, w2):
        def body(i, y):
            a = jax.lax.conv_general_dilated(
                y, w1, (1, 1), pad, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            return jax.lax.conv_general_dilated(
                a, w2, (1, 1), pad, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ).astype(dtype)

        return jax.lax.fori_loop(0, ITERS, body, x)

    t = timeit(run, x, w1, w2)
    flops = 2 * n * h * w * (kh * kh * cin * cout + kh * kh * cout * cin)
    return flops / t / 1e12


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    gemms = [
        # (label, M, K, N) — SD1.5 512^2 CFG bs2 shapes
        ("attn-proj L0", 8192, 320, 320),
        ("ff-in L0 (geglu half)", 8192, 320, 2560),
        ("ff-out L0", 8192, 1280, 320),
        ("attn-proj L1", 2048, 640, 640),
        ("ff-in L1", 2048, 640, 5120),
        ("attn-proj L2", 512, 1280, 1280),
        ("big square", 4096, 4096, 4096),
    ]
    for label, m, k, n in gemms:
        tf = chain_matmul(m, k, n)
        print(f"GEMM {label:24s} M={m:5d} K={k:5d} N={n:5d}  {tf:6.1f} TF/s")

    convs = [
        ("conv3x3 L0", (2, 64, 64, 320), 320),
        ("conv3x3 L1", (2, 32, 32, 640), 640),
        ("conv3x3 L2", (2, 16, 16, 1280), 1280),
        ("conv3x3 L3", (2, 8, 8, 1280), 1280),
        ("conv3x3 VAE-top", (1, 512, 512, 128), 128),
    ]
    for label, shape, cout in convs:
        tf = chain_conv(shape, cout)
        print(f"CONV {label:24s} {str(shape):18s} Cout={cout:4d}  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
