#!/usr/bin/env python
"""Dissect the non-loop fixed cost of the fused SD1.5 pipeline call.

The two-point fit (bench.py, 50 vs 25 steps) says the denoise loop costs
~15.8 ms/step and everything else ~309 ms/call (2026-08-18).  This probe
splits that fixed pool into:

  rtt_ms           — one tiny cached-executable round trip (dispatch+sync)
  dispatch_only_ms — fused pipeline call, block_until_ready, NO image fetch
                     (device compute + dispatch RPCs, no payload download)
  fetch_ms         — np.asarray(image) after the result is already ready
  e2e_ms           — the normal timed call for cross-checking

Run it alone on the chip (single-tenant timing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("PROBE_STEPS", "50"))


def med(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_w8a8 import build  # same pipeline builder as the benches

    pipe = build("sd15")
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 49408, jnp.int32)
    kw = dict(prompt_ids=ids, height=512, width=512,
              num_inference_steps=STEPS, guidance_scale=7.5)

    # tiny round trip: cached 1-element add, then fetch
    one = jnp.ones((8,), jnp.float32)
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(one))
    rtt_ms = med(lambda: np.asarray(tiny(one)), 9)

    pipe(seed=0, **kw)  # compile/warm
    e2e_ms = med(lambda: np.asarray(pipe(seed=1, **kw).images), 5)

    # dispatch + device compute, but skip the image payload download
    fp = pipe._fused_loops[("full", STEPS, True)]
    unet_params = pipe.unet.params
    te_params = pipe.text_encoder.params
    vae_params = pipe.vae.params
    state = pipe._scheduler_state(STEPS)
    gs = pipe._dev_scalar(7.5)
    seed_arr = np.asarray([1], np.uint32)
    args = (unet_params, te_params, vae_params, ids, ids, state, gs, seed_arr)

    def dispatch_only():
        out = fp(*args, lat_shape=(1, 64, 64, 4))
        out.block_until_ready()
        return out

    dispatch_only_ms = med(dispatch_only, 5)

    # payload-only D2H with data ready: jax.Array caches its host copy
    # after the first np.asarray, so each iteration needs a FRESH device
    # output (timing the same array 5x would time the real transfer once
    # and 4 cached ~0 ms reads — ADVICE r3)
    fetch_ms = med(lambda: np.asarray(dispatch_only()), 5) - dispatch_only_ms

    print(json.dumps({
        "steps": STEPS,
        "rtt_ms": round(rtt_ms, 1),
        "dispatch_only_ms": round(dispatch_only_ms, 1),
        "fetch_ready_ms": round(fetch_ms, 1),
        "e2e_ms": round(e2e_ms, 1),
        "host_plus_download_ms": round(e2e_ms - dispatch_only_ms, 1),
    }))


if __name__ == "__main__":
    main()
