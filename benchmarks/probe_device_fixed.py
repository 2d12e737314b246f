#!/usr/bin/env python
"""Itemize the device-side fixed pool of the fused SD1.5 call.

probe_fixed_cost (honest-fetch version, 2026-08-18) showed the image
download is only ~62 ms and dispatch_only is ~1074 ms at 50 steps —
meaning the non-loop fixed pool (~300 ms by the two-point fit) is mostly
DEVICE work, not transfer.  This probe times each fixed-stage component
as its own executable, forcing completion with a 1-element sum fetch
(payload-free), and cross-checks with a 50-vs-25-step two-point fit in
the same session.

Run alone on the chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def med_ms(f, n=7):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append((time.time() - t0) * 1e3)
    ts.sort()
    return round(ts[n // 2], 1)


def main():
    from bench import build_pipeline

    pipe = build_pipeline()
    ccfg = pipe._ccfg
    te_model = pipe.text_encoder.model if hasattr(pipe.text_encoder, "model") else pipe.text_encoder
    vae_model = pipe.vae.model if hasattr(pipe.vae, "model") else pipe.vae
    te_apply = te_model.apply_fn(ccfg)
    vae_apply = vae_model.apply_fn(ccfg)
    te_p = pipe.text_encoder.params
    vae_p = pipe.vae.params
    ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 49408, jnp.int32)
    lat = jax.random.normal(jax.random.key(2), (1, 64, 64, 4), jnp.float32).astype(jnp.bfloat16)

    from sfast_tpu.utils.image import denormalize_to_uint8

    res = {}

    # RTT floor
    one = jnp.ones((8,), jnp.float32)
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(one))
    res["rtt_ms"] = med_ms(lambda: np.asarray(tiny(one)), 9)

    # TE once (sum-forced, no payload)
    te_sum = jax.jit(
        lambda p, i: te_apply(p, i)["last_hidden_state"].astype(jnp.float32).sum()
    )
    np.asarray(te_sum(te_p, ids))
    res["te_ms"] = med_ms(lambda: np.asarray(te_sum(te_p, ids)))

    # VAE decode + uint8 (sum-forced)
    vae_sum = jax.jit(
        lambda p, l: denormalize_to_uint8(vae_apply(p, l / 0.18215))
        .astype(jnp.int32).sum()
    )
    np.asarray(vae_sum(vae_p, lat))
    res["vae_uint8_ms"] = med_ms(lambda: np.asarray(vae_sum(vae_p, lat)))

    # latent init (random normal at latent shape)
    lat_init = jax.jit(
        lambda s: jax.random.normal(jax.random.key(s[0]), (1, 64, 64, 4), jnp.float32).astype(jnp.float32).sum()
    )
    seed = np.asarray([3], np.uint32)
    np.asarray(lat_init(seed))
    res["lat_init_ms"] = med_ms(lambda: np.asarray(lat_init(seed)))

    # full fused call two-point fit, fetch-forced
    kw = dict(prompt_ids=ids, height=512, width=512, guidance_scale=7.5)
    pipe(seed=0, num_inference_steps=50, **kw)
    pipe(seed=0, num_inference_steps=25, **kw)
    e50 = med_ms(lambda: np.asarray(pipe(seed=1, num_inference_steps=50, **kw).images), 5)
    e25 = med_ms(lambda: np.asarray(pipe(seed=1, num_inference_steps=25, **kw).images), 5)
    res["e2e50_ms"] = e50
    res["e2e25_ms"] = e25
    step = (e50 - e25) / 25.0
    res["step_ms"] = round(step, 2)
    res["unet_its_per_s"] = round(1e3 / step, 2)
    res["fixed_pool_ms"] = round(e50 - 50 * step, 1)
    res["explained_fixed_ms"] = round(
        res["te_ms"] + res["vae_uint8_ms"] + res["lat_init_ms"]
        - 2 * res["rtt_ms"], 1
    )
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
