#!/usr/bin/env python
"""Sweep XLA code-dedup compiler options against the 255 MB UNet executable.

XLA_FLAGS is parsed by the local (client) XLA, which fatals on TPU-only
flags; per-compile ``compiler_options`` go to the backend compiler
instead, which accepts them.  Timing forces a host fetch (the tunnel's
``block_until_ready`` can return without the result being computed).

Usage: python benchmarks/sweep_dedup_flags.py
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = {
    "baseline": {},
    "dedup_calls": {"xla_tpu_enable_deduplicated_calls": "true"},
    "jf_dedup": {"xla_jf_hlo_deduplication": "true"},
    "both": {
        "xla_tpu_enable_deduplicated_calls": "true",
        "xla_jf_hlo_deduplication": "true",
    },
}


def main():
    from bench import build_pipeline
    from sfast_tpu.runtime.packed_params import maybe_unpack

    pipe = build_pipeline()
    unet_apply = pipe.unet_model.apply_fn(pipe._ccfg)
    p = pipe.unet.params
    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
    tt = jnp.zeros((2,), jnp.float32)
    fn = lambda p, l, t, c: unet_apply(maybe_unpack(p), l, t, c)
    lowered = jax.jit(fn).lower(p, lat2, tt, ctx)

    for label, opts in CONFIGS.items():
        try:
            t0 = time.time()
            exe = lowered.compile(compiler_options=opts or None)
            compile_s = time.time() - t0
            ma = exe.memory_analysis()
            # force full sync via host fetch of a reduction
            fetch = jax.jit(lambda o: o.astype(jnp.float32).sum())
            np.asarray(fetch(exe(p, lat2, tt, ctx)))
            ts = []
            for _ in range(20):
                t0 = time.time()
                np.asarray(fetch(exe(p, lat2, tt, ctx)))
                ts.append((time.time() - t0) * 1e3)
            ts.sort()
            print(json.dumps({label: {
                "code_MB": round(ma.generated_code_size_in_bytes / 1e6, 1),
                "compile_s": round(compile_s, 1),
                "eval_ms_med": round(ts[len(ts) // 2], 2),
                "eval_ms_min": round(ts[0], 2),
            }}), flush=True)
        except Exception as e:
            print(json.dumps({label: {"error": str(e)[:300]}}), flush=True)


if __name__ == "__main__":
    main()
