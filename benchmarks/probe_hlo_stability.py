#!/usr/bin/env python
"""Is the fused SD1.5 pipeline's lowered HLO bit-stable across processes?

Four distinct persistent-cache keys were observed for the SAME source
tree in one session (2026-08-19) — i.e. every new process cold-compiles
the ~137 s fused program even with a warm cache.  The cache key hashes
the serialized StableHLO, so if this probe's digest differs across
processes, the program itself is nondeterministic (usual culprit:
iteration over a ``set``/``dict`` whose order depends on the
per-process PYTHONHASHSEED somewhere in the model build or trace path).

Prints one line: sha256 of the lowered StableHLO with all location
metadata stripped, plus one of the raw text.  Run it twice and diff.

Usage: python benchmarks/probe_hlo_stability.py [--steps 50]
"""

import argparse
import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dump", help="write raw StableHLO here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_pipeline

    pipe = build_pipeline()
    fp = pipe._build_fused_pipeline(args.steps, True)

    prompt_ids = jax.random.randint(
        jax.random.key(1), (1, 77), 0, 49408, dtype=jnp.int32
    )
    state = pipe._scheduler_state(args.steps)
    gs = pipe._dev_scalar(7.5)
    unet_params = pipe.unet.params
    full_args = (
        unet_params, pipe.text_encoder.params, pipe.vae.params,
        prompt_ids, prompt_ids, state, gs,
        np.asarray([0], np.uint32),
        None, None, None, None, None,
    )
    text = fp.lowered_text(*full_args, lat_shape=(1, 64, 64, 4))
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
    # two digests: raw (what the cache key effectively sees modulo
    # serialization format) and location-stripped (isolates whether a
    # mismatch is real ops vs just file:line metadata)
    raw = hashlib.sha256(text.encode()).hexdigest()[:16]
    stripped = re.sub(r'loc\(.*?\)|#loc\d*( = .*)?', "", text)
    nol = hashlib.sha256(stripped.encode()).hexdigest()[:16]
    print(f"raw={raw} noloc={nol} bytes={len(text)}")


if __name__ == "__main__":
    main()
