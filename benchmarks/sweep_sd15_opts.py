#!/usr/bin/env python
"""Backend compiler-option sweep on the SCORED SD1.5 fused 50-step loop.

VERDICT r3 next-step #2 asked for the flag sweep on SDXL's diagnosed
pools (GN f32-upcast convert_reduce, layout churn); the same pools exist
in the SD1.5 UNet at 512², and the SD1.5 fused pipeline is the scored
headline — so sweep it too.  Each config runs in its own subprocess
(compiler options are cached per-process in
``runtime/tracing.tpu_compiler_options``) and times ONLY the 50-step
fused e2e (median of --reps), skipping bench.py's 25-step fit to keep
each config ~2.5 min.

Usage: python benchmarks/sweep_sd15_opts.py [--reps 5] [config ...]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "baseline": "",
    "no_excess_precision": "xla_allow_excess_precision=false",
    "conv_downcast_fusion": (
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"
    ),
    "no_excess+downcast": (
        "xla_allow_excess_precision=false,"
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"
    ),
    "autotune_layouts": "xla_tpu_autotune_layouts=true",
}

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
import jax
import numpy as np
from bench import build_pipeline

pipe = build_pipeline()
prompt_ids = jax.random.randint(jax.random.key(1), (1, 77), 0, 49408, dtype=jax.numpy.int32)
kw = dict(prompt_ids=prompt_ids, height=512, width=512,
          num_inference_steps=50, guidance_scale=7.5)
t0 = time.time()
pipe(seed=0, **kw)
compile_s = time.time() - t0
times = []
for i in range(%(reps)d):
    t0 = time.time()
    out = pipe(seed=i, **kw)
    assert out.images.shape == (1, 512, 512, 3)
    times.append((time.time() - t0) * 1e3)
med = sorted(times)[len(times) // 2]
print(json.dumps({"e2e_ms": round(med, 1), "compile_s": round(compile_s, 1),
                  "all_ms": [round(t, 1) for t in times]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("configs", nargs="*", default=list(CONFIGS))
    args = ap.parse_args()

    results = {}
    for name in args.configs:
        opts = CONFIGS[name]
        env = dict(os.environ, SFAST_TPU_XLA_OPTS=opts)
        # non-default options must not pollute (or hit) the shared
        # persistent caches keyed without them
        if opts:
            env["SFAST_TPU_CACHE_DIR"] = os.path.join(
                "/tmp", "sfast_sweep_cache", name
            )
        r = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO, "reps": args.reps}],
            capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
        )
        row = None
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                row = json.loads(line)
                break
            except (ValueError, json.JSONDecodeError):
                continue
        if row is None:
            print(f"{name}: FAILED\n{r.stderr[-800:]}", flush=True)
            results[name] = {"error": True}
            continue
        results[name] = row
        print(f"{name}: {row['e2e_ms']} ms  (compile {row['compile_s']}s, "
              f"runs {row['all_ms']})", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
