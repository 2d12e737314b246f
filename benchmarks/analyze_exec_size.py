#!/usr/bin/env python
"""Why is the fused SD1.5 executable ~400 MB? (VERDICT r3 next-step #1)

Builds the same fused 50-step pipeline as bench.py, compiles it, then
itemizes where the bytes are:

- ``memory_analysis()``: generated code vs argument vs temp vs constant
  allocation sizes as XLA accounts them;
- serialized payload size (``jax.experimental.serialize_executable``) and
  its zlib-compressible fraction (code compresses ~4x, constant tables
  usually compress far better);
- optimized-HLO constant census: every ``constant`` instruction's shape,
  grouped and ranked, from the post-optimization HLO module (text dump
  without large constant *values*, so the dump stays small);
- Mosaic custom-call census: count + embedded payload bytes of
  ``tpu_custom_call`` backend configs (each distinct flash-attention /
  conv kernel shape embeds its own compiled Mosaic binary).

Usage: python benchmarks/analyze_exec_size.py [--steps 50]
"""

import argparse
import collections
import json
import re
import sys
import time
import zlib
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def dtype_bytes(dt: str) -> int:
    return {
        "f32": 4, "f16": 2, "bf16": 2, "f64": 8, "s32": 4, "u32": 4,
        "s8": 1, "u8": 1, "s64": 8, "u64": 8, "pred": 1, "s16": 2, "u16": 2,
    }.get(dt, 4)


def shape_size(shape_str: str) -> int:
    """'f32[2,77,768]' -> bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * dtype_bytes(dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from bench import build_pipeline

    t0 = time.time()
    pipe = build_pipeline()
    prompt_ids = jax.random.randint(
        jax.random.key(1), (1, 77), 0, 49408, dtype=jnp.int32
    )
    # compile only (warmup path) — no execution needed for size analysis
    pipe(
        prompt_ids=prompt_ids, height=512, width=512,
        num_inference_steps=args.steps, seed=0, _warmup_only=True,
    )
    print(f"build+compile: {time.time()-t0:.1f}s", file=sys.stderr)

    fp = None
    for k, v in pipe._fused_loops.items():
        if isinstance(k, tuple) and k[0] == "full":
            fp = v
    assert fp is not None, "fused full-pipeline executable not found"
    (exe,) = fp._cache.values()

    out = {}
    try:
        ma = exe.memory_analysis()
        out["memory_analysis"] = {
            "generated_code_MB": round(ma.generated_code_size_in_bytes / 1e6, 1),
            "argument_MB": round(ma.argument_size_in_bytes / 1e6, 1),
            "output_MB": round(ma.output_size_in_bytes / 1e6, 1),
            "temp_MB": round(ma.temp_size_in_bytes / 1e6, 1),
            "alias_MB": round(ma.alias_size_in_bytes / 1e6, 1),
        }
    except Exception as e:
        out["memory_analysis"] = f"unavailable: {e}"

    t0 = time.time()
    try:
        from jax.experimental.serialize_executable import serialize

        payload, _, _ = serialize(exe)
        out["serialized_MB"] = round(len(payload) / 1e6, 1)
        z = zlib.compress(payload, 1)
        out["serialized_zlib1_MB"] = round(len(z) / 1e6, 1)
        out["serialize_s"] = round(time.time() - t0, 1)
    except Exception as e:
        out["serialized_MB"] = f"failed: {e}"

    # ---- optimized HLO census --------------------------------------
    try:
        mods = exe._executable.xla_executable.hlo_modules()
        txt = mods[0].to_string()
        out["hlo_text_MB"] = round(len(txt) / 1e6, 1)

        const_sizes = collections.Counter()
        const_counts = collections.Counter()
        n_insts = 0
        mosaic_payload = 0
        mosaic_calls = 0
        custom_calls = collections.Counter()
        fusion_count = 0
        for line in txt.splitlines():
            ls = line.strip()
            if "= " not in ls:
                continue
            n_insts += 1
            m = re.match(r"\S+ = (\S+?\[[\d,]*\][^ ]*) ([\w-]+)", ls)
            if not m:
                continue
            shape, op = m.groups()
            if op == "constant":
                sz = shape_size(shape)
                const_sizes[shape.split("{")[0]] += sz
                const_counts[shape.split("{")[0]] += 1
            elif op == "fusion":
                fusion_count += 1
            elif op == "custom-call":
                cc = re.search(r'custom_call_target="([^"]+)"', ls)
                tgt = cc.group(1) if cc else "?"
                custom_calls[tgt] += 1
                if "tpu_custom_call" in tgt or "Mosaic" in tgt:
                    mosaic_calls += 1
                    bc = re.search(r'backend_config="((?:[^"\\]|\\.)*)"', ls)
                    if bc:
                        mosaic_payload += len(bc.group(1))

        out["hlo"] = {
            "instructions": n_insts,
            "fusions": fusion_count,
            "custom_calls": dict(custom_calls.most_common(10)),
            "mosaic_payload_MB": round(mosaic_payload / 1e6, 1),
            "const_total_MB": round(sum(const_sizes.values()) / 1e6, 1),
            "const_top20": [
                {"shape": s, "count": const_counts[s],
                 "total_MB": round(b / 1e6, 2)}
                for s, b in const_sizes.most_common(20)
            ],
        }
    except Exception as e:
        out["hlo"] = f"unavailable: {e}"

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
