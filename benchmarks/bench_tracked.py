#!/usr/bin/env python
"""Measure EVERY tracked config (BASELINE.md) in one session.

VERDICT r3 next-step #4: "one bench_tracked.py emitting JSON rows for
ControlNet it/s, LCM 4-step e2e, SVD-XT one real 25-frame clip, SDXL
it/s" (+ the SD1.5 headline via bench.py).  Each config runs in its own
subprocess so HBM is released between models and a failure in one config
cannot poison the rest.  Rows are written to ``benchmarks/tracked.json``
and printed as a markdown table against the reference numbers.

Run alone on the chip:  python benchmarks/bench_tracked.py
Subset:                 python benchmarks/bench_tracked.py sdxl controlnet
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference numbers: BASELINE.md (A100 rows for it/s; comparison table
# for e2e).  "ratio" is ours/reference for rates, reference/ours for
# latencies — >1 means we beat the reference either way.
CONFIGS = {
    "sd15": {
        "cmd": [sys.executable, os.path.join(REPO, "bench.py")],
        "ref": ("e2e_ms", 995.0),
    },
    "lcm": {
        "cmd": [sys.executable, os.path.join(REPO, "benchmarks", "bench_extra_configs.py"), "lcm"],
        "ref": None,  # the reference never published an LCM number
    },
    "sdxl": {
        "cmd": [sys.executable, os.path.join(REPO, "benchmarks", "bench_extra_configs.py"), "sdxl"],
        "ref": ("its_per_s", 11.9),
    },
    "controlnet": {
        "cmd": [sys.executable, os.path.join(REPO, "benchmarks", "bench_extra_configs.py"), "controlnet"],
        "ref": ("its_per_s", 41.1),
    },
    "svd": {
        "cmd": [sys.executable, os.path.join(REPO, "benchmarks", "bench_svd_xt_fullsize.py")],
        "env": {"SVD_TRACKED": "1", "SVD_STEPS": "25"},
        "ref": ("e2e_s", 47.0),
    },
    "map": {
        # sustained serving throughput (no reference analog: the
        # reference serves sequentially) — VERDICT r4 next-step #8
        "cmd": [sys.executable, os.path.join(REPO, "benchmarks", "bench_extra_configs.py"), "map"],
        "ref": None,
    },
}


def run_config(name, spec, timeout=3600):
    env = dict(os.environ)
    env.update(spec.get("env", {}))
    t0 = time.time()
    r = subprocess.run(
        spec["cmd"], capture_output=True, text=True, timeout=timeout,
        env=env, cwd=REPO,
    )
    wall = time.time() - t0
    row = None
    for line in (r.stdout or "").strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if "metric" in d:
                    row = d
            except json.JSONDecodeError:
                pass
    if row is None:
        return {
            "config": name, "error": (r.stderr or r.stdout or "")[-400:],
            "wall_s": round(wall, 1),
        }
    row["config"] = name
    row["wall_s"] = round(wall, 1)
    ref = spec.get("ref")
    if ref is not None:
        kind, ref_val = ref
        row["reference"] = ref_val
        if kind == "its_per_s" and "its_per_s" in row:
            row["ratio_vs_ref"] = round(row["its_per_s"] / ref_val, 3)
        elif kind == "e2e_ms":
            row["ratio_vs_ref"] = round(ref_val / row["value"], 3)
        elif kind == "e2e_s":
            row["ratio_vs_ref"] = round(ref_val / row["value"], 3)
    return row


def main():
    names = sys.argv[1:] or list(CONFIGS)
    rows = []
    for name in names:
        print(f"== {name} ==", file=sys.stderr, flush=True)
        row = run_config(name, CONFIGS[name])
        rows.append(row)
        print(json.dumps(row), flush=True)
    out_path = os.path.join(REPO, "benchmarks", "tracked.json")
    stamped = {"rows": rows}
    with open(out_path, "w") as f:
        json.dump(stamped, f, indent=1)
    # markdown table for STATUS.md
    print("\n| config | metric | value | reference | ratio |", file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        if "error" in r:
            print(f"| {r['config']} | ERROR | — | — | — |", file=sys.stderr)
            continue
        rate = r.get("its_per_s")
        val = f"{r['value']} {r['unit']}" + (f" ({rate} it/s)" if rate else "")
        print(
            f"| {r['config']} | {r['metric']} | {val} | "
            f"{r.get('reference', '—')} | {r.get('ratio_vs_ref', '—')} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
