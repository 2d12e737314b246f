#!/usr/bin/env python
"""Aggregate device-op time from a jax.profiler Chrome trace.

Groups TPU-lane events by a coarse op family (fusion, conv, dot,
pallas-kernel name, copy/transpose, ...) so the e2e time can be
attributed: ``python benchmarks/analyze_trace.py /tmp/jaxtrace [-n 40]``.

The per-op-name table is the TPU analog of the reference's pretty
cProfile reports (``profile/pretty_profile.py``) at device-op
granularity.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"], paths[-1]


def device_pids(events):
    """pids whose process name looks like a TPU device (not python host)."""
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    return {
        p
        for p, name in pids.items()
        if re.search(r"TPU|/device|XLA", name, re.I)
        and not re.search(r"python|host", name, re.I)
    }, pids


_FAMILY_RULES = [
    (r"fused_conv|conv3x3", "pallas:conv3x3"),
    (r"flash", "pallas:flash_attn"),
    (r"group_norm|groupnorm", "pallas:group_norm"),
    (r"geglu", "pallas:geglu"),
    (r"^conv(olution)?[\._]|%conv|conv_general", "xla:conv"),
    (r"dot|matmul|gemm", "xla:dot"),
    (r"dynamic-update-slice|dynamic-slice|slice", "xla:slice"),
    (r"copy|transpose|bitcast", "xla:copy/transpose"),
    (r"reduce", "xla:reduce"),
    (r"fusion", "xla:fusion(other)"),
    (r"infeed|outfeed|send|recv", "io"),
]


def family(name):
    low = name.lower()
    for pat, fam in _FAMILY_RULES:
        if re.search(pat, low):
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("-n", type=int, default=40, help="top-N op names")
    ap.add_argument("--min-us", type=float, default=0.0)
    args = ap.parse_args()

    events, path = load_events(args.trace_dir)
    dev_pids, all_pids = device_pids(events)
    print(f"# {path}")
    print(f"# device pids: { {p: all_pids[p] for p in dev_pids} }")

    by_name = collections.Counter()
    count = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0)  # µs
        name = e.get("name", "?")
        by_name[name] += dur
        count[name] += 1
        total += dur

    by_family = collections.Counter()
    for name, dur in by_name.items():
        by_family[family(name)] += dur

    print(f"\ntotal device time: {total/1e3:.2f} ms")
    print("\n== by family ==")
    for fam, dur in by_family.most_common():
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {fam}")
    print(f"\n== top {args.n} ops ==")
    for name, dur in by_name.most_common(args.n):
        if dur < args.min_us:
            break
        print(
            f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  x{count[name]:<5d} {name[:110]}"
        )


if __name__ == "__main__":
    main()
