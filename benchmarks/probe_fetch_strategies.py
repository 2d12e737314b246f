#!/usr/bin/env python
"""D2H fetch strategies for the final uint8 image over the tunnel.

The fixed-cost dissection puts ~200 ms of the SD1.5 e2e in fetching the
768 KB image (RPC overhead dominates: the payload itself is ~35 ms at
~22 MB/s).  This probe measures, on a ready device array:

  single      — np.asarray(out)                      (the current path)
  device_get  — jax.device_get(out)
  async_then  — copy_to_host_async(); np.asarray()
  sliceK      — K device row-slices fetched from K threads (parallel RPC)
  outK        — K separate output arrays (pre-split on device) from K threads

If parallel streams pipeline in the tunnel, the pipeline should return
the image in K slices and fetch them concurrently.
"""

import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def med(f, n=7):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append((time.time() - t0) * 1e3)
    ts.sort()
    return round(ts[n // 2], 1)


def main():
    # a fresh (1, 512, 512, 3) uint8 device array per iteration — computed
    # by a trivial jit so each fetch is a true D2H (host copies cache)
    key = [0]

    @jax.jit
    def make(i):
        return (
            jax.random.randint(jax.random.key(i), (1, 512, 512, 3), 0, 255)
            .astype(jnp.uint8)
        )

    def fresh():
        key[0] += 1
        out = make(key[0])
        out.block_until_ready()
        return out

    fresh()  # compile
    out = fresh()

    res = {}
    res["single_ms"] = med(lambda: np.asarray(fresh()))
    res["device_get_ms"] = med(lambda: jax.device_get(fresh()))

    def async_then():
        o = fresh()
        o.copy_to_host_async()
        np.asarray(o)

    res["async_then_ms"] = med(async_then)

    for k in (2, 4, 8):
        rows = 512 // k

        def slicek(k=k, rows=rows):
            o = fresh()
            parts = [o[:, i * rows:(i + 1) * rows] for i in range(k)]
            for p in parts:
                try:
                    p.copy_to_host_async()
                except Exception:
                    pass
            with cf.ThreadPoolExecutor(k) as ex:
                list(ex.map(np.asarray, parts))

        res[f"slice{k}_ms"] = med(slicek)

    # pre-split on device (what a multi-output executable would return)
    @jax.jit
    def make4(i):
        o = (
            jax.random.randint(jax.random.key(i), (1, 512, 512, 3), 0, 255)
            .astype(jnp.uint8)
        )
        return tuple(o[:, j * 128:(j + 1) * 128] for j in range(4))

    def out4():
        key[0] += 1
        parts = make4(key[0])
        jax.block_until_ready(parts)
        for p in parts:
            try:
                p.copy_to_host_async()
            except Exception:
                pass
        with cf.ThreadPoolExecutor(4) as ex:
            list(ex.map(np.asarray, parts))

    jax.block_until_ready(make4(0))
    res["out4_ms"] = med(out4)

    # the compute is ~free; subtract the dispatch+sync baseline
    res["dispatch_baseline_ms"] = med(lambda: fresh())
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
