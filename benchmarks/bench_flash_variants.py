"""A/B flash-attention kernel structures at the SD1.5 hot shape.

The round-4 trace pins 231.7 ms/image (22% of device time) on five
flash-attention calls at bf16[2,8,4096,40] (the 64²-resolution
self-attention blocks), 0.93 ms each vs a ~0.65-0.70 ms practical
ceiling (both matmuls MXU-capped at ~50% by the 64-padded head dim).
The residual is MXU/VPU serialization: each kv grid step runs
matmul → softmax → matmul with nothing to overlap.

Variants measured here (all numerics-identical, asserted on device):
  base          — round-4 kernel as shipped
  dimsem        — bh/q grid axes marked "parallel" for Mosaic
  2kv@2048      — kv block 2048 split into 2 staged sub-blocks per
                  program (independent MXU work for the scheduler)
  2kv@1024      — kv block 1024, 2 sub-blocks of 512
  4kv@2048      — kv block 2048, 4 sub-blocks of 512
  infuse        — allow_input_fusion on q/k/v (prescale/pad fused in)

Timing: K serial kernel applications inside ONE jitted scan (output
feeds the next q), so the tunnel RTT amortizes to ~0; per-call time is
total/K.  Run on the real chip:  python benchmarks/bench_flash_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.ops.flash_attention import flash_attention

# (B, H, S, D) — default: SD1.5 64² self-attention, CFG batch.  Override
# with FLASH_SHAPE="50,5,9216,64" (SVD 576x1024 spatial attention: 25
# frames x CFG ride in batch) and FLASH_ITERS for slow shapes.
SHAPE = tuple(
    int(x) for x in os.environ.get("FLASH_SHAPE", "2,8,4096,40").split(",")
)
ITERS = int(os.environ.get("FLASH_ITERS", "100"))
REPS = 5

SK = SHAPE[2]
VARIANTS = {
    # "base" now resolves through the block_k=None auto rule (whole-kv
    # ×2 staged at sk=4096); "old-default" pins the pre-auto (1024,1024)
    # blocks so the staged-kv win stays auditable against the actual
    # round-4 shipped configuration.
    "base": dict(dimsem=False),
    "old-default(1024,1024)": dict(dimsem=False, block_k=1024),
} if SK == 4096 else {
    # non-4096 kv (e.g. SVD 9216): the auto rule falls back to
    # (1024,1024).  First sweep (2026-08-19) tried whole/half-kv blocks
    # and OOM'd scoped VMEM: the f32 score block is
    # (block_q, block_k/kv_stages)·4B and must stay ≲ 10 MB under the
    # 16 MB scoped limit (1024×4608×4 = 18.9 MB failed).  This set keeps
    # every sub-block ≤ 9.5 MB and every block_k an exact divisor of
    # 9216 (=1024·9) so no kv padding/mask cost is added.
    "base(1024,1024)": dict(dimsem=False),
    "bk2304": dict(dimsem=False, block_k=2304),
    "bk2304x2": dict(dimsem=False, block_k=2304, kv_stages=2),
    "bk4608x2": dict(dimsem=False, block_k=4608, kv_stages=2),
    "full-x4": dict(dimsem=False, block_k=SK, kv_stages=4),
    "full-x8": dict(dimsem=False, block_k=SK, kv_stages=8),
    "bq2304-bk1024": dict(dimsem=False, block_q=2304, block_k=1024),
    "bq512-bk4608x2": dict(
        dimsem=False, block_q=512, block_k=4608, kv_stages=2
    ),
}
if SK == 4096:
 VARIANTS.update({
    "2kv@4096": dict(dimsem=False, block_k=4096, kv_stages=2),
    "4kv@4096": dict(dimsem=False, block_k=4096, kv_stages=4),
    # q-block restructure: fewer, bigger programs — whole-q gives the
    # scheduler one long staged loop to software-pipeline (16 programs
    # total), bq2048 halves grid steps.  f32 score sub-block kept ≤8 MB.
    "fullq-x8": dict(dimsem=False, block_q=4096, block_k=4096, kv_stages=8),
    "fullq-x16": dict(dimsem=False, block_q=4096, block_k=4096, kv_stages=16),
    "bq2048-x4": dict(dimsem=False, block_q=2048, block_k=4096, kv_stages=4),
    "bq2048-x8": dict(dimsem=False, block_q=2048, block_k=4096, kv_stages=8),
    "bq512-x2": dict(dimsem=False, block_q=512, block_k=4096, kv_stages=2),
    "2kv@4096+fusedl": dict(
        dimsem=False, block_k=4096, kv_stages=2, _env={"SFAST_TPU_FUSED_L": "1"}
    ),
    # mode 2: ones column planted in-kernel (VMEM), no HBM V write —
    # built so the fused-denominator win can transfer to e2e
    "2kv@4096+fusedl2": dict(
        dimsem=False, block_k=4096, kv_stages=2, _env={"SFAST_TPU_FUSED_L": "2"}
    ),
    "4kv@4096+fusedl2": dict(
        dimsem=False, block_k=4096, kv_stages=4, _env={"SFAST_TPU_FUSED_L": "2"}
    ),
 })


def build(variant_kwargs, iters):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = flash_attention(
                c, k, v, softmax_dtype=jnp.bfloat16, **variant_kwargs
            )
            return o, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    return run


def main():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, SHAPE, jnp.bfloat16)
    k = jax.random.normal(k2, SHAPE, jnp.bfloat16)
    v = jax.random.normal(k3, SHAPE, jnp.bfloat16)

    ref_out = None
    results = {}
    for name, kwargs in VARIANTS.items():
        kwargs = dict(kwargs)
        env = kwargs.pop("_env", {})
        for ek, ev in env.items():
            os.environ[ek] = ev
        # two-point chains (K and 2K serial calls in one executable):
        # the difference cancels the per-dispatch tunnel RTT (~29 ms,
        # i.e. ~1.45 ms/call at K=20 — larger than the effect measured)
        fn1 = build(kwargs, ITERS)
        fn2 = build(kwargs, 2 * ITERS)
        try:
            out = np.asarray(fn1(q, k, v))  # compile + correctness capture
            jax.block_until_ready(fn2(q, k, v))
        except Exception as e:
            print(f"{name:>20}: FAILED ({type(e).__name__}: {e})")
            for ek in env:
                os.environ.pop(ek, None)
            continue
        if ref_out is None:
            ref_out = out
        else:
            np.testing.assert_allclose(
                out.astype(np.float32),
                ref_out.astype(np.float32),
                rtol=3e-2,
                atol=3e-2,
            )
        times = []
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(fn1(q, k, v))
            t1 = time.time()
            jax.block_until_ready(fn2(q, k, v))
            t2 = time.time()
            times.append(((t2 - t1) - (t1 - t0)) / ITERS * 1e3)
        med = sorted(times)[len(times) // 2]
        results[name] = med
        print(f"{name:>20}: {med:.3f} ms/call  (all: "
              f"{[round(t, 3) for t in times]})")
        for ek in env:
            os.environ.pop(ek, None)

    if results:
        best = min(results, key=results.get)
        print(f"\nbest: {best} at {results[best]:.3f} ms/call "
              f"(base {results.get('base', float('nan')):.3f})")


if __name__ == "__main__":
    main()
