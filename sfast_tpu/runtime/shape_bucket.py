"""Batch-dimension shape bucketing.

CUDA-graph capture is near-instant per new shape, so the reference can
afford one graph per exact shape signature (``cuda/graphs.py:225-241``).
XLA compiles in seconds, so unbounded shape diversity is expensive:
bucketing bounds the number of distinct executables.

Only *semantically paddable* dimensions are bucketed:

- leading **batch** dims: padded entries are dropped from the output
  (dummy batch rows can't affect real rows in any per-sample model);
- token **sequence** dims are NOT padded here — text encoders already run
  at fixed max length (77) with attention masks;
- spatial conv dims are NEVER padded — zero-padding H/W changes conv
  outputs at the borders, so those remain exact-shape keyed, same as the
  reference.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


DEFAULT_BATCH_BUCKETS: Tuple[int, ...] = (1, 2, 4, 8, 16, 32)


def bucket_size(n: int, buckets: Optional[Sequence[int]] = None) -> int:
    """Smallest bucket >= n; values beyond the largest bucket round up to
    the next multiple of the largest bucket."""
    buckets = tuple(sorted(buckets or DEFAULT_BATCH_BUCKETS))
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return ((n + top - 1) // top) * top


def pad_batch(x, buckets: Optional[Sequence[int]] = None):
    """Pad the leading dim of ``x`` up to its bucket.

    Returns ``(padded, real_n)``; use :func:`unpad_batch` on results.
    """
    n = x.shape[0]
    b = bucket_size(n, buckets)
    if b == n:
        return x, n
    pad_widths = [(0, b - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_widths), n


def unpad_batch(x, real_n: int):
    if x.shape[0] == real_n:
        return x
    return x[:real_n]
