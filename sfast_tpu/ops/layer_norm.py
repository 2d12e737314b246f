"""LayerNorm (last-dim) with f32 accumulation.

Counterpart of the reference's Triton LayerNorm
(``triton/ops/layer_norm.py:51-168``).  On TPU a last-dim layernorm is a
lane-dimension reduction XLA fuses into one pass, so the default is the
jnp formulation; it exists as a named op so transformer blocks share one
numerically-consistent implementation (and so a Pallas variant can be
swapped in behind the same signature if profiling ever justifies it).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    gamma: Optional[jax.Array] = None,
    beta: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    xf = x.astype(jnp.float32)
    # one-pass sum/sumsq (matches the GroupNorm formulation): the
    # two-pass mean-then-centered-variance needs x twice inside the
    # fusion; E[x²]−E[x]² shares one read.  f32 accumulation over a
    # ≤2560-wide lane axis keeps cancellation error ~1e-6 relative —
    # inside the bf16 activations' own quantization noise.
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = ms - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)
