"""Array layout helpers (≙ reference ``utils/memory_format.py``).

The reference spends real machinery converting torch modules to
channels_last because NCHW is torch's default; on TPU, NHWC *is* the
native layout and all sfast_tpu models use it already — these helpers
exist for interop at the API boundary (user-supplied NCHW tensors,
exporting back to torch)."""

import jax.numpy as jnp


def nchw_to_nhwc(x) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


def suggest_memory_format(x) -> str:
    """For 4-D arrays: sfast_tpu always suggests NHWC on TPU."""
    return "NHWC" if getattr(x, "ndim", 0) == 4 else "none"
