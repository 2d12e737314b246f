"""Matmul precision contexts (≙ reference ``utils/compute_precision.py:5-34``
TF32 toggles).  On TPU the equivalent axis is the MXU pass count:
'default' (1-pass bf16), 'high' (3-pass), 'highest' (6-pass ≈ f32)."""

import contextlib

import jax


@contextlib.contextmanager
def low_compute_precision():
    """Fastest matmuls (single-pass bf16 on the MXU) — the analog of the
    reference's allow-TF32/fp16-reduction mode."""
    with jax.default_matmul_precision("default"):
        yield


@contextlib.contextmanager
def high_compute_precision():
    """f32-equivalent matmuls (6-pass) for numerics debugging."""
    with jax.default_matmul_precision("highest"):
        yield
