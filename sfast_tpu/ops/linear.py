"""Linear / GEMM ops with precision control.

Counterpart of the reference's cuBLAS(Lt) "lowp" GEMM family
(``csrc/operators/cublas/cublas_gemm.cpp:951-981``: cublas_lowp_linear,
linear_relu, linear_gelu, linear_add ...).  On TPU there is no epilogue
API to target: XLA fuses bias/activation/residual adds into the matmul's
output stage natively, so these are thin named compositions.  The "lowp"
knob maps to MXU-native bf16 inputs with f32 accumulation
(``preferred_element_type``) — faster than the reference's fp16-accumulate
trick *without* its documented quality risk
(``diffusion_pipeline_compiler.py:44-48``).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def linear(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    act: Optional[str] = None,
) -> jax.Array:
    """``act(x @ w + b)`` where ``w`` is (in_features, out_features).

    Accumulates in f32 on the MXU regardless of input dtype.
    """
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    elif act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise ValueError(f"unknown activation: {act}")
    return y.astype(x.dtype)


def linear_relu(x, w, b=None):
    """≙ sfast::linear_relu (reference csrc/operators/fused_linear.cpp:27-63)."""
    return linear(x, w, b, act="relu")


def linear_gelu(x, w, b=None):
    """≙ sfast::linear_gelu (reference csrc/operators/fused_linear.cpp:27-63)."""
    return linear(x, w, b, act="gelu")


def linear_add(x, w, b, residual):
    """≙ sfast::cublas_lowp_linear_add (reference jit/passes/__init__.py:157-198)."""
    return (linear(x, w, b).astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        x.dtype
    )
