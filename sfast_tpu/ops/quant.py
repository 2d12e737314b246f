"""Int8 weight-only linear (W8A16) — the analog of the reference's
CUTLASS dynamic-quant linear (``csrc/operators/cutlass/cutlass_qlinear.cc``
+ ``cutlass_qlinear_dynamic_kernel.cu``: int8 weights upcast against fp16
activations on SM80), which backs ``torch.quantization.quantize_dynamic``
on CUDA (``README.md:267-289`` — ~2 GB VRAM saving on SDXL).

TPU mapping: weights stored int8 with per-output-channel scales (half the
HBM footprint of bf16 — the same memory win); the matmul runs on the MXU
with the int8→bf16 upcast fused into the weight read by XLA.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(in, out) weight → (int8 weight, per-out-channel f32 scale)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_linear(
    x: jax.Array,
    wq: jax.Array,
    scale: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    act: Optional[str] = None,
) -> jax.Array:
    """``act((x @ dequant(wq)) + b)`` with f32 accumulation."""
    w = wq.astype(x.dtype)
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * scale  # (..., out) * (1, out)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise ValueError(f"unknown activation: {act}")
    return y.astype(x.dtype)
