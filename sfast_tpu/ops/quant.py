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


def quantize_conv_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """HWIO conv weight → (int8 weight, per-out-channel f32 scale)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale.reshape(1, 1, 1, -1).astype(jnp.float32)


def dynamic_quant_per_tensor(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """bf16/f32 activations → (int8, scalar f32 scale), computed on the
    fly (the 'dynamic' in dynamic quantization)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def conv2d_w8a8(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    act: Optional[str] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-int8 conv (W8A8): dynamic per-tensor activation quant +
    per-channel weight scales; int8×int8→int32 on the MXU (2× the bf16
    rate on v5e — the compute-side extension of the reference's
    memory-only W8A16, cutlass_qlinear_dynamic_kernel.cu).  Experimental:
    per-tensor activation scaling; validate quality per-model."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    xq, x_scale = dynamic_quant_per_tensor(x)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act is not None:
        raise ValueError(act)
    return y.astype(x.dtype)


def linear_w8a8(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    act: Optional[str] = None,
) -> jax.Array:
    """Full-int8 linear (W8A8): dynamic per-tensor activation quant,
    int8×int8→int32 MXU matmul, f32 dequant with per-out-channel weight
    scales.  The compute-side extension of the reference's memory-only
    W8A16 cutlass path (its fp16-accum lowp GEMM is the analogous
    speed/quality trade)."""
    xq, x_scale = dynamic_quant_per_tensor(x)
    y = jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (x_scale * w_scale)
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


def _quant_static(x: jax.Array, a_scale) -> jax.Array:
    """bf16/f32 → int8 with a CONSTANT scale — a plain elementwise op
    XLA fuses into the producer's epilogue (no max pass, no scalar
    dependency; the whole point of calibrated W8A8 vs the dynamic
    variant, which measured 1.3–2.5× slower e2e than bf16)."""
    xq = jnp.round(x.astype(jnp.float32) * (1.0 / a_scale))
    return jnp.clip(xq, -127, 127).astype(jnp.int8)


def conv2d_w8a8_static(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    a_scale,
    b: Optional[jax.Array] = None,
    *,
    stride=1,
    padding=0,
    act: Optional[str] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """W8A8 conv with a calibrated static activation scale."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        _quant_static(x, a_scale),
        wq,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (a_scale * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act is not None:
        raise ValueError(act)
    return y.astype(x.dtype)


def linear_w8a8_static(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    a_scale,
    b: Optional[jax.Array] = None,
    *,
    act: Optional[str] = None,
) -> jax.Array:
    """W8A8 linear with a calibrated static activation scale."""
    y = jax.lax.dot_general(
        _quant_static(x, a_scale),
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (a_scale * w_scale)
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
