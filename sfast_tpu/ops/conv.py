"""NHWC convolution (+fused bias/activation).

The reference needs ~1500 lines of cuDNN v7 plumbing and a Triton
implicit-GEMM kernel with a 16-config autotuner to get fused
conv+bias+act (``csrc/operators/cudnn/cudnn_convolution_impl.cc``,
``triton/ops/conv.py``).  On TPU, ``lax.conv_general_dilated`` in NHWC is
lowered straight onto the MXU by XLA, which also fuses the bias add and
activation into the output stage — so this op is a thin, named wrapper
that fixes layout (NHWC/HWIO), accumulation dtype (f32), and the fused
epilogue, giving the pass pipeline a single target like the reference's
``sfast::cudnn_convolution_bias_add_activation``.
"""

import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")

# bf16 conv OUTPUT BUFFERS (the MXU still accumulates f32 internally):
# run the bias/residual epilogue in bf16 instead of f32.  The round-4
# trace pinned every top while-loop fusion to the f32 conv-output
# boundary (add_convert / convert_multiply fusions around this file's
# conv_general_dilated): an f32 buffer doubles the write+read bytes at
# every conv→epilogue→GN edge.  Same-session A/B on v5e (2026-08-19,
# SD1.5 512² 50-step fused e2e): 1052.5 ms (f32 out) → 1036.9 ms
# (−15.6 ms/image; UNet 51.3 → 53.7 it/s) — DEFAULT ON.  Costs one
# extra bf16 rounding before the bias add (~0.4% activation noise, the
# same class as the reference's fp16 conv outputs; full-model parity
# suites stay green).  SFAST_TPU_CONV_BF16_OUT=0 restores f32 buffers.
# Read at TRACE time, like SFAST_TPU_FUSED_L, so setting it after
# import works and tests can monkeypatch it (ADVICE r4, low).
def _bf16_out_enabled() -> bool:
    return os.environ.get("SFAST_TPU_CONV_BF16_OUT", "1") == "1"


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, str, Sequence] = 0,
    dilation: Union[int, Sequence[int]] = 1,
    groups: int = 1,
    act: Optional[str] = None,
    residual: Optional[jax.Array] = None,
) -> jax.Array:
    """``act(conv(x, w) + b + residual)`` — x: (N,H,W,Cin), w: (kh,kw,Cin/g,Cout).

    Covers the reference's 8 fused cuDNN ops
    (conv_bias{,_add}{,_sigmoid,_relu,_tanh} —
    ``csrc/operators/cudnn/cudnn_convolution.cpp:13-38``) with one signature.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]

    acc_dtype = (
        x.dtype
        if (_bf16_out_enabled() and x.dtype == jnp.bfloat16)
        else jnp.float32
    )
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
        preferred_element_type=acc_dtype,
    )
    if b is not None:
        y = y + b.astype(acc_dtype)
    if residual is not None:
        y = y + residual.astype(acc_dtype)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif act == "tanh":
        y = jnp.tanh(y)
    elif act == "silu":
        y = y * jax.nn.sigmoid(y)
    elif act is not None:
        raise ValueError(f"unknown activation: {act}")
    return y.astype(x.dtype)
