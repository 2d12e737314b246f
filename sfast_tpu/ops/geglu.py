"""Fused linear+GEGLU — Pallas dual-matmul kernel.

Counterpart of the reference's CUTLASS dual-GEMM GEGLU
(``csrc/operators/cutlass/cutlass_dual_linear_kernel.cu:27-115``):
``(x·W₁+b₁) ⊙ GELU(x·W₂+b₂)`` — diffusers' ``hidden * gelu(gate)``
with gate = second chunk — computed as one kernel so the two (M, F)
GEMM outputs are combined in the epilogue and never round-trip HBM.
Like the reference's ``cutlass_linear_geglu_unified``, the fused weight
``(K, 2F)`` is split down the output dim (``kernel.cu:528-539``).

TPU mapping: grid ``(M/bm, F/bf, K/bk)`` with k innermost; two f32 VMEM
accumulators; both MXU matmuls per step share the same x block (read
once); the GELU·mul epilogue runs on the VPU at the last k step.  The
tanh-approx GELU mirrors the reference's PTX ``tanh.approx`` fast path
(``kernel.cu:500-525``); exact (erf) GELU is the default, matching
diffusers numerics.

Shape fallback to the unfused XLA path mirrors the reference's fallback
lambda (``kernel.cu:430-440``).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu(y, approximate: bool):
    return jax.nn.gelu(y, approximate=approximate)


def _gelu_kernel(y):
    """In-kernel GELU: Mosaic has no erf/erfc lowering, so the Pallas
    path always uses the tanh approximation — the same trade the
    reference makes with PTX tanh.approx in its CUTLASS epilogue
    (cutlass_dual_linear_kernel.cu:500-525).  Exact (erf) GELU is
    available on the XLA fallback path."""
    return jax.nn.gelu(y, approximate=True)


def _geglu_kernel(x_ref, w1_ref, w2_ref, b1_ref, b2_ref, o_ref, acc1, acc2):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        acc1[:] = jnp.zeros_like(acc1)
        acc2[:] = jnp.zeros_like(acc2)

    x = x_ref[:]
    acc1[:] += jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    acc2[:] += jnp.dot(x, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        # diffusers GEGLU convention: hidden * gelu(gate), where the
        # fused (K, 2F) weight's FIRST F columns produce hidden and the
        # SECOND F columns produce the gate (reference
        # jit_pass_fuse_linear_geglu binds %hidden_states, %gate in
        # that order from aten::chunk).
        h = acc1[:] + b1_ref[:]
        g = acc2[:] + b2_ref[:]
        o_ref[:] = (h * _gelu_kernel(g)).astype(o_ref.dtype)


def _pick_block(n: int, cap: int, multiple: int) -> int:
    if n <= cap:
        return n
    for d in range(cap, 0, -1):
        if n % d == 0 and d % multiple == 0:
            return d
    return n


def linear_geglu_pallas(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    approx_gelu: bool = False,
    block_m: int = 256,
    block_f: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x: (..., K)``, ``w: (K, 2F)``, ``b: (2F,)`` → ``(..., F)``."""
    *lead, k = x.shape
    m = 1
    for s in lead:
        m *= s
    f2 = w.shape[1]
    f = f2 // 2
    x2 = x.reshape(m, k)
    w1, w2 = w[:, :f], w[:, f:]
    if b is None:
        b = jnp.zeros((f2,), jnp.float32)
    b1 = b[:f].reshape(1, f).astype(jnp.float32)
    b2 = b[f:].reshape(1, f).astype(jnp.float32)

    bm = _pick_block(m, block_m, 8)
    bf = _pick_block(f, block_f, 128)
    bk = _pick_block(k, block_k, 128)
    grid = (m // bm, f // bf, k // bk)

    out = pl.pallas_call(
        _geglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bf), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bf), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bf), jnp.float32),
            pltpu.VMEM((bm, bf), jnp.float32),
        ],
        interpret=interpret,
    )(x2, w1, w2, b1, b2)
    return out.reshape(*lead, f)


def linear_geglu_xla(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    approx_gelu: bool = False,
) -> jax.Array:
    """Unfused fallback: one (K, 2F) GEMM + chunk + GELU·mul
    (what diffusers' GEGLU module computes, and the reference's fallback
    shape — jit/passes/__init__.py:639-652 fuse_linear_geglu pattern).

    For bf16 inputs the GEMM emits bf16 directly (the MXU still
    accumulates f32 internally; only the epilogue rounds earlier):
    with f32 output XLA materializes the full (M, 2F) f32 intermediate
    before the chunk boundary — 84 MB per SDXL 1024-token FF, ~5 ms of
    pure HBM traffic per UNet eval (trace `convolution_add_fusion.311`,
    2026-08).  Matches fp16-diffusers numerics, which round there too.
    """
    acc_t = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    y = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )
    if b is not None:
        y = y + b.astype(acc_t)
    h, g = jnp.split(y, 2, axis=-1)
    return (h * _gelu(g, approx_gelu).astype(acc_t)).astype(x.dtype)


def linear_geglu(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    approx_gelu: bool = False,
    backend: Optional[str] = None,  # None=auto | 'pallas' | 'xla'
    interpret: bool = False,
) -> jax.Array:
    if backend is None:
        lanes_ok = w.shape[1] % 256 == 0 and x.shape[-1] % 128 == 0
        backend = (
            "pallas" if (jax.default_backend() == "tpu" and lanes_ok) else "xla"
        )
    if backend == "pallas":
        return linear_geglu_pallas(
            x, w, b, approx_gelu=approx_gelu, interpret=interpret
        )
    return linear_geglu_xla(x, w, b, approx_gelu=approx_gelu)
