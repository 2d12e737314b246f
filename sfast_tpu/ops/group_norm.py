"""Fused GroupNorm(+activation) over NHWC — Pallas TPU kernels.

Counterpart of the reference's Triton NHWC two-kernel scheme
(``triton/ops/group_norm.py:126-349``: collect-stats + apply, templated
over an activation).  TPU-native differences:

- NHWC is the *native* TPU conv layout, so there is no NCHW variant and
  no channels-last conversion machinery (reference
  ``utils/memory_format.py`` is unnecessary here);
- the awkward part of NHWC group-norm — reducing per-channel statistics
  into per-*group* statistics when channels-per-group (e.g. 10 for
  C=320, G=32) is not lane-aligned — is done on the MXU with a constant
  0/1 grouping matrix (``sums(1,C) @ M(C,G)``), instead of strided lane
  shuffles;
- activation templating (identity / SiLU) is a static kernel parameter —
  the role ``copy_func`` plays in the reference
  (``triton/ops/group_norm.py:85-107``).

Two passes (stats, then normalize+affine+activation) = 2 HBM reads +
1 write, the bandwidth floor for feature maps larger than VMEM.  A plain
XLA path is kept for small shapes and as the CPU/debug fallback — the
same graceful-degradation discipline as the reference's aten fallbacks
(``triton/torch_ops.py:109-169``).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_divisor_leq(n: int, cap: int, multiple: int = 8) -> int:
    """Largest divisor of n that is <= cap and a multiple of `multiple`
    (or n itself if n <= cap)."""
    if n <= cap:
        return n
    best = None
    for d in range(cap, 0, -1):
        if n % d == 0:
            if d % multiple == 0:
                return d
            if best is None:
                best = d
    return best or n


def _block_hw(hw: int, c: int, cap: int) -> int:
    """Row-block size bounded by VMEM: block×C f32 compute + in/out copies
    must fit 16 MB with double buffering.  ~256K elements ≈ 1 MB f32
    leaves comfortable headroom at SDXL widths (C up to 2560, where a
    flat 1024-row cap scoped-VMEM-OOMs: 1024×2560 f32 ≈ 10 MB/buffer)."""
    return _largest_divisor_leq(hw, max(8, min(cap, (256 * 1024) // max(c, 1))))


def _apply_act(y, act: Optional[str]):
    if act is None:
        return y
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    if act == "gelu":
        return jax.nn.gelu(y, approximate=True)
    raise ValueError(f"unknown activation: {act}")


def _group_matrix(c: int, groups: int):
    """(C, G) 0/1 matrix mapping channels to their group (MXU reduction)."""
    cpg = c // groups
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (cidx // cpg == gidx).astype(jnp.float32)


def _stats_kernel(x_ref, mean_ref, rstd_ref, s1, s2, *, groups, eps, hw):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        s1[:] = jnp.zeros_like(s1)
        s2[:] = jnp.zeros_like(s2)

    x = x_ref[0].astype(jnp.float32)  # (BHW, C)
    s1[:] += jnp.sum(x, axis=0, keepdims=True)
    s2[:] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(j == nj - 1)
    def _finalize():
        c = x.shape[1]
        cpg = c // groups
        m = _group_matrix(c, groups)
        gs1 = jnp.dot(s1[:], m, preferred_element_type=jnp.float32)  # (1, G)
        gs2 = jnp.dot(s2[:], m, preferred_element_type=jnp.float32)
        n = jnp.float32(hw * cpg)
        mean_g = gs1 / n
        var_g = gs2 / n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        # Broadcast group stats back to channels via Mᵀ on the MXU.
        mean_ref[0] = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
        rstd_ref[0] = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32)


def _norm_apply_kernel(x_ref, mean_ref, rstd_ref, gamma_ref, beta_ref, o_ref, *, act):
    x = x_ref[0].astype(jnp.float32)
    y = (x - mean_ref[0]) * rstd_ref[0] * gamma_ref[0] + beta_ref[0]
    o_ref[0] = _apply_act(y, act).astype(o_ref.dtype)


def group_norm_stats(
    x: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    block_hw_cap: int = 1024,
    interpret: bool = False,
):
    """Per-channel (mean, rstd) of GroupNorm over NHWC x — Pallas stats
    kernel only.

    Why this exists standalone: XLA's stats reduce (f32 convert + reduce
    over a 10-wide channels-per-group minor axis) measures ~10x above the
    bandwidth roofline in the UNet (1.67 ms/eval for ~127 MB of reads,
    profiled 2026-08).  This kernel reads x once at full lane width and
    does the group reduction on the MXU with a 0/1 matrix.  The
    *normalize/affine/activation* is left to XLA so it keeps fusing into
    the consumer (conv input, attention projections) — the round-1
    full-Pallas GN lost end-to-end precisely because it broke that
    fusion.

    Returns (mean, rstd), each (N, 1, 1, C) f32.
    """
    n, h, w, c = x.shape
    hw = h * w
    xf = x.reshape(n, hw, c)
    block_hw = _block_hw(hw, c, block_hw_cap)
    grid = (n, hw // block_hw)

    stats = functools.partial(_stats_kernel, groups=groups, eps=eps, hw=hw)
    mean, rstd = pl.pallas_call(
        stats,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_hw, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(xf)
    return mean.reshape(n, 1, 1, c), rstd.reshape(n, 1, 1, c)


def group_norm_hybrid(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas stats + XLA normalize/affine/act (see group_norm_stats)."""
    n, h, w, c = x.shape
    mean, rstd = group_norm_stats(
        x, groups=groups, eps=eps, interpret=interpret
    )
    scale = rstd * gamma.reshape(1, 1, 1, c).astype(jnp.float32)
    shift = beta.reshape(1, 1, 1, c).astype(jnp.float32) - mean * scale
    y = x.astype(jnp.float32) * scale + shift
    return _apply_act(y, act).astype(x.dtype)


def group_norm_pallas(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
    block_hw_cap: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm over NHWC input ``x`` with per-channel affine."""
    n, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    hw = h * w
    xf = x.reshape(n, hw, c)
    block_hw = _block_hw(hw, c, block_hw_cap)
    grid = (n, hw // block_hw)

    stats = functools.partial(_stats_kernel, groups=groups, eps=eps, hw=hw)
    mean, rstd = pl.pallas_call(
        stats,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_hw, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(xf)

    apply = functools.partial(_norm_apply_kernel, act=act)
    gamma2 = gamma.reshape(1, 1, c).astype(jnp.float32)
    beta2 = beta.reshape(1, 1, c).astype(jnp.float32)
    out = pl.pallas_call(
        apply,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_hw, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_hw, c), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(xf, mean, rstd, gamma2, beta2)
    return out.reshape(n, h, w, c)


def group_norm_xla(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> jax.Array:
    """Plain-XLA GroupNorm (sum/sumsq single-fusion formulation, f32
    accumulation) — fallback and small-shape path.

    A lane-aligned alternative (per-channel sums over HW, fold (N,C)
    into (N,G) — keeping the minor axis at full 128-lane width) was
    built and A/B-measured same-session inside the real UNet evals
    (``benchmarks/probe_gn_formulations.py``, v5e 2026-08-18): it LOST
    slightly on both models (SDXL 166.4 vs 164.6 ms/eval, SD1.5 57.1 vs
    55.9).  XLA already vectorizes the grouped (N,HW,G,C/G) reduce well;
    the convert_reduce time in the SDXL trace is bandwidth (the f32
    upcast read), not lane padding.  So the simple grouped formulation
    stays."""
    n, h, w, c = x.shape
    cpg = c // groups
    xf = x.reshape(n, h * w, groups, cpg).astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 3), keepdims=True)
    s2 = jnp.sum(xf * xf, axis=(1, 3), keepdims=True)
    cnt = jnp.float32(h * w * cpg)
    mean = s1 / cnt
    var = s2 / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd
    y = y.reshape(n, h * w, c) * gamma.reshape(1, 1, c).astype(
        jnp.float32
    ) + beta.reshape(1, 1, c).astype(jnp.float32)
    return _apply_act(y, act).astype(x.dtype).reshape(n, h, w, c)


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
    backend: Optional[str] = None,  # None=auto | 'pallas' | 'xla'
    interpret: bool = False,
) -> jax.Array:
    c = x.shape[-1]
    if c % groups != 0:
        raise ValueError(
            f"channels ({c}) must be divisible by groups ({groups})"
        )
    if backend is None:
        # auto = XLA everywhere: measured end-to-end on v5e (2026-08),
        # the separate Pallas stats pass (hybrid: 26.4 ms/eval) and the
        # two-kernel Pallas GN both lose to XLA's stats-fused-into-
        # producer graph (19.1 ms/eval baseline).  'pallas'/'hybrid'
        # remain opt-in backends.
        backend = "xla"
    if backend == "pallas":
        return group_norm_pallas(
            x, gamma, beta, groups=groups, eps=eps, act=act, interpret=interpret
        )
    if backend == "hybrid":
        return group_norm_hybrid(
            x, gamma, beta, groups=groups, eps=eps, act=act, interpret=interpret
        )
    return group_norm_xla(x, gamma, beta, groups=groups, eps=eps, act=act)


def group_norm_silu(x, gamma, beta, *, groups=32, eps=1e-5, **kw):
    """The fused GroupNorm+SiLU of the UNet ResNet blocks — the single
    most frequent normalization in SD (reference fuses it at
    ``jit/passes/triton_passes.py:68-88``)."""
    return group_norm(x, gamma, beta, groups=groups, eps=eps, act="silu", **kw)
