"""Fused GroupNorm+SiLU → 3×3 conv — Pallas TPU kernel.

The SD UNet's resnet blocks are GN+SiLU → conv3×3 → GN+SiLU → conv3×3.
XLA runs the *isolated* 3×3 NHWC conv at roofline (measured 115–148 TF/s
on v5e, ``benchmarks/bench_matmul_shapes.py``), but **in context** its
spatial-tiled conv lowering materializes halo'd copies, f32 dual outputs
for the downstream GroupNorm, and layout-change copies — the UNet's
"convolution fusion" category measures 11.1 ms/eval against a ~5.5 ms
roofline (profiled 2026-08, ``benchmarks/profile_unet.py --trace``).

This kernel is the counterpart of the reference's Triton implicit-GEMM
conv with fused bias/activation (``src/sfast/triton/ops/conv.py``,
``csrc/operators/cudnn/cudnn_convolution_impl.cc``) — but shaped by TPU
geometry instead of CUDA blocks:

- the 3×3 conv is 9 MXU matmuls at **flat offsets** of one VMEM buffer:
  with the padded row width W' the input flattened to ((R+2)·W', C),
  tap (dy,dx) contributes ``X[dy·W'+dx : dy·W'+dx + R·W'] @ w[dy,dx]``
  — output columns beyond W are seam garbage, sliced off outside (3–12%
  padding, the price of turning im2col into pure sublane slices);
- the input GroupNorm+SiLU (per-(batch,channel) scale/shift precomputed
  from group stats) is applied in the same XLA fusion that materializes
  the padded input — one read of x, one write of xp, no separate
  normalize round-trip.  It must happen pre-pad: normalizing inside the
  kernel would turn the zero padding into silu(shift) != 0 and corrupt
  edge pixels;
- accumulation is f32 in VMEM scratch across a K-blocked grid; bias adds
  in the epilogue and the output writes once, in bf16.

W' is rounded to a sublane multiple so 3 of the 9 tap offsets are
aligned; the other 6 are sublane-shifted reads Mosaic handles in-VMEM.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv3x3_kernel(
    x_main_ref,  # (1, BR*Wp, BK)   rows [i*BR, i*BR+BR) of padded input
    x_halo_ref,  # (1, 2*Wp, BK)    rows [i*BR+BR, i*BR+BR+2)
    w_ref,       # (3, 3, BK, BF)
    bias_ref,    # (1, 1, BF) f32
    o_ref,       # (1, BR*Wp, BF)
    x_scratch,   # ((BR+2)*Wp+8, BK) bf16
    acc_scratch, # (BR*Wp, BF) f32
    *,
    wp: int,
    block_r: int,
    nk: int,
    out_dtype,
):
    k = pl.program_id(3)
    m = block_r * wp

    @pl.when(k == 0)
    def _():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)
        # tail rows past the halo: read only by seam-garbage outputs of
        # the dy=2, dx>0 taps — zero once so the reads are defined
        x_scratch[m + 2 * wp :] = jnp.zeros_like(x_scratch[m + 2 * wp :])

    x_scratch[0:m] = x_main_ref[0].astype(x_scratch.dtype)
    x_scratch[m : m + 2 * wp] = x_halo_ref[0].astype(x_scratch.dtype)

    for dy in range(3):
        for dx in range(3):
            off = dy * wp + dx
            a = x_scratch[pl.ds(off, m)]
            acc_scratch[:] += jax.lax.dot_general(
                a,
                w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = (acc_scratch[:] + bias_ref[0]).astype(out_dtype)


def conv3x3_gn_silu(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    gn_scale: Optional[jax.Array] = None,  # (N, C) f32: rstd*gamma per group→chan
    gn_shift: Optional[jax.Array] = None,  # (N, C) f32: beta - mean*rstd*gamma
    block_r: int = 32,
    block_f: int = 640,
    block_k: int = 640,
    interpret: bool = False,
) -> jax.Array:
    """``conv3x3(silu(x·gn_scale + gn_shift), w) + bias`` over NHWC.

    x: (N, H, W, C) — unpadded; SAME padding, stride 1.
    w: (3, 3, C, F).  gn_scale/gn_shift None → plain conv3x3+bias.
    Output dtype = x.dtype.
    """
    n, h, width, c = x.shape
    _, _, _, f = w.shape
    out_dtype = x.dtype
    if gn_scale is not None:
        # GN+SiLU applied pre-pad: XLA fuses this elementwise chain into
        # the pad materialization (one read of x, one write of xp) —
        # applying it in-kernel instead would normalize the zero padding
        # (silu(shift) != 0) and corrupt edge pixels.
        xf = (
            x.astype(jnp.float32) * gn_scale[:, None, None, :]
            + gn_shift[:, None, None, :]
        )
        x = (xf * jax.nn.sigmoid(xf)).astype(out_dtype)

    # Padded row width, rounded up so tap offsets dy*wp are sublane-aligned.
    wp = _round_up(width + 2, 8)

    # Block sizes.  Constraint: a block's last dim must be a multiple of
    # 128 OR equal to the array dim (Mosaic).  bk == C needs no channel
    # padding and is preferred; the fat concat channels (1280/1920/2560)
    # K-block at 640 (= 5*128).  bf steps down 512→256→128 until the
    # double-buffered weight block fits the ~14 MB VMEM budget.
    bk = 640 if (c > 640 and c % 640 == 0) else c
    bf_chain = [f] if f <= 640 else [512, 256, 128]
    bf_chain += [v for v in (512, 256, 128) if v < bf_chain[-1]]
    for bf in bf_chain:
        # largest even row block whose f32 accumulator stays <= ~2 MB
        for cand in (block_r, 16, 8, 4, 2):
            br = min(cand, h + h % 2)
            if br * wp * bf * 4 <= (2 << 20):
                break
        vmem = (
            2 * 9 * bk * bf * 2          # weight block, double-buffered
            + 2 * br * wp * bk * 2       # x main block, double-buffered
            + ((br + 2) * wp + 8) * bk * 2  # assemble scratch
            + br * wp * bf * 4           # f32 accumulator
            + 2 * br * wp * bf * 2       # output block, double-buffered
        )
        if vmem <= (14 << 20):
            break
    bf = min(bf, f)
    fp, kp = _round_up(f, bf), _round_up(c, bk)
    hp = _round_up(h, br)

    # rows: 1 top pad + h + 1 bottom pad, then up to hp+2 so every
    # block's halo read is in bounds
    xp = jnp.pad(
        x,
        [(0, 0), (1, 1 + (hp - h)), (1, wp - width - 1), (0, kp - c)],
    ).reshape(n, (hp + 2) * wp, kp)
    wq = w
    if kp != c or fp != f:
        wq = jnp.pad(w, [(0, 0), (0, 0), (0, kp - c), (0, fp - f)])
    if bias is None:
        bias = jnp.zeros((f,), jnp.float32)
    bias2 = bias.reshape(1, 1, f).astype(jnp.float32)
    if fp != f:
        bias2 = jnp.pad(bias2, [(0, 0), (0, 0), (0, fp - f)])

    nk = kp // bk
    grid = (n, hp // br, fp // bf, nk)

    kernel = functools.partial(
        _conv3x3_kernel,
        wp=wp,
        block_r=br,
        nk=nk,
        out_dtype=out_dtype,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, br * wp, bk),
                lambda nn, i, ff, kk: (nn, i, kk),
                memory_space=pltpu.VMEM,
            ),
            # halo: rows [i*br+br, i*br+br+2) = 2-row blocks starting at
            # flat element (i+1)*br*wp → block index (i+1)*br//2 in 2*wp units
            pl.BlockSpec(
                (1, 2 * wp, bk),
                lambda nn, i, ff, kk: (nn, (i + 1) * br // 2, kk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, bk, bf),
                lambda nn, i, ff, kk: (0, 0, kk, ff),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bf), lambda nn, i, ff, kk: (0, 0, ff), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br * wp, bf),
            lambda nn, i, ff, kk: (nn, i, ff),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp * wp, fp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(((br + 2) * wp + 8, bk), jnp.bfloat16),
            pltpu.VMEM((br * wp, bf), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hp * wp * 9 * kp * fp,
            bytes_accessed=(n * hp * wp * kp + 9 * kp * fp + n * hp * wp * fp) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, wq, bias2)

    out = out.reshape(n, hp, wp, fp)[:, :h, :width, :f]
    return out


def gn_affine(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> tuple:
    """Per-(batch, channel) GroupNorm scale/shift from group statistics.

    Returns (scale, shift), each (N, C) f32, with y = x*scale + shift ≡
    GN(x)*gamma+beta.  Stats come from the Pallas stats kernel
    (``group_norm.group_norm_stats`` — XLA's own stats reduce measures
    ~10x above the bandwidth roofline in context); the normalize pass is
    applied by the caller, fused into the conv input materialization.
    """
    from sfast_tpu.ops.group_norm import group_norm_stats

    n, h, w, c = x.shape
    mean, rstd = group_norm_stats(
        x, groups=groups, eps=eps, interpret=interpret
    )
    mean_c = mean.reshape(n, c)
    rstd_c = rstd.reshape(n, c)
    g = gamma.reshape(1, c).astype(jnp.float32)
    b = beta.reshape(1, c).astype(jnp.float32)
    scale = rstd_c * g
    shift = b - mean_c * scale
    return scale, shift
