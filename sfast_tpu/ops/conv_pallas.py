"""Fused resnet-conv Pallas TPU kernel: GN+SiLU → 3×3 conv (+temb bias,
+residual, ×output_scale) with in-kernel GroupNorm statistics emission.

Why each piece exists (all measured on v5e, 2026-08):

- XLA runs the *isolated* 3×3 NHWC conv at roofline (115–148 TF/s) but
  collapses on the VAE's big-spatial shapes (27 TF/s on the 512²×256
  upsample conv) — this kernel reaches 93–175 TF/s there;
- in the UNet, XLA wins by fusing the GroupNorm stats of a conv's
  output INTO the conv fusion (dual f32 outputs) — any design with a
  separate stats pass loses ~120 µs per normalization (the round-2
  hybrid-GN experiment: 26.4 vs 19.1 ms/eval).  So this kernel emits
  per-channel Σy and Σy² itself, masked to valid pixels, making the
  resnet chain stats-pass-free;
- the timestep embedding is a per-(batch,channel) constant — folded
  into a 2-D bias operand, so the temb add costs no pass and the
  emitted stats already include it;
- the skip connection is an optional residual operand added in the
  epilogue (+ output_scale), so a whole diffusers ResnetBlock2D
  (reference compiles it via torch: GN→SiLU→conv→+temb→GN→SiLU→conv→
  +skip) is TWO kernel launches and zero elementwise passes.

Mechanics: the 3×3 conv is 9 MXU matmuls at flat offsets of one VMEM
buffer — with padded row width W' and the input flattened to
((R+2)·W', C), tap (dy,dx) contributes
``X[dy·W'+dx : dy·W'+dx + R·W'] @ w[dy,dx]``; output columns beyond W
are seam garbage, masked out of the stats and sliced off outside.
Grid is (batch, F-blocks, row-blocks, K-blocks) with rows inner to F so
the f32 stats scratch accumulates across row blocks and the weight
block stays resident across them.  The input GroupNorm+SiLU (scale and
shift precomputed from group stats) is applied in the same XLA fusion
that materializes the padded input — one read of x, one write.

Counterpart of the reference's Triton implicit-GEMM conv + fused
epilogues (``src/sfast/triton/ops/conv.py``,
``csrc/operators/cudnn/cudnn_convolution_impl.cc``) — re-derived from
TPU geometry rather than translated.
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
    # inputs
    x_main_ref,   # (1, BR*Wp, BK)   rows [i*BR, i*BR+BR) of padded input
    x_halo_ref,   # (1, 2*Wp, BK)    rows [i*BR+BR, i*BR+BR+2)
    w_ref,        # (3, 3, BK, BF)
    bias_ref,     # (N?1, 1, BF) f32 — per-batch when temb is folded in
    res_ref,      # (1, BR*Wp, BF) or None (padded like the output)
    # outputs
    o_ref,        # (1, BR*Wp, BF)
    s1_ref,       # (1, 1, BF) f32 or None — Σ y over valid pixels
    s2_ref,       # (1, 1, BF) f32 or None — Σ y² over valid pixels
    # scratch
    x_scratch,    # ((BR+2)*Wp+8, BK) bf16
    acc_scratch,  # (BR*Wp, BF) f32
    st1_scratch,  # (1, BF) f32 or None
    st2_scratch,  # (1, BF) f32 or None
    *,
    wp: int,
    block_r: int,
    nk: int,
    ni: int,
    h: int,
    width: int,
    inv_scale: float,
    out_dtype,
):
    i = pl.program_id(2)
    k = pl.program_id(3)
    m = block_r * wp
    emit_stats = s1_ref is not None

    @pl.when(k == 0)
    def _():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)
        # tail rows past the halo: read only by seam-garbage outputs of
        # the dy=2, dx>0 taps — zero once so the reads are defined
        x_scratch[m + 2 * wp :] = jnp.zeros_like(x_scratch[m + 2 * wp :])

    if emit_stats:

        @pl.when(jnp.logical_and(i == 0, k == 0))
        def _():
            st1_scratch[:] = jnp.zeros_like(st1_scratch)
            st2_scratch[:] = jnp.zeros_like(st2_scratch)

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
        y = acc_scratch[:] + bias_ref[0]
        if res_ref is not None:
            y = y + res_ref[0].astype(jnp.float32)
        if inv_scale != 1.0:
            y = y * inv_scale
        o_ref[0] = y.astype(out_dtype)
        if emit_stats:
            # mask seam-garbage columns and bottom padding rows so the
            # sums cover exactly the H*W valid pixels
            idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            col = idx % wp
            row = i * block_r + idx // wp
            valid = jnp.logical_and(col < width, row < h)
            ym = jnp.where(valid, y, 0.0)
            st1_scratch[:] += jnp.sum(ym, axis=0, keepdims=True)
            st2_scratch[:] += jnp.sum(ym * ym, axis=0, keepdims=True)

            @pl.when(i == ni - 1)
            def _():
                s1_ref[0] = st1_scratch[:]
                s2_ref[0] = st2_scratch[:]


def conv3x3_block(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,        # (F,)
    *,
    bias_batch: Optional[jax.Array] = None,  # (N, F) — e.g. bias + temb proj
    gn_scale: Optional[jax.Array] = None,    # (N, C) f32: rstd*gamma per chan
    gn_shift: Optional[jax.Array] = None,    # (N, C) f32: beta - mean*rstd*gamma
    residual: Optional[jax.Array] = None,    # (N, H, W, F)
    output_scale: float = 1.0,
    emit_stats: bool = False,
    block_r: int = 32,
    block_f: int = 640,
    block_k: int = 640,
    interpret: bool = False,
):
    """``y = (conv3x3(silu(x·gn_scale+gn_shift), w) + bias [+residual]) /
    output_scale`` over NHWC, SAME padding, stride 1.

    With ``emit_stats`` returns ``(y, s1, s2)`` where s1/s2 are the
    per-(batch, channel) Σy / Σy² over the H·W valid pixels (f32) — feed
    :func:`affine_from_stats` to get the next GroupNorm's scale/shift
    without re-reading y.
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
        if residual is not None:
            vmem += 2 * br * wp * bf * 2
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

    if bias_batch is not None:
        bias2 = bias_batch.reshape(n, 1, f).astype(jnp.float32)
    else:
        if bias is None:
            bias = jnp.zeros((f,), jnp.float32)
        bias2 = jnp.broadcast_to(
            bias.reshape(1, 1, f).astype(jnp.float32), (n, 1, f)
        )
    if fp != f:
        bias2 = jnp.pad(bias2, [(0, 0), (0, 0), (0, fp - f)])

    res_p = None
    if residual is not None:
        # residual padded to the output's flat layout (pad garbage never
        # reaches valid outputs or the masked stats)
        res_p = jnp.pad(
            residual,
            [(0, 0), (0, hp - h), (0, wp - width), (0, fp - f)],
        ).reshape(n, hp * wp, fp)

    nk = kp // bk
    ni = hp // br
    grid = (n, fp // bf, ni, nk)

    kernel = functools.partial(
        _conv3x3_kernel,
        wp=wp,
        block_r=br,
        nk=nk,
        ni=ni,
        h=h,
        width=width,
        inv_scale=1.0 / output_scale,
        out_dtype=out_dtype,
    )

    in_specs = [
        pl.BlockSpec(
            (1, br * wp, bk),
            lambda nn, ff, i, kk: (nn, i, kk),
            memory_space=pltpu.VMEM,
        ),
        # halo: rows [i*br+br, i*br+br+2) = 2-row blocks starting at
        # flat element (i+1)*br*wp → block index (i+1)*br//2 in 2*wp units
        pl.BlockSpec(
            (1, 2 * wp, bk),
            lambda nn, ff, i, kk: (nn, (i + 1) * br // 2, kk),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (3, 3, bk, bf),
            lambda nn, ff, i, kk: (0, 0, kk, ff),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, bf), lambda nn, ff, i, kk: (nn, 0, ff), memory_space=pltpu.VMEM
        ),
    ]
    operands = [xp, xp, wq, bias2]
    if res_p is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, br * wp, bf),
                lambda nn, ff, i, kk: (nn, i, ff),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(res_p)

    out_specs = [
        pl.BlockSpec(
            (1, br * wp, bf),
            lambda nn, ff, i, kk: (nn, i, ff),
            memory_space=pltpu.VMEM,
        )
    ]
    out_shape = [jax.ShapeDtypeStruct((n, hp * wp, fp), out_dtype)]
    scratch = [
        pltpu.VMEM(((br + 2) * wp + 8, bk), jnp.bfloat16),
        pltpu.VMEM((br * wp, bf), jnp.float32),
    ]
    if emit_stats:
        for _ in range(2):
            out_specs.append(
                pl.BlockSpec(
                    (1, 1, bf),
                    lambda nn, ff, i, kk: (nn, 0, ff),
                    memory_space=pltpu.VMEM,
                )
            )
            out_shape.append(jax.ShapeDtypeStruct((n, 1, fp), jnp.float32))
            scratch.append(pltpu.VMEM((1, bf), jnp.float32))

    def wrapped_kernel(*refs):
        if res_p is not None:
            x_main, x_halo, wr, br_, rr = refs[:5]
            rest = refs[5:]
        else:
            x_main, x_halo, wr, br_ = refs[:4]
            rr = None
            rest = refs[4:]
        if emit_stats:
            o, s1, s2, xs, acc, st1, st2 = rest
        else:
            (o, xs, acc) = rest
            s1 = s2 = st1 = st2 = None
        return kernel(
            x_main, x_halo, wr, br_, rr, o, s1, s2, xs, acc, st1, st2
        )

    outs = pl.pallas_call(
        wrapped_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hp * wp * 9 * kp * fp,
            bytes_accessed=(n * hp * wp * kp + 9 * kp * fp + n * hp * wp * fp) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    y = outs[0].reshape(n, hp, wp, fp)[:, :h, :width, :f]
    if not emit_stats:
        return y
    s1 = outs[1][:, 0, :f]
    s2 = outs[2][:, 0, :f]
    return y, s1, s2


def conv3x3_gn_silu(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    gn_scale: Optional[jax.Array] = None,
    gn_shift: Optional[jax.Array] = None,
    block_r: int = 32,
    block_f: int = 640,
    block_k: int = 640,
    interpret: bool = False,
) -> jax.Array:
    """``conv3x3(silu(x·gn_scale + gn_shift), w) + bias`` — the simple
    entry point (upsample convs, plain convs).  See :func:`conv3x3_block`
    for the full fused-resnet variant."""
    return conv3x3_block(
        x,
        w,
        bias,
        gn_scale=gn_scale,
        gn_shift=gn_shift,
        block_r=block_r,
        block_f=block_f,
        block_k=block_k,
        interpret=interpret,
    )


def affine_from_stats(
    s1: jax.Array,  # (N, C) Σy per channel
    s2: jax.Array,  # (N, C) Σy² per channel
    count: int,     # valid pixels per channel (H*W)
    gamma: jax.Array,
    beta: jax.Array,
    *,
    groups: int = 32,
    eps: float = 1e-5,
) -> tuple:
    """GroupNorm (scale, shift) per (batch, channel) from per-channel
    sums — the group reduction is a trivial (N, G, C/G) reshape-sum over
    vectors, so a conv that emitted its own stats feeds the next GN for
    free."""
    n, c = s1.shape
    cpg = c // groups
    gs1 = jnp.sum(s1.reshape(n, groups, cpg), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, groups, cpg), axis=-1)
    cnt = jnp.float32(count * cpg)
    mean = gs1 / cnt
    var = gs2 / cnt - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=1)
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    g = gamma.reshape(1, c).astype(jnp.float32)
    b = beta.reshape(1, c).astype(jnp.float32)
    scale = rstd_c * g
    shift = b - mean_c * scale
    return scale, shift


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
    (``group_norm.group_norm_stats``); the normalize pass is applied by
    the caller, fused into the conv input materialization.  Used at
    chain entries — inside a fused resnet chain the stats come from the
    previous conv's emission instead (:func:`affine_from_stats`).
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
