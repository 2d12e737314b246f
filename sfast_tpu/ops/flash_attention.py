"""Pallas TPU flash attention (forward).

The hand-written attention kernel of sfast_tpu — the role xformers'
``memory_efficient_attention`` plays in the reference
(``libs/xformers/xformers_attention.py:26-48``): O(seq) memory, blockwise
online softmax, never materializing the (Sq, Sk) score matrix in HBM.

Design (TPU-first, not a Triton translation):

- grid ``(batch*heads, q_blocks, k_blocks)`` with the k-axis innermost —
  TPU grids execute sequentially, so VMEM scratch (running max ``m``,
  denominator ``l``, accumulator ``acc``) carries across k iterations and
  the output block is written once on the last k step;
- the MXU does both matmuls per block (``q·kᵀ`` and ``p·v``) in bf16 with
  f32 accumulation (``preferred_element_type``);
- head_dim is zero-padded to a lane multiple (128) *outside* the kernel:
  zero q/k columns do not change scores, zero v columns are sliced off;
- kv padding is masked with -inf *inside* the kernel using the static
  real kv length (shapes are static under jit, so the mask is free);
- optional causal masking for text encoders (CLIP); the diffusion UNet
  path is non-causal.

Numerics match ``jax.nn.softmax(q·kᵀ)·v`` to bf16 tolerance — asserted in
``tests/ops/test_attention.py`` with the tolerance discipline of the
reference's operator tests (``tests/operators/*`` rtol/atol 1e-3..3e-2).
"""

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
# exp(x) == exp2(x·log₂e).  The TPU VPU's transcendental unit computes
# exp2 natively (exp lowers to exp2 plus a per-element multiply); folding
# log₂e into the q prescale (one multiply over (S, d)) replaces every
# in-kernel exp over the (block_q, block_k) score blocks — where this
# kernel is VPU-bound (SDXL trace 2026-08) — with a bare exp2.
LOG2E = math.log2(math.e)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    kv_len: int,
    block_k: int,
    causal: bool,
    block_q: int,
    need_mask: bool = True,
    softmax_dtype=jnp.float32,
    fused_l: bool = False,
    fused_l_inkernel: bool = False,
    d_real: int = 0,
    kv_stages: int = 1,
):
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        if not fused_l:
            l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (block_q, d)

    # kv_stages > 1 splits the VMEM kv block into sub-blocks processed
    # as consecutive online-softmax iterations INSIDE one program, with
    # the carries (m, l, acc) held in registers/VMEM locals and written
    # back once.  The point is MXU/VPU overlap: sub-block t+1's q·kᵀ
    # matmul has no data dependency on sub-block t's softmax, so
    # Mosaic's scheduler can issue it while the VPU runs t's exp/max
    # passes — the cross-iteration stagger a grid-step boundary forbids
    # (grid steps execute as separate sequential programs).
    sub = block_k // kv_stages
    m_prev = m_scratch[:]  # (block_q, LANES), lane-replicated
    l_prev = None if fused_l else l_scratch[:]
    acc = acc_scratch[:]
    for t in range(kv_stages):
        if kv_stages > 1:
            k_t = k_ref[0][t * sub : (t + 1) * sub]
            v_t = v_ref[0][t * sub : (t + 1) * sub]
        else:
            k_t = k_ref[0]
            v_t = v_ref[0]
        if fused_l and fused_l_inkernel:
            # plant the denominator ones-column IN VMEM (one VPU select
            # over (sub, dp) — 16x smaller than the f32-convert+row-sum
            # passes over (block_q, sub) it replaces).  The =1 variant
            # writes the column on the HBM V tensor instead, which costs
            # a per-step pass over freshly-projected V in the caller's
            # graph — the reason its isolated −5.4%/call win inverted to
            # an e2e LOSS (STATUS round-4; bench A/B 1120 vs 1056 ms).
            lane = jax.lax.broadcasted_iota(jnp.int32, v_t.shape, 1)
            v_t = jnp.where(lane == d_real, jnp.ones_like(v_t), v_t)
        s = jax.lax.dot_general(
            q,
            k_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, sub)

        # Mask padded kv columns (static kv_len → compile-time-known
        # bound).  Skipped entirely when kv divides the block evenly and
        # the pass is non-causal (the SD self-attention case): the
        # iota/compare/where VPU passes over the (block_q, block_k)
        # scores are measurable (~6% of the level-0 kernel, v5e 2026-08).
        if need_mask:
            col = j * block_k + t * sub + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            mask = col < kv_len
            if causal:
                row = pl.program_id(1) * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 0
                )
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

        # softmax_dtype=bfloat16 runs the big (block_q, block_k) exp on
        # the VPU at packed-bf16 rate and feeds the MXU without a cast
        # pass; the row-sum still accumulates in f32 (exact).  ~0.4% p
        # error — the same trade as the reference's fp16-accum lowp
        # GEMMs.  Scores arrive pre-scaled by log₂e (see LOG2E), so
        # exp == exp2 here.
        p = jnp.exp2((s - m_next[:, :1]).astype(softmax_dtype))
        alpha = jnp.exp2(m_prev - m_next)  # (block_q, LANES)
        if not fused_l:
            l_prev = l_prev * alpha + jnp.broadcast_to(
                jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                l_prev.shape,
            )

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, d)
        acc = acc * alpha[:, :1] + pv
        m_prev = m_next

    m_scratch[:] = m_prev
    if not fused_l:
        l_scratch[:] = l_prev
    acc_scratch[:] = acc

    @pl.when(j == n_k - 1)
    def _finalize():
        if fused_l:
            # l rode the PV matmul through the ones column planted in
            # V's d-padding (column d_real): the MXU row-summed p in its
            # f32 accumulator, and alpha carried it across kv blocks in
            # acc — the separate f32 convert + row-sum VPU passes over
            # the (block_q, block_k) scores and the l carry vanish.
            l = acc_scratch[:, d_real : d_real + 1]
            o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)
        else:
            # l is lane-replicated; take lane 0.
            o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


def _flash_int8_kernel(
    q_ref,
    k_ref,
    v_ref,
    sqk_ref,
    sv_ref,
    corr_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    kv_len: int,
    block_k: int,
    causal: bool,
    block_q: int,
    need_mask: bool,
):
    """int8-compute flash attention block.

    Both MXU matmuls run int8×int8→int32 (v5e int8 mode ≈ 2× bf16 —
    measured 209 vs ~105 TF/s on this chip for deep contractions), the
    quantization design after SageAttention (Zhang et al., 2024, public):

    - q, k are per-(batch·head) dynamically quantized OUTSIDE the kernel;
      both are mean-centered over the sequence first.  K's mean is a
      per-row constant score shift (softmax-invariant, dropped); Q's
      mean contributes the exact per-COLUMN term q̄·kⱼ, precomputed
      outside as ``corr`` (one matvec per head) and added back here as
      a lane-broadcast — so centering costs no accuracy at all and the
      int8 range is spent on the signal, not the common mode;
    - p is quantized against the BLOCK-LOCAL row max: p₂ = exp2(s - m_cur)
      (scores arrive pre-scaled by log₂e, see LOG2E) peaks at exactly 1
      in every block, and the dequant factor β = exp2(m_cur - m_next) is
      already computed for the online-softmax carry — so full int8 range
      per block at zero extra VPU cost (quantizing against the global
      running max instead underflows blocks whose scores sit far below
      it);
    - v is mean-centered and per-(batch·head) quantized; the mean is
      added back after normalization (Σp·v̄/l = v̄ exactly).
    """
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    s_i32 = jax.lax.dot_general(
        q_ref[0],
        k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (block_q, block_k)
    # dequant + exact Q-mean correction (per-column, lane-broadcast)
    s = s_i32.astype(jnp.float32) * sqk_ref[0, 0, 0] + corr_ref[0, 0]

    if need_mask:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = col < kv_len
        if causal:
            row = pl.program_id(1) * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0
            )
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scratch[:]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))

    # block-local softmax numerator: peaks at exactly 1 per row
    # (scores are pre-scaled by log₂e outside, so exp == exp2 here)
    p2 = jnp.exp2(s - m_cur)
    alpha = jnp.exp2(m_prev - m_next)
    beta = jnp.exp2(m_cur - m_next[:, :1])  # (block_q, 1), ≤ 1
    l_next = l_prev * alpha + jnp.broadcast_to(
        beta * jnp.sum(p2, axis=-1, keepdims=True), l_prev.shape
    )
    m_scratch[:] = m_next
    l_scratch[:] = l_next

    p_i8 = (p2 * 127.0 + 0.5).astype(jnp.int8)  # full int8 range per block
    pv = jax.lax.dot_general(
        p_i8,
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # dequant: per-row β (sublane bcast) × per-CHANNEL v scale (lane bcast)
    acc_scratch[:] = acc_scratch[:] * alpha[:, :1] + (
        pv.astype(jnp.float32) * beta
    ) * sv_ref[0, 0]

    @pl.when(j == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, :1]).astype(o_ref.dtype)


def _quantize_per_bh(x: jax.Array):
    """(BH, S, D) f32 → int8 with one dynamic scale per BH row."""
    amax = jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale[:, 0, 0]  # (BH,)


def _quantize_per_channel(x: jax.Array):
    """(BH, S, D) f32 → int8 with a dynamic scale per (BH, channel) —
    used for V, whose dequant applies per OUTPUT column of P·V."""
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (BH, 1, D)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return xq, scale[:, 0, :]  # (BH, D)


def flash_attention_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale=None,
    causal: bool = False,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """int8-compute blockwise attention over (B, H, S, D).

    Same contract as :func:`flash_attention`; trades ~1e-2 relative
    output error (int8 quantization of q/k/v/p) for the int8 MXU rate.
    Opt-in via ``CompilationConfig.enable_int8_attention``.
    """
    batch, heads, sq, d = q.shape
    _, _, sk, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = q.dtype
    bh = batch * heads

    # fold log₂e into the prescale: all in-kernel exps become bare exp2
    qf = q.reshape(bh, sq, d).astype(jnp.float32) * jnp.float32(scale * LOG2E)
    kf = k.reshape(bh, sk, d).astype(jnp.float32)
    vf = v.reshape(bh, sk, d).astype(jnp.float32)

    # k mean-centering: softmax(q·(k-k̄)ᵀ) == softmax(q·kᵀ) (row shift)
    kf = kf - kf.mean(axis=1, keepdims=True)
    # q mean-centering with EXACT correction: s = (q-q̄)·kᵀ + q̄·kᵀ;
    # the second term is per-column, one matvec per head, added in-kernel
    qm = qf.mean(axis=1, keepdims=True)  # (bh, 1, d)
    qf = qf - qm
    corr = jnp.einsum("bod,bsd->bos", qm, kf)  # (bh, 1, sk)
    # v mean-centering: added back after the normalize (Σp·v̄/l == v̄)
    vm = vf.mean(axis=1, keepdims=True)  # (bh, 1, d)
    vf = vf - vm

    q_i8, s_q = _quantize_per_bh(qf)
    k_i8, s_k = _quantize_per_bh(kf)
    v_i8, s_v = _quantize_per_channel(vf)
    # aux inputs as 3-D so the (sub-tile) block shapes equal the array
    # dims — the TPU lowering requires the last two block dims to be
    # (multiple-of-8, multiple-of-128) OR exactly the array dims
    sqk = (s_q * s_k).reshape(bh, 1, 1)
    sv = (s_v / 127.0)[:, None, :]  # (bh, 1, d)

    dp = max(_round_up(d, LANES), LANES)
    if dp != d:
        padd = [(0, 0), (0, 0), (0, dp - d)]
        q_i8, k_i8, v_i8 = (jnp.pad(t, padd) for t in (q_i8, k_i8, v_i8))
        sv = jnp.pad(sv, [(0, 0), (0, 0), (0, dp - d)])

    block_q = min(block_q, _round_up(sq, 32))
    block_k = min(block_k, _round_up(sk, LANES))
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    if sq_p != sq:
        q_i8 = jnp.pad(q_i8, [(0, 0), (0, sq_p - sq), (0, 0)])
    if sk_p != sk:
        k_i8 = jnp.pad(k_i8, [(0, 0), (0, sk_p - sk), (0, 0)])
        v_i8 = jnp.pad(v_i8, [(0, 0), (0, sk_p - sk), (0, 0)])
        corr = jnp.pad(corr, [(0, 0), (0, 0), (0, sk_p - sk)])
    # padded kv rows must not reach the softmax (int8 zeros give score 0,
    # not -inf), so masking is needed whenever kv was padded
    need_mask = causal or (sk_p != sk)

    grid = (bh, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_int8_kernel,
        kv_len=sk,
        block_k=block_k,
        causal=causal,
        block_q=block_q,
        need_mask=need_mask,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, dp), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block_k), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, dp), jnp.float32),
        ],
        interpret=interpret,
    )(q_i8, k_i8, v_i8, sqk, sv, corr)

    out = out[:, :sq, :d] + vm[:, :, :d].astype(out.dtype)
    return out.reshape(batch, heads, sq, d)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale=None,
    causal: bool = False,
    # Block defaults validated END-TO-END on SD1.5 512² 50-step
    # (host-forced outputs, 2026-08): (512,512) → 1403 ms, (1024,512) →
    # 1447, (4096,512) → 1322, (1024,1024)/(2048,1024) → **1206 ms**;
    # (2048,2048) exceeds VMEM.  Large k blocks amortize the online-
    # softmax carry; (1024,1024) keeps ~7 MB VMEM headroom.
    # block_k=None = auto: at the SD-class hot shape (kv 4096, d ≤ 64)
    # the whole kv rides in VMEM as one block split into 2 staged
    # sub-blocks — measured 0.877 vs 0.938 ms/call (-6.5%) at
    # bf16[16,4096,64] (v5e two-point chains, 2026-08-19,
    # benchmarks/bench_flash_variants.py); other shapes keep (1024,1024).
    block_q: int = 1024,
    block_k: Optional[int] = None,
    softmax_dtype=jnp.float32,
    interpret: bool = False,
    kv_stages: int = 1,
    dimsem: bool = False,
    input_fusion: bool = False,
) -> jax.Array:
    """Blockwise attention over (B, H, S, D) tensors.

    ``softmax(scale * q @ kᵀ) @ v`` with O(S) memory.

    ``kv_stages`` — sub-blocks per kv grid step (MXU/VPU stagger, see
    ``_flash_kernel``); ``dimsem`` — mark the bh and q grid axes
    "parallel" for Mosaic (only the kv axis carries state); measured
    NEUTRAL-to-negative at the SD hot shape (0.955 vs 0.941 ms/call,
    v5e two-point chains 2026-08-19, ``benchmarks/bench_flash_variants``)
    so it defaults off; ``input_fusion`` — let XLA fuse the q prescale /
    pad producers into the custom call instead of materializing them in
    HBM (also measured neutral: 1.009 vs 1.004 ms/call same session).
    """
    batch, heads, sq, d = q.shape
    _, _, sk, _ = k.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    out_dtype = q.dtype
    if block_k is None:
        if sk == 4096 and d <= 64:
            # measured fast point (see block_k docstring above); an
            # explicit caller kv_stages (≠ the 1 default) is respected —
            # the auto rule only fills the default
            block_k = 4096
            if kv_stages == 1:
                kv_stages = 2
        else:
            block_k = 1024

    # fold log₂e into the prescale: all in-kernel exps become bare exp2
    q = (q * jnp.asarray(scale * LOG2E, q.dtype)).reshape(batch * heads, sq, d)
    k = k.reshape(batch * heads, sk, d)
    v = v.reshape(batch * heads, sk, d)

    # Pad head dim to a lane multiple; zero columns are inert.  d ≤ 64
    # (SDXL/SVD class) pads only to 64: Mosaic accepts a 64-wide minor
    # dim, halving both MXU matmuls vs zero-padding to the 128 lane tile.
    dp = max(_round_up(d, 64 if d <= 64 else LANES), 64)
    if dp != d:
        padd = [(0, 0), (0, 0), (0, dp - d)]
        q, k, v = (jnp.pad(t, padd) for t in (q, k, v))

    # Fused denominator (OPT-IN, measured-negative in context): when
    # d-padding leaves a free column (SD1.5 level-0 d=40→64) plant ones
    # in V's first pad column so the PV matmul row-sums p into the f32
    # accumulator — the kernel then skips its f32 convert + row-sum VPU
    # passes over every score block.  Exact on the bf16-softmax path
    # (device outputs bitwise-identical).  Measured v5e 2026-08-19:
    # WINS -5.4%/call at the isolated hot shape (2,8,4096,4096,40)
    # (median 914 vs 966 µs, 5 alternated two-point chains) but LOSES
    # in the fused SD1.5 pipeline (adjacent-session bench.py A/B:
    # 1120.0 vs 1056.5 ms e2e) — the per-step ones-column write on the
    # freshly-projected V plus scheduling interactions outweigh the
    # in-kernel saving.  Kept opt-in for d<64 serving shapes where the
    # isolated win may transfer.
    # "1": ones column written on the HBM V tensor (caller-graph pass,
    # measured e2e-negative); "2": ones planted inside the kernel on the
    # VMEM sub-block (no caller-graph cost — the variant built to make
    # the isolated win transfer to e2e).
    fl_env = os.environ.get("SFAST_TPU_FUSED_L")
    fused_l = (
        dp > d
        and jnp.dtype(softmax_dtype) == jnp.bfloat16
        and fl_env in ("1", "2")
    )
    if fused_l and fl_env == "1":
        v = v.at[:, :, d].set(1)

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, LANES))
    if block_k % kv_stages or (block_k // kv_stages) % LANES:
        kv_stages = 1  # sub-blocks must stay lane-aligned
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    if sq_p != sq:
        q = jnp.pad(q, [(0, 0), (0, sq_p - sq), (0, 0)])
    if sk_p != sk:
        k = jnp.pad(k, [(0, 0), (0, sk_p - sk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, sk_p - sk), (0, 0)])

    grid = (batch * heads, sq_p // block_q, sk_p // block_k)

    kernel = functools.partial(
        _flash_kernel,
        kv_len=sk,
        block_k=block_k,
        causal=causal,
        block_q=block_q,
        need_mask=causal or (sk_p != sk),
        softmax_dtype=softmax_dtype,
        fused_l=fused_l,
        fused_l_inkernel=(fl_env == "2"),
        d_real=d,
        kv_stages=kv_stages,
    )

    compiler_params = None
    if (dimsem or input_fusion) and not interpret:
        compiler_params = pltpu.CompilerParams(
            # only the kv axis carries online-softmax state; bh and q
            # are embarrassingly parallel
            dimension_semantics=("parallel", "parallel", "arbitrary")
            if dimsem
            else None,
            allow_input_fusion=[input_fusion] * 3,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, dp), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch * heads, sq_p, dp), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),  # running max m
            pltpu.VMEM((block_q, LANES), jnp.float32),  # denominator l
            pltpu.VMEM((block_q, dp), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
        compiler_params=compiler_params,
    )(q, k, v)

    out = out[:, :sq, :d]
    return out.reshape(batch, heads, sq, d)
