"""Shared functional building blocks for the diffusion model families.

The reference compiles *through* HuggingFace diffusers' torch modules and
inherits every architecture for free; a TPU-native rebuild re-implements
the forward passes as pure JAX functions (SURVEY.md §7 "hard parts":
weight extraction / architecture mirroring).  These blocks mirror
diffusers' module semantics (ResnetBlock2D, Transformer2DModel,
BasicTransformerBlock, Attention, Up/Downsample2D, timestep embeddings)
while being TPU-idiomatic:

- data layout NHWC (native for TPU convs);
- linear weights (in, out), conv kernels HWIO — converters transpose from
  torch layouts once at load;
- normalizations accumulate in f32, matmuls run bf16→f32 on the MXU;
- attention routes through :func:`sfast_tpu.ops.dot_product_attention`
  (Pallas flash kernel or XLA, per config);
- the GEGLU feed-forward routes through the fused Pallas dual-matmul.

Every ``init_*`` returns the same pytree structure the matching
``*_fwd`` consumes — the single source of truth for the weight
converters in ``sfast_tpu.interop``.
"""

import contextlib
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sfast_tpu.ops.attention import dot_product_attention
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.geglu import linear_geglu
from sfast_tpu.ops.group_norm import group_norm
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.linear import linear

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (shape spec; real weights come from the converters)
#
# Init runs entirely on the host with numpy: per-layer jax.random calls
# would cost one XLA compile + one device dispatch EACH (hundreds of
# layers ⇒ ~a minute just to build placeholder weights, worse over a
# tunneled TPU).  A jax key seeds one numpy Generator; values are
# placeholder-quality by design.
# ---------------------------------------------------------------------------

import numpy as _np


def as_host_rng(rng) -> _np.random.Generator:
    """jax key (or int, or Generator) → numpy Generator, one host sync."""
    if isinstance(rng, _np.random.Generator):
        return rng
    if isinstance(rng, int):
        return _np.random.default_rng(rng)
    try:
        seed = int(_np.asarray(jax.random.key_data(rng)).astype(_np.uint64).sum())
    except Exception:
        # abstract/traced key (e.g. under jax.eval_shape): values are
        # irrelevant there, only shapes — use a fixed seed
        seed = 0
    return _np.random.default_rng(seed)


def _np_dtype(dtype):
    # numpy understands ml_dtypes (bfloat16) via jnp dtype objects
    return jnp.dtype(dtype)


def _fast_cast(arr: "_np.ndarray", dtype) -> "_np.ndarray":
    """f32 → target dtype; bf16 via vectorized bit ops (ml_dtypes' astype
    is a scalar loop — ~4 minutes for an SD1.5 UNet's 859M params)."""
    np_dtype = _np_dtype(dtype)
    if np_dtype == jnp.bfloat16:
        bits = arr.view(_np.uint32)
        rounded = bits + _np.uint32(0x7FFF) + ((bits >> 16) & _np.uint32(1))
        return (rounded >> 16).astype(_np.uint16).view(np_dtype)
    return arr.astype(np_dtype)


_SHAPE_ONLY = False


@contextlib.contextmanager
def shape_only_init():
    """Make ``init_*`` return stride-0 zero placeholders instantly.

    Generating real random values for an SD1.5 UNet's 860M params costs
    ~135 s of host CPU (measured 2026-08) — pure waste when only the
    tree STRUCTURE is needed (shape probing, zero-weight benchmarks,
    ``packed_zeros_like``).  Placeholder leaves broadcast a single zero
    and must not be written to or transferred as-is.
    """
    global _SHAPE_ONLY
    prev = _SHAPE_ONLY
    _SHAPE_ONLY = True
    try:
        yield
    finally:
        _SHAPE_ONLY = prev


def _randn(rng, shape, dtype, scale: float):
    """Host numpy array — stays on host until the model-level bulk
    device_put (one transfer for the whole tree instead of one per leaf,
    which matters enormously over a tunneled TPU)."""
    if _SHAPE_ONLY:
        return _np.broadcast_to(_np.zeros((), _np_dtype(dtype)), shape)
    gen = as_host_rng(rng)
    arr = gen.standard_normal(shape, dtype=_np.float32) * scale
    return _fast_cast(arr, dtype)


def init_linear(rng, din: int, dout: int, *, bias: bool = True, dtype=jnp.bfloat16):
    p = {"w": _randn(rng, (din, dout), dtype, 1.0 / math.sqrt(din))}
    if bias:
        p["b"] = _np.zeros((dout,), _np_dtype(dtype))
    return p


def init_conv(rng, kh: int, kw: int, cin: int, cout: int, *, dtype=jnp.bfloat16):
    fan_in = kh * kw * cin
    return {
        "w": _randn(rng, (kh, kw, cin, cout), dtype, 1.0 / math.sqrt(fan_in)),
        "b": _np.zeros((cout,), _np_dtype(dtype)),
    }


def init_norm(c: int, *, dtype=jnp.float32):
    return {
        "scale": _np.ones((c,), _np_dtype(dtype)),
        "bias": _np.zeros((c,), _np_dtype(dtype)),
    }


def _record_calibration(p, x) -> None:
    # active only inside quant/calibrate.py passes; one None-check hot
    from sfast_tpu.quant.calibrate import record_site

    record_site(p, x)


def apply_conv(p: Params, x: jax.Array, **kw) -> jax.Array:
    """Conv through a param dict — picks up W8A8 int8-quantized conv
    weights (``quant/dynamic_quant.quantize_conv_params``); ``a_scale``
    present selects the calibrated static-scale variant."""
    _record_calibration(p, x)
    if "w_q" in p and p["w_q"].ndim == 4:
        if "a_scale" in p:
            from sfast_tpu.ops.quant import conv2d_w8a8_static

            return conv2d_w8a8_static(
                x, p["w_q"], p["w_scale"], p["a_scale"], p.get("b"), **kw
            )
        from sfast_tpu.ops.quant import conv2d_w8a8

        return conv2d_w8a8(x, p["w_q"], p["w_scale"], p.get("b"), **kw)
    return conv2d(x, p["w"], p.get("b"), **kw)


def apply_linear(p: Params, x: jax.Array, act: Optional[str] = None) -> jax.Array:
    """Linear through a param dict — transparently picks up int8
    quantized weights (``quant/dynamic_quant.py``): ``w_q`` = W8A16
    (memory win), ``w_q8`` = W8A8 (full-int8 compute; + ``a_scale`` =
    calibrated static activation scale)."""
    _record_calibration(p, x)
    if "w_q8" in p:
        if "a_scale" in p:
            from sfast_tpu.ops.quant import linear_w8a8_static

            return linear_w8a8_static(
                x, p["w_q8"], p["w_scale"], p["a_scale"], p.get("b"), act=act
            )
        from sfast_tpu.ops.quant import linear_w8a8

        return linear_w8a8(x, p["w_q8"], p["w_scale"], p.get("b"), act=act)
    if "w_q" in p:
        from sfast_tpu.ops.quant import int8_linear

        return int8_linear(x, p["w_q"], p["w_scale"], p.get("b"), act=act)
    return linear(x, p["w"], p.get("b"), act=act)


def device_put_tree(params, device=None):
    """Fast host→device transfer of a large param tree.

    Per-leaf ``device_put`` costs one RPC each — ~0.5 s/leaf over a
    tunneled TPU, i.e. minutes for a 700-leaf UNet.  Instead: pack all
    leaves of each dtype into ONE contiguous host array, transfer it in a
    single copy (~1 GB/s), and carve the tree back out on device with one
    jitted slice/reshape program.
    """
    if device is None:
        device = jax.devices()[0]
    leaves, treedef = jax.tree_util.tree_flatten(params)

    by_dtype = {}
    metas = []  # (dtype_key, offset, shape) per leaf
    for leaf in leaves:
        arr = _np.asarray(leaf)
        key = str(arr.dtype)
        buf = by_dtype.setdefault(key, [])
        offset = sum(a.size for a in buf)
        metas.append((key, offset, arr.shape))
        buf.append(arr.reshape(-1))

    packed = {
        k: jax.device_put(_np.concatenate(v) if len(v) > 1 else v[0], device)
        for k, v in by_dtype.items()
    }

    def unpack(packed):
        out = []
        for key, offset, shape in metas:
            size = 1
            for s in shape:
                size *= s
            out.append(
                jax.lax.dynamic_slice(packed[key], (offset,), (size,)).reshape(shape)
            )
        return out

    new_leaves = jax.jit(unpack)(packed)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def tree_stack(trees):
    """Stack identically-shaped pytrees leaf-wise along a new leading
    axis — weight-stacking for ``lax.scan`` over iso-shaped blocks."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def tree_shape_sig(tree):
    """Hashable (treedef, leaf shape/dtype) signature: two subtrees with
    equal signatures can be weight-stacked and run under one scan body."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return (treedef, tuple((l.shape, jnp.result_type(l).name) for l in leaves))


def segment_iso_runs(items):
    """Partition a block list into maximal runs of identical shape
    signature: runs of ≥2 become ``{"scan": stacked}`` (one scan body →
    one codegen site), singles stay ``{"one": item}``.  The single
    grouping rule behind both ``unet_2d_condition.stack_iso_blocks`` and
    ``autoencoder_kl.stack_iso_decoder`` — their consumers promise the
    same unrolled-vs-stacked numerics, so the partition must not be able
    to diverge between them."""
    sigs = [tree_shape_sig(x) for x in items]
    segments = []
    j = 0
    while j < len(items):
        k = j + 1
        while k < len(items) and sigs[k] == sigs[j]:
            k += 1
        if k - j >= 2:
            segments.append({"scan": tree_stack(items[j:k])})
        else:
            segments.append({"one": items[j]})
        j = k
    return segments


# ---------------------------------------------------------------------------
# Timestep embeddings (diffusers Timesteps + TimestepEmbedding)
# ---------------------------------------------------------------------------


def sinusoidal_timestep_embedding(
    t: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """diffusers ``Timesteps`` semantics (SD: flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * t.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, [(0, 0), (0, 1)])
    return out


def init_time_embedding(
    rng,
    cin: int,
    time_dim: int,
    dtype=jnp.bfloat16,
    cond_proj_dim: Optional[int] = None,
) -> Params:
    gen = as_host_rng(rng)
    p = {
        "linear_1": init_linear(gen, cin, time_dim, dtype=dtype),
        "linear_2": init_linear(gen, time_dim, time_dim, dtype=dtype),
    }
    if cond_proj_dim is not None:
        # LCM guidance-embedding projection (diffusers TimestepEmbedding
        # cond_proj, bias-free): distilled LCM checkpoints condition the
        # UNet on an embedded guidance scale instead of CFG batching
        p["cond_proj"] = init_linear(
            gen, cond_proj_dim, cin, bias=False, dtype=dtype
        )
    return p


def time_embedding_fwd(
    p: Params, t_emb: jax.Array, cond: Optional[jax.Array] = None
) -> jax.Array:
    if cond is not None and "cond_proj" in p:
        t_emb = t_emb + apply_linear(p["cond_proj"], cond.astype(t_emb.dtype))
    h = apply_linear(p["linear_1"], t_emb, act="silu")
    return apply_linear(p["linear_2"], h)


def guidance_scale_embedding(
    w: jax.Array, dim: int, dtype=jnp.float32
) -> jax.Array:
    """Sinusoidal embedding of a guidance weight, matching diffusers'
    ``LatentConsistencyModelPipeline.get_guidance_scale_embedding``
    (w is scaled by 1000; half sin, half cos over log-spaced freqs).
    The caller passes ``w = guidance_scale - 1`` per the LCM paper.

    ``w`` may be a scalar or (B,); returns (B, dim)."""
    w = jnp.atleast_1d(w).astype(jnp.float32) * 1000.0
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb.astype(dtype)


def lcm_timestep_cond(guidance_scale, tcond_dim, batch: int):
    """The LCM ``timestep_cond`` input, or None without a cond_proj.

    One canonical site for the w-embedding convention (w = gs − 1 per
    the LCM paper, broadcast to the UNet batch): the fused-loop,
    fused-full and stepwise paths of BOTH SD and SDXL pipelines consume
    it, and they promise bit-identical latents — a convention change
    must not be able to diverge between them."""
    if tcond_dim is None:
        return None
    return jnp.broadcast_to(
        guidance_scale_embedding(guidance_scale - 1.0, tcond_dim),
        (batch, tcond_dim),
    )


# ---------------------------------------------------------------------------
# ResnetBlock2D
# ---------------------------------------------------------------------------


def init_resnet_block(
    rng, cin: int, cout: int, temb_dim: Optional[int], *, dtype=jnp.bfloat16
) -> Params:
    gen = as_host_rng(rng)
    p = {
        "norm1": init_norm(cin),
        "conv1": init_conv(gen, 3, 3, cin, cout, dtype=dtype),
        "norm2": init_norm(cout),
        "conv2": init_conv(gen, 3, 3, cout, cout, dtype=dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = init_linear(gen, temb_dim, cout, dtype=dtype)
    if cin != cout:
        p["conv_shortcut"] = init_conv(gen, 1, 1, cin, cout, dtype=dtype)
    return p


# Auto-rule cutover for routing a 3×3 conv through the fused Pallas
# kernel.  Measured on v5e (2026-08): XLA's conv lowering collapses as
# spatial×channel grows — 27-30 TF/s on the VAE's 512² convs AND on
# SDXL's 64²×640 resnets (~4x below roofline) — while inside the SD1.5
# UNet (64²×320 and smaller-spatial levels) XLA's stats-fused graph
# beats the kernel (18.3 vs 19.2+ ms/eval, three strategies tried).
# The regimes split on H·W and H·W·C together, not H·W alone.
# (A wider rule — 64²+ at >=640 channels, targeting SDXL's L1 where
# XLA's conv items trace at ~30 TF/s — was measured 2026-08-17 and
# LOSES in-context too: 133.7 vs 130.4 ms/eval.  The in-graph rule
# stays H·W >= 128² only.)
FUSED_CONV_MIN_HW = 16384            # 128²+: kernel (VAE, SDXL level 0)


def _fused_conv_ok(conv_p: Params, x: jax.Array, backend: Optional[str]) -> bool:
    if backend == "xla":
        return False
    if "w" not in conv_p or conv_p["w"].shape[:2] != (3, 3):
        return False  # quantized or non-3×3
    if x.dtype != jnp.bfloat16:
        return False
    if backend == "pallas":
        return True
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and x.shape[1] * x.shape[2] >= FUSED_CONV_MIN_HW


def resnet_block_fwd(
    p: Params,
    x: jax.Array,
    temb: Optional[jax.Array] = None,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    gn_backend: Optional[str] = None,
    conv_backend: Optional[str] = None,
    output_scale: float = 1.0,
) -> jax.Array:
    """diffusers ResnetBlock2D: GN+SiLU → conv → (+temb) → GN+SiLU → conv
    → +skip.  On TPU above the spatial threshold the whole block runs as
    TWO fused Pallas conv launches (``ops/conv_pallas.py``): conv1 folds
    the temb projection into a per-batch bias and emits its output's
    GroupNorm statistics in-kernel, conv2 consumes them and fuses the
    skip add + output scale — zero separate normalize/stats/elementwise
    passes.  Otherwise GN+SiLU (optionally the fused Pallas GN) and the
    XLA conv run separately."""
    fused = _fused_conv_ok(p["conv1"], x, conv_backend) and _fused_conv_ok(
        p["conv2"], x, conv_backend
    )
    if fused:
        from sfast_tpu.ops.conv_pallas import (
            affine_from_stats,
            conv3x3_block,
            gn_affine,
        )

        n, hh, ww, _ = x.shape
        sc1, sh1 = gn_affine(
            x, p["norm1"]["scale"], p["norm1"]["bias"], groups=groups, eps=eps
        )
        b1 = p["conv1"].get("b")
        fch = p["conv1"]["w"].shape[-1]
        bias_b = (
            jnp.zeros((fch,), jnp.float32) if b1 is None else b1
        ).astype(jnp.float32)[None, :]
        if temb is not None and "time_emb_proj" in p:
            te = apply_linear(
                p["time_emb_proj"],
                jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype),
            )
            bias_b = bias_b + te.astype(jnp.float32)
        else:
            bias_b = jnp.broadcast_to(bias_b, (n, fch))
        h, s1, s2 = conv3x3_block(
            x, p["conv1"]["w"], bias_batch=bias_b,
            gn_scale=sc1, gn_shift=sh1, emit_stats=True,
        )
        sc2, sh2 = affine_from_stats(
            s1, s2, hh * ww, p["norm2"]["scale"], p["norm2"]["bias"],
            groups=groups, eps=eps,
        )
        skip = x
        if "conv_shortcut" in p:
            skip = apply_conv(p["conv_shortcut"], x)
        return conv3x3_block(
            h, p["conv2"]["w"], p["conv2"].get("b"),
            gn_scale=sc2, gn_shift=sh2, residual=skip,
            output_scale=output_scale,
        )

    h = group_norm(
        x, p["norm1"]["scale"], p["norm1"]["bias"], groups=groups, eps=eps,
        act="silu", backend=gn_backend,
    )
    h = apply_conv(p["conv1"], h, padding=1)
    if temb is not None and "time_emb_proj" in p:
        te = apply_linear(
            p["time_emb_proj"],
            jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype),
        )
        h = h + te[:, None, None, :].astype(h.dtype)
    h = group_norm(
        h, p["norm2"]["scale"], p["norm2"]["bias"], groups=groups, eps=eps,
        act="silu", backend=gn_backend,
    )
    h = apply_conv(p["conv2"], h, padding=1)
    skip = x
    if "conv_shortcut" in p:
        skip = apply_conv(p["conv_shortcut"], x)
    out = (skip.astype(jnp.float32) + h.astype(jnp.float32)) / output_scale
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (multi-head, self or cross)
# ---------------------------------------------------------------------------


def init_attention(
    rng,
    dim: int,
    heads: int,
    *,
    context_dim: Optional[int] = None,
    qkv_bias: bool = False,
    dtype=jnp.bfloat16,
) -> Params:
    gen = as_host_rng(rng)
    ctx = context_dim or dim
    return {
        "to_q": init_linear(gen, dim, dim, bias=qkv_bias, dtype=dtype),
        "to_k": init_linear(gen, ctx, dim, bias=qkv_bias, dtype=dtype),
        "to_v": init_linear(gen, ctx, dim, bias=qkv_bias, dtype=dtype),
        "to_out": init_linear(gen, dim, dim, bias=True, dtype=dtype),
    }


def attention_fwd(
    p: Params,
    x: jax.Array,
    context: Optional[jax.Array] = None,
    *,
    heads: int,
    causal: bool = False,
    attn_backend: Optional[str] = None,
    ip_embeds: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
) -> jax.Array:
    """x: (B, S, D).  When the param dict carries ``ip_to_k``/``ip_to_v``
    (loaded by ``ip_adapter.load_ip_adapter``) and ``ip_embeds`` image
    tokens are passed, a second attention over the image tokens is added
    with ``ip_scale`` — the IP-Adapter decoupled-cross-attention processor
    (the reference supports it through its community examples,
    ``community/optimize_sd15_with_controlnet_and_ip_adapter.py``)."""
    b, s, d = x.shape
    ctx = x if context is None else context
    q = apply_linear(p["to_q"], x)
    k = apply_linear(p["to_k"], ctx)
    v = apply_linear(p["to_v"], ctx)
    dh = d // heads

    def split_heads(t):
        return t.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    out = dot_product_attention(
        split_heads(q), split_heads(k), split_heads(v),
        causal=causal, backend=attn_backend,
    )
    if ip_embeds is not None and "ip_to_k" in p:
        ek = apply_linear(p["ip_to_k"], ip_embeds.astype(x.dtype))
        ev = apply_linear(p["ip_to_v"], ip_embeds.astype(x.dtype))
        ip = dot_product_attention(
            split_heads(q), split_heads(ek), split_heads(ev),
            backend=attn_backend,
        )
        out = out + ip_scale * ip
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return apply_linear(p["to_out"], out)


# ---------------------------------------------------------------------------
# Feed-forward (GEGLU) and BasicTransformerBlock
# ---------------------------------------------------------------------------


def init_feed_forward(rng, dim: int, mult: int = 4, *, dtype=jnp.bfloat16) -> Params:
    gen = as_host_rng(rng)
    inner = dim * mult
    return {
        "proj": init_linear(gen, dim, inner * 2, dtype=dtype),  # GEGLU fused weight
        "out": init_linear(gen, inner, dim, dtype=dtype),
    }


def feed_forward_fwd(
    p: Params, x: jax.Array, *, geglu_backend: Optional[str] = None
) -> jax.Array:
    proj = p["proj"]
    if "w" not in proj:  # int8-quantized fused GEGLU weight
        y = apply_linear(proj, x)
        # diffusers GEGLU: hidden * gelu(gate), gate = SECOND chunk
        # (reference jit_pass_fuse_linear_geglu pattern binding)
        h_lin, gate = jnp.split(y, 2, axis=-1)
        h = (h_lin.astype(jnp.float32) *
             jax.nn.gelu(gate.astype(jnp.float32), approximate=False)
             ).astype(x.dtype)
    else:
        h = linear_geglu(x, proj["w"], proj.get("b"), backend=geglu_backend)
    return apply_linear(p["out"], h)


def init_transformer_block(
    rng,
    dim: int,
    heads: int,
    context_dim: int,
    *,
    dtype=jnp.bfloat16,
) -> Params:
    gen = as_host_rng(rng)
    return {
        "norm1": init_norm(dim),
        "attn1": init_attention(gen, dim, heads, dtype=dtype),
        "norm2": init_norm(dim),
        "attn2": init_attention(
            gen, dim, heads, context_dim=context_dim, dtype=dtype
        ),
        "norm3": init_norm(dim),
        "ff": init_feed_forward(gen, dim, dtype=dtype),
    }


def transformer_block_fwd(
    p: Params,
    x: jax.Array,
    context: jax.Array,
    *,
    heads: int,
    attn_backend: Optional[str] = None,
    geglu_backend: Optional[str] = None,
    ip_embeds: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
) -> jax.Array:
    """diffusers BasicTransformerBlock (pre-LN): self-attn, cross-attn,
    GEGLU feed-forward, all residual."""
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    x = x + attention_fwd(p["attn1"], h, heads=heads, attn_backend=attn_backend)
    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    x = x + attention_fwd(
        p["attn2"], h, context, heads=heads, attn_backend=attn_backend,
        ip_embeds=ip_embeds, ip_scale=ip_scale,
    )
    h = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"])
    x = x + feed_forward_fwd(p["ff"], h, geglu_backend=geglu_backend)
    return x


# ---------------------------------------------------------------------------
# Transformer2DModel (spatial transformer wrapper)
# ---------------------------------------------------------------------------


def init_spatial_transformer(
    rng,
    channels: int,
    heads: int,
    context_dim: int,
    *,
    depth: int = 1,
    use_linear_projection: bool = False,
    dtype=jnp.bfloat16,
) -> Params:
    gen = as_host_rng(rng)
    p = {
        "norm": init_norm(channels),
        "blocks": [
            init_transformer_block(gen, channels, heads, context_dim, dtype=dtype)
            for _ in range(depth)
        ],
    }
    if use_linear_projection:
        p["proj_in"] = init_linear(gen, channels, channels, dtype=dtype)
        p["proj_out"] = init_linear(gen, channels, channels, dtype=dtype)
    else:
        p["proj_in"] = init_conv(gen, 1, 1, channels, channels, dtype=dtype)
        p["proj_out"] = init_conv(gen, 1, 1, channels, channels, dtype=dtype)
    return p


def spatial_transformer_fwd(
    p: Params,
    x: jax.Array,
    context: jax.Array,
    *,
    heads: int,
    use_linear_projection: bool = False,
    gn_backend: Optional[str] = None,
    attn_backend: Optional[str] = None,
    geglu_backend: Optional[str] = None,
    ip_embeds: Optional[jax.Array] = None,
    ip_scale: float = 1.0,
) -> jax.Array:
    """diffusers Transformer2DModel over NHWC: GN(eps 1e-6) → proj_in →
    blocks over (B, HW, C) tokens → proj_out → +residual.

    In NHWC the NCHW↔(B,HW,C) permutes of the torch version are free
    reshapes — the layout win the reference chases with channels_last
    (``utils/memory_format.py``) is the default here.
    """
    b, hgt, wid, c = x.shape
    residual = x
    h = group_norm(
        x, p["norm"]["scale"], p["norm"]["bias"], groups=32, eps=1e-6,
        backend=gn_backend,
    )
    if use_linear_projection:
        h = h.reshape(b, hgt * wid, c)
        h = apply_linear(p["proj_in"], h)
    else:
        h = conv2d(h, p["proj_in"]["w"], p["proj_in"]["b"]).reshape(b, hgt * wid, c)
    blocks = p["blocks"]
    if isinstance(blocks, dict) and "_stacked" in blocks:
        # weight-stacked depth blocks (models/unet_2d_condition.py
        # stack_iso_blocks): ONE scan body instead of `depth` unrolled
        # copies — XLA emits the block's code once (SDXL level 2 has
        # depth 10 at three sites; unrolled it dominates compile time
        # and executable size)
        def _depth_body(hh, bp):
            hh = transformer_block_fwd(
                bp, hh, context, heads=heads, attn_backend=attn_backend,
                geglu_backend=geglu_backend, ip_embeds=ip_embeds,
                ip_scale=ip_scale,
            )
            return hh, None

        h, _ = jax.lax.scan(_depth_body, h, blocks["_stacked"])
    else:
        for blk in blocks:
            h = transformer_block_fwd(
                blk, h, context, heads=heads, attn_backend=attn_backend,
                geglu_backend=geglu_backend, ip_embeds=ip_embeds,
                ip_scale=ip_scale,
            )
    if use_linear_projection:
        h = apply_linear(p["proj_out"], h)
        h = h.reshape(b, hgt, wid, c)
    else:
        h = conv2d(h.reshape(b, hgt, wid, c), p["proj_out"]["w"], p["proj_out"]["b"])
    return h + residual


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


def init_downsample(rng, c: int, *, dtype=jnp.bfloat16) -> Params:
    return {"conv": init_conv(rng, 3, 3, c, c, dtype=dtype)}


def downsample_fwd(p: Params, x: jax.Array) -> jax.Array:
    return apply_conv(p["conv"], x, stride=2, padding=1)


def init_upsample(rng, c: int, *, dtype=jnp.bfloat16) -> Params:
    return {"conv": init_conv(rng, 3, 3, c, c, dtype=dtype)}


def upsample_fwd(
    p: Params, x: jax.Array, *, conv_backend: Optional[str] = None
) -> jax.Array:
    b, h, w, c = x.shape
    # nearest-neighbor 2x without gather: broadcast + reshape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    x = x.reshape(b, h * 2, w * 2, c)
    # The post-upsample convs are where XLA's conv lowering is at its
    # worst (27 TF/s at the VAE's 512²×256 shape, measured 2026-08); the
    # Pallas kernel's pad materialization also absorbs the NN-upsample
    # broadcast for free.
    if _fused_conv_ok(p["conv"], x, conv_backend):
        from sfast_tpu.ops.conv_pallas import conv3x3_gn_silu

        return conv3x3_gn_silu(x, p["conv"]["w"], p["conv"].get("b"))
    return apply_conv(p["conv"], x, padding=1)
