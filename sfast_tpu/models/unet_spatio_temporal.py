"""UNetSpatioTemporalConditionModel — the SVD video UNet.

Mirror of diffusers' SVD UNet (the reference's SVD support enters through
``compile`` handling ``image_encoder`` + the UNet/VAE swap,
``diffusion_pipeline_compiler.py:96-118``, and the SVD example
``examples/optimize_stable_video_diffusion_pipeline.py``; SVD-XT e2e is a
headline number, BASELINE.md row 2).

Structure per block: every resnet is a SpatioTemporalResBlock — a spatial
ResnetBlock2D over each frame plus a temporal resnet (3×1×1 conv over the
frame axis) blended by a learned AlphaBlender; every attention is a
TransformerSpatioTemporalModel — spatial transformer blocks (self-attn
over pixels, cross-attn over the CLIP image embedding) interleaved with
temporal transformer blocks (attention over frames per pixel) behind a
frame-position embedding, also alpha-blended.

TPU layout: frames are folded into the batch for all spatial ops
((B·F, H, W, C) NHWC); temporal ops view (B, F, ...) and attend over F
(tiny sequences — XLA attention path).  The whole video denoise step is
one executable.
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.models.unet_2d_condition import _backends
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.group_norm import group_norm
from sfast_tpu.ops.layer_norm import layer_norm


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    sample_size: int = 96
    in_channels: int = 8  # 4 noisy + 4 conditioning-frame latents
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768  # fps, motion, aug ×256
    num_frames: int = 25
    norm_num_groups: int = 32
    dtype: Any = jnp.bfloat16

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SVD_UNET = SVDUNetConfig()
TINY_SVD_UNET = SVDUNetConfig(
    sample_size=16,
    block_out_channels=(32, 64),
    down_block_types=(
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    ),
    up_block_types=(
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    ),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_heads=(4, 4),
    cross_attention_dim=32,
    projection_class_embeddings_input_dim=3 * 32,
    addition_time_embed_dim=32,
    num_frames=4,
    norm_num_groups=8,
    dtype=jnp.float32,
)


# ---------------------------------------------------------------------------
# temporal building blocks
# ---------------------------------------------------------------------------


def _init_temporal_resnet(gen, c: int, temb_dim: Optional[int], dtype):
    # temporal convs are stored as 4-D (3, 1, C, C) kernels applied over
    # a folded (F, H·W) plane — mathematically identical to diffusers'
    # Conv3d(3,1,1) (the kernel is spatially 1×1, so frames convolve
    # independently of pixels), and it routes them through
    # ``layers.apply_conv``: the W8A8 transform (4-D sites) and the bf16
    # output-buffer default apply to the video loop's temporal convs too.
    p = {
        "norm1": L.init_norm(c),
        "conv1": {
            "w": L._randn(gen, (3, 1, c, c), dtype, 1.0 / (3 * c) ** 0.5),
            "b": jnp.zeros((c,), dtype),
        },
        "norm2": L.init_norm(c),
        "conv2": {
            "w": L._randn(gen, (3, 1, c, c), dtype, 1.0 / (3 * c) ** 0.5),
            "b": jnp.zeros((c,), dtype),
        },
    }
    if temb_dim is not None:
        p["time_emb_proj"] = L.init_linear(gen, temb_dim, c, dtype=dtype)
    return p


def _conv_temporal(x5, w, b):
    """x5: (B, F, H, W, C); w: (3,1,1,C,C) — conv over the frame axis.
    Kept for the temporal VAE's 5-D ``time_conv_out``
    (autoencoder_kl_temporal.py); the SVD UNet's temporal resnets use
    the quantizable 4-D form (:func:`_conv_temporal2d`)."""
    y = jax.lax.conv_general_dilated(
        x5,
        w,
        window_strides=(1, 1, 1),
        padding=[(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x5.dtype)


def _conv_temporal2d(p, x5):
    """Frame-axis conv via the 2-D conv stack: fold pixels into one axis
    ((B, F, H·W, C)), convolve with the (3, 1, C, C) kernel, unfold.
    Goes through ``apply_conv`` so int8 (W8A8) weights are picked up."""
    b, f, hh, ww, c = x5.shape
    y = L.apply_conv(
        p, x5.reshape(b, f, hh * ww, c), padding=[(1, 1), (0, 0)]
    )
    return y.reshape(b, f, hh, ww, y.shape[-1])


def _gn_over_frames(x5, norm_p, *, groups, gn_backend):
    """GroupNorm of a (B, F, H, W, C) video, with statistics over
    (C/G, F, H, W) per sample — diffusers' TemporalResnetBlock applies
    torch GroupNorm to (B, C, F, H, W), so frames share the statistics.
    Folding F into a spatial axis makes the NHWC kernel compute the same
    reduction (normalizing per-frame instead is a silent numerics bug)."""
    b, f, hh, ww, c = x5.shape
    h = group_norm(
        x5.reshape(b, f * hh, ww, c),
        norm_p["scale"], norm_p["bias"], groups=groups, act="silu",
        backend=gn_backend,
    )
    return h.reshape(b, f, hh, ww, c)


def _temporal_resnet_fwd(p, x5, temb=None, *, groups, gn_backend):
    b, f, hh, ww, c = x5.shape
    h = _gn_over_frames(x5, p["norm1"], groups=groups, gn_backend=gn_backend)
    h = _conv_temporal2d(p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        te = L.apply_linear(
            p["time_emb_proj"],
            jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype),
        )  # (B*F, C)
        h = h + te.reshape(b, f, 1, 1, c).astype(h.dtype)
    h = _gn_over_frames(h, p["norm2"], groups=groups, gn_backend=gn_backend)
    h = _conv_temporal2d(p["conv2"], h)
    return x5 + h


def _alpha(p):
    """AlphaBlender 'learned' strategy: alpha = sigmoid(mix_factor);
    output = alpha·spatial + (1-alpha)·temporal."""
    return jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32))


def _init_st_resnet(gen, cin, cout, temb_dim, dtype):
    return {
        "spatial": L.init_resnet_block(gen, cin, cout, temb_dim, dtype=dtype),
        "temporal": _init_temporal_resnet(gen, cout, temb_dim, dtype),
        "mix_factor": jnp.asarray(0.5, jnp.float32),
    }


def _st_resnet_fwd(p, x, temb, *, num_frames, groups, gn_backend):
    """x: (B·F, H, W, C_in) → (B·F, H, W, C_out)."""
    h = L.resnet_block_fwd(p["spatial"], x, temb, groups=groups, gn_backend=gn_backend)
    bf, hh, ww, c = h.shape
    b = bf // num_frames
    h5 = h.reshape(b, num_frames, hh, ww, c)
    t5 = _temporal_resnet_fwd(
        p["temporal"], h5, temb, groups=groups, gn_backend=gn_backend
    )
    a = _alpha(p)
    out = a * h5.astype(jnp.float32) + (1 - a) * t5.astype(jnp.float32)
    return out.astype(x.dtype).reshape(bf, hh, ww, c)


def _init_temporal_transformer_block(gen, dim, heads, context_dim, dtype):
    return {
        "norm_in": L.init_norm(dim),
        "ff_in": L.init_feed_forward(gen, dim, dtype=dtype),
        "norm1": L.init_norm(dim),
        "attn1": L.init_attention(gen, dim, heads, dtype=dtype),
        "norm2": L.init_norm(dim),
        "attn2": L.init_attention(gen, dim, heads, context_dim=context_dim, dtype=dtype),
        "norm3": L.init_norm(dim),
        "ff": L.init_feed_forward(gen, dim, dtype=dtype),
    }


def _temporal_transformer_block_fwd(p, x, context, *, heads, attn_backend, geglu_backend):
    """x: (B·HW, F, C) — attention over frames."""
    h = layer_norm(x, p["norm_in"]["scale"], p["norm_in"]["bias"])
    x = x + L.feed_forward_fwd(p["ff_in"], h, geglu_backend=geglu_backend)
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    x = x + L.attention_fwd(p["attn1"], h, heads=heads, attn_backend=attn_backend)
    if context is not None:
        h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
        x = x + L.attention_fwd(
            p["attn2"], h, context, heads=heads, attn_backend=attn_backend
        )
    h = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"])
    x = x + L.feed_forward_fwd(p["ff"], h, geglu_backend=geglu_backend)
    return x


def _init_st_transformer(gen, channels, heads, context_dim, depth, time_embed_in, dtype):
    return {
        "norm": L.init_norm(channels),
        "proj_in": L.init_linear(gen, channels, channels, dtype=dtype),
        "blocks": [
            L.init_transformer_block(gen, channels, heads, context_dim, dtype=dtype)
            for _ in range(depth)
        ],
        "temporal_blocks": [
            _init_temporal_transformer_block(gen, channels, heads, context_dim, dtype)
            for _ in range(depth)
        ],
        "time_pos_embed": L.init_time_embedding(gen, time_embed_in, channels, dtype=dtype),
        "proj_out": L.init_linear(gen, channels, channels, dtype=dtype),
        "mix_factor": jnp.asarray(0.5, jnp.float32),
    }


def _st_transformer_fwd(
    p, x, context, *, num_frames, heads, be,
):
    """x: (B·F, H, W, C); context: (B·F, S, D_ctx) image-embedding tokens."""
    bf, hh, ww, c = x.shape
    b = bf // num_frames
    residual = x
    h = group_norm(
        x, p["norm"]["scale"], p["norm"]["bias"], groups=32, eps=1e-6,
        backend=be["gn"],
    )
    h = h.reshape(bf, hh * ww, c)
    h = L.apply_linear(p["proj_in"], h)

    # frame-position embedding added before temporal attention
    f_idx = jnp.arange(num_frames, dtype=jnp.float32)
    t_emb = L.sinusoidal_timestep_embedding(f_idx, p_time_dim(p)).astype(x.dtype)
    t_emb = L.time_embedding_fwd(p["time_pos_embed"], t_emb)  # (F, C)

    # temporal context: mean over the per-frame context tokens, one per video
    time_context = None
    if context is not None:
        ctx5 = context.reshape(b, num_frames, *context.shape[1:])
        time_context = jnp.repeat(
            ctx5[:, 0], hh * ww, axis=0
        )  # (B·HW, S, D)

    a = _alpha(p)
    for blk, tblk in zip(p["blocks"], p["temporal_blocks"]):
        h = L.transformer_block_fwd(
            blk, h, context, heads=heads,
            attn_backend=be["attn"], geglu_backend=be["geglu"],
        )
        # (B·F, HW, C) → (B·HW, F, C)
        ht = h.reshape(b, num_frames, hh * ww, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(b * hh * ww, num_frames, c)
        ht = ht + t_emb[None, :, :]
        ht = _temporal_transformer_block_fwd(
            tblk, ht, time_context, heads=heads,
            attn_backend=be["attn"], geglu_backend=be["geglu"],
        )
        ht = ht.reshape(b, hh * ww, num_frames, c).transpose(0, 2, 1, 3)
        ht = ht.reshape(bf, hh * ww, c)
        h = (a * h.astype(jnp.float32) + (1 - a) * ht.astype(jnp.float32)).astype(
            x.dtype
        )

    h = L.apply_linear(p["proj_out"], h)
    return h.reshape(bf, hh, ww, c) + residual


def p_time_dim(p) -> int:
    return p["time_pos_embed"]["linear_1"]["w"].shape[0]


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init_svd_unet_params(rng, cfg: SVDUNetConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    n = len(cfg.block_out_channels)

    p: dict = {
        "conv_in": L.init_conv(gen, 3, 3, cfg.in_channels, cfg.block_out_channels[0], dtype=dt),
        "time_embedding": L.init_time_embedding(
            gen, cfg.block_out_channels[0], cfg.time_embed_dim, dtype=dt
        ),
        "add_embedding": L.init_time_embedding(
            gen, cfg.projection_class_embeddings_input_dim, cfg.time_embed_dim, dtype=dt
        ),
    }

    down = []
    c_out = cfg.block_out_channels[0]
    for i, btype in enumerate(cfg.down_block_types):
        c_in, c_out = c_out, cfg.block_out_channels[i]
        blk = {
            "resnets": [
                _init_st_resnet(
                    gen, c_in if j == 0 else c_out, c_out, cfg.time_embed_dim, dt
                )
                for j in range(cfg.layers_per_block)
            ]
        }
        if btype.startswith("CrossAttn"):
            blk["attentions"] = [
                _init_st_transformer(
                    gen, c_out, cfg.num_heads[i], cfg.cross_attention_dim,
                    cfg.transformer_layers_per_block[i], c_out, dt,
                )
                for _ in range(cfg.layers_per_block)
            ]
        if i != n - 1:
            blk["downsample"] = L.init_downsample(gen, c_out, dtype=dt)
        down.append(blk)
    p["down_blocks"] = down

    c_mid = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnets": [
            _init_st_resnet(gen, c_mid, c_mid, cfg.time_embed_dim, dt)
            for _ in range(2)
        ],
        "attentions": [
            _init_st_transformer(
                gen, c_mid, cfg.num_heads[-1], cfg.cross_attention_dim,
                cfg.transformer_layers_per_block[-1], c_mid, dt,
            )
        ],
    }

    up = []
    rev = list(reversed(cfg.block_out_channels))
    c_prev = rev[0]
    for i, btype in enumerate(cfg.up_block_types):
        c_out = rev[i]
        c_skip_in = rev[min(i + 1, n - 1)]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            res_skip = c_skip_in if j == cfg.layers_per_block else c_out
            res_in = c_prev if j == 0 else c_out
            resnets.append(
                _init_st_resnet(gen, res_in + res_skip, c_out, cfg.time_embed_dim, dt)
            )
        blk = {"resnets": resnets}
        if btype.startswith("CrossAttn"):
            level = n - 1 - i
            blk["attentions"] = [
                _init_st_transformer(
                    gen, c_out, cfg.num_heads[level], cfg.cross_attention_dim,
                    cfg.transformer_layers_per_block[level], c_out, dt,
                )
                for _ in range(cfg.layers_per_block + 1)
            ]
        if i != n - 1:
            blk["upsample"] = L.init_upsample(gen, c_out, dtype=dt)
        up.append(blk)
        c_prev = c_out
    p["up_blocks"] = up

    p["conv_norm_out"] = L.init_norm(cfg.block_out_channels[0])
    p["conv_out"] = L.init_conv(gen, 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype=dt)
    return p


def svd_unet_fwd(
    cfg: SVDUNetConfig,
    ccfg: CompilationConfig,
    params,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    added_time_ids: jax.Array,
) -> jax.Array:
    """sample: (B, F, H, W, C_in); encoder_hidden_states: (B, 1, D_ctx)
    CLIP image embedding; added_time_ids: (B, 3) = (fps, motion_bucket_id,
    noise_aug_strength).  Returns (B, F, H, W, 4)."""
    be = _backends(ccfg)
    groups = cfg.norm_num_groups
    b, f, hh, ww, cin = sample.shape
    n = len(cfg.block_out_channels)

    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (b,))
    t_emb = L.sinusoidal_timestep_embedding(
        timesteps, cfg.block_out_channels[0]
    ).astype(cfg.dtype)
    emb = L.time_embedding_fwd(params["time_embedding"], t_emb)  # (B, T)

    add_emb_in = L.sinusoidal_timestep_embedding(
        added_time_ids.reshape(-1), cfg.addition_time_embed_dim
    ).reshape(b, -1).astype(cfg.dtype)
    emb = emb + L.time_embedding_fwd(params["add_embedding"], add_emb_in)
    # per-frame time embedding (frames share the video's embedding)
    emb = jnp.repeat(emb, f, axis=0)  # (B·F, T)

    # context per frame
    context = jnp.repeat(
        encoder_hidden_states.astype(cfg.dtype), f, axis=0
    )  # (B·F, S, D)

    h = conv2d(
        sample.reshape(b * f, hh, ww, cin).astype(cfg.dtype),
        params["conv_in"]["w"], params["conv_in"]["b"], padding=1,
    )

    res_stack = [h]
    for i, blk in enumerate(params["down_blocks"]):
        has_attn = "attentions" in blk
        for j, rn in enumerate(blk["resnets"]):
            h = _st_resnet_fwd(
                rn, h, emb, num_frames=f, groups=groups, gn_backend=be["gn"]
            )
            if has_attn:
                h = _st_transformer_fwd(
                    blk["attentions"][j], h, context,
                    num_frames=f, heads=cfg.num_heads[i], be=be,
                )
            res_stack.append(h)
        if "downsample" in blk:
            h = L.downsample_fwd(blk["downsample"], h)
            res_stack.append(h)

    mid = params["mid_block"]
    h = _st_resnet_fwd(mid["resnets"][0], h, emb, num_frames=f, groups=groups, gn_backend=be["gn"])
    h = _st_transformer_fwd(
        mid["attentions"][0], h, context, num_frames=f, heads=cfg.num_heads[-1], be=be
    )
    h = _st_resnet_fwd(mid["resnets"][1], h, emb, num_frames=f, groups=groups, gn_backend=be["gn"])

    for i, blk in enumerate(params["up_blocks"]):
        has_attn = "attentions" in blk
        level = n - 1 - i
        for j, rn in enumerate(blk["resnets"]):
            res = res_stack.pop()
            h = jnp.concatenate([h, res.astype(h.dtype)], axis=-1)
            h = _st_resnet_fwd(
                rn, h, emb, num_frames=f, groups=groups, gn_backend=be["gn"]
            )
            if has_attn:
                h = _st_transformer_fwd(
                    blk["attentions"][j], h, context,
                    num_frames=f, heads=cfg.num_heads[level], be=be,
                )
        if "upsample" in blk:
            h = L.upsample_fwd(blk["upsample"], h)

    h = group_norm(
        h, params["conv_norm_out"]["scale"], params["conv_norm_out"]["bias"],
        groups=groups, act="silu", backend=be["gn"],
    )
    h = conv2d(h, params["conv_out"]["w"], params["conv_out"]["b"], padding=1)
    return h.reshape(b, f, hh, ww, cfg.out_channels)


def create_svd_unet(
    cfg: SVDUNetConfig = SVD_UNET, rng: Optional[jax.Array] = None, params=None
) -> Model:
    if params is None:
        params = L.device_put_tree(
            init_svd_unet_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    return Model(config=cfg, params=params, forward=svd_unet_fwd, name="unet")
