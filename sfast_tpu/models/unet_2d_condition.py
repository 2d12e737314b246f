"""UNet2DConditionModel — pure-JAX mirror of the diffusers UNet used by
SD1.5 / SD2.x / SDXL (+ControlNet residual inputs, +IP-Adapter hooks).

The reference gets this architecture for free by tracing torch diffusers
(``compilers/diffusion_pipeline_compiler.py:127-151``); here the forward
is re-implemented TPU-first: NHWC throughout, fused
GroupNorm+SiLU / flash-attention / GEGLU Pallas ops, weights as a pytree
argument (LoRA hot-swap without retrace).

Config notes mirroring diffusers quirks:

- ``num_heads`` per resolution level follows diffusers' legacy
  ``attention_head_dim``-is-actually-num-heads behavior for SD1.5
  (heads=8 → head_dim 40/80/160) and per-level head counts for SDXL
  (5/10/20 → head_dim 64).
- ``addition_embed_type='text_time'`` implements the SDXL micro-
  conditioning (add_text_embeds + add_time_ids → MLP added to temb).
- ControlNet enters as ``down_block_additional_residuals`` /
  ``mid_block_additional_residual`` exactly like diffusers, so the
  compiled ControlNet graph feeds this one (reference compiles
  ``m.controlnet`` the same way it compiles the UNet, ``dpc.py:89-90``).
"""

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.group_norm import group_norm
from sfast_tpu.ops.linear import linear


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    addition_embed_type: Optional[str] = None  # None | 'text_time' (SDXL)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: Optional[int] = None  # SDXL: 2816
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # LCM distilled checkpoints (e.g. SimianLuo/LCM_Dreamshaper_v7):
    # width of the guidance-scale embedding projected into the time
    # embedding via time_embedding.cond_proj (diffusers
    # UNet2DConditionModel(time_cond_proj_dim=256)); forward then takes
    # ``timestep_cond`` and the pipeline skips CFG batching entirely
    time_cond_proj_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


# Preset configs matching the HF checkpoints the reference targets.
SD15_UNET = UNetConfig()
SD21_UNET = dataclasses.replace(
    SD15_UNET,
    cross_attention_dim=1024,
    num_heads=(5, 10, 20, 20),
    use_linear_projection=True,
)
SDXL_UNET = UNetConfig(
    sample_size=128,
    block_out_channels=(320, 640, 1280),
    down_block_types=(
        "DownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
    ),
    up_block_types=(
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "UpBlock2D",
    ),
    transformer_layers_per_block=(1, 2, 10),
    num_heads=(5, 10, 20),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type="text_time",
    projection_class_embeddings_input_dim=2816,
)
# Tiny config for CPU tests (structure-identical to SD15).
TINY_UNET = UNetConfig(
    sample_size=16,
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_heads=(4, 4),
    cross_attention_dim=32,
    norm_num_groups=8,
    dtype=jnp.float32,
)


def init_unet_params(rng, cfg: UNetConfig):
    dt = cfg.dtype
    n_blocks = len(cfg.block_out_channels)
    gen = L.as_host_rng(rng)
    keys = iter(lambda: gen, None)  # infinite host-rng stream

    p: dict = {
        "conv_in": L.init_conv(
            next(keys), 3, 3, cfg.in_channels, cfg.block_out_channels[0], dtype=dt
        ),
        "time_embedding": L.init_time_embedding(
            next(keys),
            cfg.block_out_channels[0],
            cfg.time_embed_dim,
            dtype=dt,
            cond_proj_dim=cfg.time_cond_proj_dim,
        ),
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = L.init_time_embedding(
            next(keys),
            cfg.projection_class_embeddings_input_dim,
            cfg.time_embed_dim,
            dtype=dt,
        )

    # Down blocks
    down = []
    c_out = cfg.block_out_channels[0]
    for i, btype in enumerate(cfg.down_block_types):
        c_in = c_out
        c_out = cfg.block_out_channels[i]
        is_final = i == n_blocks - 1
        blk = {
            "resnets": [
                L.init_resnet_block(
                    next(keys),
                    c_in if j == 0 else c_out,
                    c_out,
                    cfg.time_embed_dim,
                    dtype=dt,
                )
                for j in range(cfg.layers_per_block)
            ]
        }
        if btype == "CrossAttnDownBlock2D":
            blk["attentions"] = [
                L.init_spatial_transformer(
                    next(keys),
                    c_out,
                    cfg.num_heads[i],
                    cfg.cross_attention_dim,
                    depth=cfg.transformer_layers_per_block[i],
                    use_linear_projection=cfg.use_linear_projection,
                    dtype=dt,
                )
                for _ in range(cfg.layers_per_block)
            ]
        if not is_final:
            blk["downsample"] = L.init_downsample(next(keys), c_out, dtype=dt)
        down.append(blk)
    p["down_blocks"] = down

    # Mid block
    c_mid = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnets": [
            L.init_resnet_block(next(keys), c_mid, c_mid, cfg.time_embed_dim, dtype=dt)
            for _ in range(2)
        ],
        "attentions": [
            L.init_spatial_transformer(
                next(keys),
                c_mid,
                cfg.num_heads[-1],
                cfg.cross_attention_dim,
                depth=cfg.transformer_layers_per_block[-1],
                use_linear_projection=cfg.use_linear_projection,
                dtype=dt,
            )
        ],
    }

    # Up blocks
    up = []
    rev_out = list(reversed(cfg.block_out_channels))
    c_prev = rev_out[0]
    for i, btype in enumerate(cfg.up_block_types):
        c_out = rev_out[i]
        c_skip_in = rev_out[min(i + 1, n_blocks - 1)]
        is_final = i == n_blocks - 1
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            res_skip = c_skip_in if j == cfg.layers_per_block else c_out
            res_in = c_prev if j == 0 else c_out
            resnets.append(
                L.init_resnet_block(
                    next(keys), res_in + res_skip, c_out, cfg.time_embed_dim, dtype=dt
                )
            )
        blk = {"resnets": resnets}
        if btype == "CrossAttnUpBlock2D":
            level = n_blocks - 1 - i  # head count indexed by resolution level
            blk["attentions"] = [
                L.init_spatial_transformer(
                    next(keys),
                    c_out,
                    cfg.num_heads[level],
                    cfg.cross_attention_dim,
                    depth=cfg.transformer_layers_per_block[level],
                    use_linear_projection=cfg.use_linear_projection,
                    dtype=dt,
                )
                for _ in range(cfg.layers_per_block + 1)
            ]
        if not is_final:
            blk["upsample"] = L.init_upsample(next(keys), c_out, dtype=dt)
        up.append(blk)
        c_prev = c_out
    p["up_blocks"] = up

    p["conv_norm_out"] = L.init_norm(cfg.block_out_channels[0])
    p["conv_out"] = L.init_conv(
        next(keys), 3, 3, cfg.block_out_channels[0], cfg.out_channels, dtype=dt
    )
    return p


def stack_iso_blocks(params):
    """Weight-stack consecutive iso-shaped (resnet, attention) pairs and
    transformer depth blocks so ``unet_fwd`` runs them under ``lax.scan``.

    Why: XLA TPU codegen emits 1.8–2.8 MB of machine code PER 3×3 conv
    call site and does not share code between identical sites (measured,
    ``benchmarks/analyze_exec_size_ops.py``) — the unrolled SD1.5 UNet
    compiles to a ~374 MB executable in ~135 s.  Stacking the iso runs
    (SD1.5: both level-0 down pairs, both level-3 down resnets, all three
    up resnets at levels 0/1, the last two at levels 2/3; SDXL adds the
    depth-10 transformer stacks) makes XLA emit each run's body ONCE.
    The reference has no analog: CUDA graphs replay recorded kernels, so
    it never pays per-call-site code generation.

    Apply ONCE per executable, after ``maybe_unpack`` and OUTSIDE the
    denoise loop (stacking is a weight copy; inside the loop body it
    would re-run every step).  ``unet_fwd`` consumes the transformed
    pytree via the per-block ``"segments"`` key; untransformed params
    take the original unrolled path.

    Measured (v5e, SD1.5 512² 50-step fused, two same-session A/B pairs
    2026-08-19): e2e +40 ms/image (1050.6 → 1090.8; scan boundaries
    block the same cross-block fusions `xla_tpu_enable_deduplicated_
    calls` does, which costs the same +35-40 ms) but warm-start compile
    −44% (488.5 → 274.2 s and 560.3 → 338.0 s adjacent-run warmups).
    DEFAULT OFF; `SFAST_TPU_STACK_ISO=1` is the structural warm-start
    knob for serving starts, strictly better than the dedup flag (same
    e2e cost, bigger compile-time cut, and composable with it)."""

    def _stack_depth(attn):
        blocks = attn.get("blocks")
        if isinstance(blocks, list) and len(blocks) >= 2:
            attn = dict(attn)
            attn["blocks"] = {"_stacked": L.tree_stack(blocks)}
        return attn

    out = dict(params)
    for key in ("down_blocks", "up_blocks"):
        new_blocks = []
        for blk in params[key]:
            resnets = blk["resnets"]
            attns = blk.get("attentions")
            pairs = []
            for j in range(len(resnets)):
                pair = {"resnet": resnets[j]}
                if attns is not None:
                    pair["attention"] = _stack_depth(attns[j])
                pairs.append(pair)
            nblk = {"segments": L.segment_iso_runs(pairs)}
            for extra in ("downsample", "upsample"):
                if extra in blk:
                    nblk[extra] = blk[extra]
            new_blocks.append(nblk)
        out[key] = new_blocks
    if "mid_block" in out:
        mid = dict(out["mid_block"])
        mid["attentions"] = [_stack_depth(a) for a in mid["attentions"]]
        out["mid_block"] = mid
    return out


def maybe_stack_iso(params):
    """``stack_iso_blocks`` gated by ``SFAST_TPU_STACK_ISO=1`` (read at
    trace time, so flipping the env after import works; the flag is
    folded into the exec-cache fingerprint like every program-changing
    ``SFAST_TPU_*`` var — runtime/exec_cache.py)."""
    import os

    if os.environ.get("SFAST_TPU_STACK_ISO", "0") == "1":
        return stack_iso_blocks(params)
    return params


def _backends(ccfg: CompilationConfig):
    """Map config knobs → op backend selections (None = per-op auto)."""
    if not ccfg.enable_pallas:
        return dict(gn="xla", attn="xla", geglu="xla", conv="xla")
    gn = "pallas" if ccfg.enable_fused_group_norm else None
    # fallback False: the dataclass default is opt-in (config.py), so a
    # duck-typed config missing the attr must not silently enable it
    conv = None if getattr(ccfg, "enable_fused_conv", False) else "xla"
    mesh = getattr(ccfg, "mesh", None)
    if (
        mesh is not None
        and "sp" in getattr(mesh, "axis_names", ())
        and mesh.shape["sp"] > 1
    ):
        # sequence-parallel: shard the self-attention sequence over the
        # 'sp' mesh axis (ring attention via ppermute) — the long-context
        # path for videos/resolutions that exceed one chip's HBM
        attn = ("ring", mesh, "sp")
    elif not ccfg.enable_flash_attention:
        attn = "xla"
    elif getattr(ccfg, "enable_int8_attention", False):
        attn = "int8"  # auto rule, int8 flash above the length threshold
    else:
        attn = None
    geglu = None if ccfg.enable_fused_linear_geglu else "xla"
    return dict(gn=gn, attn=attn, geglu=geglu, conv=conv)


def unet_fwd(
    cfg: UNetConfig,
    ccfg: CompilationConfig,
    params,
    sample: jax.Array,
    timesteps: jax.Array,
    encoder_hidden_states: jax.Array,
    *,
    added_cond_kwargs: Optional[dict] = None,
    timestep_cond: Optional[jax.Array] = None,
    down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
    mid_block_additional_residual: Optional[jax.Array] = None,
    ip_adapter_embeds: Optional[jax.Array] = None,
    ip_adapter_scale: float = 1.0,
) -> jax.Array:
    """sample: (B, H, W, C_in) NHWC latents; timesteps: () or (B,);
    encoder_hidden_states: (B, S, cross_dim); timestep_cond: optional
    (B, time_cond_proj_dim) LCM guidance embedding (diffusers
    ``unet(..., timestep_cond=w_embedding)``).  Returns predicted noise
    (B, H, W, C_out)."""
    be = _backends(ccfg)
    groups = cfg.norm_num_groups
    n_blocks = len(cfg.block_out_channels)

    # 1. time embedding
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
    t_emb = L.sinusoidal_timestep_embedding(
        timesteps,
        cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos,
        freq_shift=cfg.freq_shift,
    ).astype(cfg.dtype)
    emb = L.time_embedding_fwd(
        params["time_embedding"], t_emb, cond=timestep_cond
    )

    if cfg.addition_embed_type == "text_time":
        ac = added_cond_kwargs or {}
        text_embeds = ac["text_embeds"]  # (B, pooled_dim)
        time_ids = ac["time_ids"]  # (B, 6)
        t_ids = L.sinusoidal_timestep_embedding(
            time_ids.reshape(-1),
            cfg.addition_time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            freq_shift=cfg.freq_shift,
        ).reshape(text_embeds.shape[0], -1)
        add_emb = jnp.concatenate(
            [text_embeds.astype(jnp.float32), t_ids], axis=-1
        ).astype(cfg.dtype)
        emb = emb + L.time_embedding_fwd(params["add_embedding"], add_emb)

    context = encoder_hidden_states.astype(cfg.dtype)

    attn_kw = dict(
        use_linear_projection=cfg.use_linear_projection,
        gn_backend=be["gn"],
        attn_backend=be["attn"],
        geglu_backend=be["geglu"],
        ip_embeds=ip_adapter_embeds,
        ip_scale=ip_adapter_scale,
    )

    # 2. conv_in
    h = conv2d(
        sample.astype(cfg.dtype), params["conv_in"]["w"], params["conv_in"]["b"],
        padding=1,
    )

    def _pair_fwd(pair, hh, level):
        hh = L.resnet_block_fwd(
            pair["resnet"], hh, emb, groups=groups, gn_backend=be["gn"],
            conv_backend=be["conv"],
        )
        if "attention" in pair:
            hh = L.spatial_transformer_fwd(
                pair["attention"], hh, context,
                heads=cfg.num_heads[level], **attn_kw,
            )
        return hh

    # 3. down blocks
    res_stack = [h]
    for i, blk in enumerate(params["down_blocks"]):
        if "segments" in blk:
            # weight-stacked iso runs (see stack_iso_blocks): each scan
            # body compiles once; ys carries the per-iteration hidden
            # states that feed the up-block skip connections
            for seg in blk["segments"]:
                if "one" in seg:
                    h = _pair_fwd(seg["one"], h, i)
                    res_stack.append(h)
                else:

                    def _down_body(hh, pair, _level=i):
                        hh = _pair_fwd(pair, hh, _level)
                        return hh, hh

                    h, ys = jax.lax.scan(_down_body, h, seg["scan"])
                    res_stack.extend(list(ys))
        else:
            has_attn = "attentions" in blk
            for j, rn in enumerate(blk["resnets"]):
                h = L.resnet_block_fwd(
                    rn, h, emb, groups=groups, gn_backend=be["gn"],
                    conv_backend=be["conv"],
                )
                if has_attn:
                    h = L.spatial_transformer_fwd(
                        blk["attentions"][j], h, context,
                        heads=cfg.num_heads[i], **attn_kw,
                    )
                res_stack.append(h)
        if "downsample" in blk:
            h = L.downsample_fwd(blk["downsample"], h)
            res_stack.append(h)

    if down_block_additional_residuals is not None:
        res_stack = [
            (r.astype(jnp.float32) + a.astype(jnp.float32)).astype(r.dtype)
            for r, a in zip(res_stack, down_block_additional_residuals)
        ]

    # 4. mid
    mid = params["mid_block"]
    h = L.resnet_block_fwd(
        mid["resnets"][0], h, emb, groups=groups, gn_backend=be["gn"],
        conv_backend=be["conv"],
    )
    h = L.spatial_transformer_fwd(
        mid["attentions"][0], h, context, heads=cfg.num_heads[-1], **attn_kw
    )
    h = L.resnet_block_fwd(
        mid["resnets"][1], h, emb, groups=groups, gn_backend=be["gn"],
        conv_backend=be["conv"],
    )

    if mid_block_additional_residual is not None:
        h = (
            h.astype(jnp.float32)
            + mid_block_additional_residual.astype(jnp.float32)
        ).astype(h.dtype)

    # 5. up blocks
    for i, blk in enumerate(params["up_blocks"]):
        level = n_blocks - 1 - i
        if "segments" in blk:
            for seg in blk["segments"]:
                if "one" in seg:
                    res = res_stack.pop()
                    h = jnp.concatenate([h, res.astype(h.dtype)], axis=-1)
                    h = _pair_fwd(seg["one"], h, level)
                else:
                    k = jax.tree_util.tree_leaves(seg["scan"])[0].shape[0]
                    # skips in pop order = scan iteration order; the
                    # stack is a few MB of activations per step (13 µs
                    # at level-3 SD1.5), dwarfed by the saved codegen
                    skips = jnp.stack(
                        [res_stack.pop().astype(h.dtype) for _ in range(k)]
                    )

                    def _up_body(hh, xs, _level=level):
                        pair, skip = xs
                        hh = jnp.concatenate([hh, skip], axis=-1)
                        hh = _pair_fwd(pair, hh, _level)
                        return hh, None

                    h, _ = jax.lax.scan(_up_body, h, (seg["scan"], skips))
        else:
            has_attn = "attentions" in blk
            for j, rn in enumerate(blk["resnets"]):
                res = res_stack.pop()
                h = jnp.concatenate([h, res.astype(h.dtype)], axis=-1)
                h = L.resnet_block_fwd(
                    rn, h, emb, groups=groups, gn_backend=be["gn"],
                    conv_backend=be["conv"],
                )
                if has_attn:
                    h = L.spatial_transformer_fwd(
                        blk["attentions"][j], h, context,
                        heads=cfg.num_heads[level], **attn_kw,
                    )
        if "upsample" in blk:
            h = L.upsample_fwd(blk["upsample"], h)

    # 6. out head
    h = group_norm(
        h, params["conv_norm_out"]["scale"], params["conv_norm_out"]["bias"],
        groups=groups, act="silu", backend=be["gn"],
    )
    h = conv2d(h, params["conv_out"]["w"], params["conv_out"]["b"], padding=1)
    return h


def create_unet(
    cfg: UNetConfig = SD15_UNET, rng: Optional[jax.Array] = None, params=None
) -> Model:
    if params is None:
        params = L.device_put_tree(
            init_unet_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    return Model(config=cfg, params=params, forward=unet_fwd, name="unet")
