"""CLIP vision encoder — mirror of transformers' CLIPVisionModel(WithProjection).

This is the ``image_encoder`` the reference lazily traces + CUDA-graphs
for SVD and IP-Adapter pipelines (``diffusion_pipeline_compiler.py:101-118``).
ViT: patch-conv embedding + class token + pre/post layernorm + non-causal
transformer stack; pooled output is the class token after post-LN, with
an optional visual projection.
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.ops.conv import conv2d
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.linear import linear


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: Optional[int] = None
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


# laion CLIP ViT-H/14 — the encoder used by SVD and IP-Adapter(+)
VIT_H_IMAGE_ENCODER = CLIPVisionConfig(
    hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=16,
    projection_dim=1024, hidden_act="gelu",
)
# OpenAI CLIP ViT-L/14 (SD image-variation / classic IP-Adapter)
VIT_L_IMAGE_ENCODER = CLIPVisionConfig(projection_dim=768)
TINY_IMAGE_ENCODER = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, projection_dim=32, dtype=jnp.float32,
)


def init_clip_vision_params(rng, cfg: CLIPVisionConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    p = {
        "class_embedding": L._randn(gen, (cfg.hidden_size,), dt, 0.02),
        "patch_embedding": {
            "w": L._randn(
                gen,
                (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
                dt,
                0.02,
            )
        },
        "position_embedding": L._randn(
            gen, (cfg.num_patches + 1, cfg.hidden_size), dt, 0.02
        ),
        "pre_layernorm": L.init_norm(cfg.hidden_size),
        "post_layernorm": L.init_norm(cfg.hidden_size),
        "layers": [
            {
                "layer_norm1": L.init_norm(cfg.hidden_size),
                "attn": L.init_attention(
                    gen, cfg.hidden_size, cfg.num_heads, qkv_bias=True, dtype=dt
                ),
                "layer_norm2": L.init_norm(cfg.hidden_size),
                "fc1": L.init_linear(gen, cfg.hidden_size, cfg.intermediate_size, dtype=dt),
                "fc2": L.init_linear(gen, cfg.intermediate_size, cfg.hidden_size, dtype=dt),
            }
            for _ in range(cfg.num_layers)
        ],
    }
    if cfg.projection_dim is not None:
        p["visual_projection"] = L.init_linear(
            gen, cfg.hidden_size, cfg.projection_dim, bias=False, dtype=dt
        )
    return p


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def clip_vision_fwd(
    cfg: CLIPVisionConfig,
    ccfg: CompilationConfig,
    params,
    pixel_values: jax.Array,
    *,
    output_hidden_states: bool = False,
):
    """pixel_values: (B, H, W, 3) NHWC, CLIP-normalized.  Returns dict with
    last_hidden_state (B, 1+P, D), pooler_output (B, D), optionally
    image_embeds (projection) and hidden_states."""
    b = pixel_values.shape[0]
    patches = conv2d(
        pixel_values.astype(cfg.dtype),
        params["patch_embedding"]["w"],
        None,
        stride=cfg.patch_size,
    )  # (B, H/p, W/p, D)
    h = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (b, 1, cfg.hidden_size)
    ).astype(h.dtype)
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embedding"][: h.shape[1]]
    h = layer_norm(
        h, params["pre_layernorm"]["scale"], params["pre_layernorm"]["bias"]
    )

    hidden_states = [h] if output_hidden_states else None
    for lyr in params["layers"]:
        res = h
        hn = layer_norm(h, lyr["layer_norm1"]["scale"], lyr["layer_norm1"]["bias"])
        h = res + L.attention_fwd(
            lyr["attn"], hn, heads=cfg.num_heads, attn_backend="xla"
        )
        res = h
        hn = layer_norm(h, lyr["layer_norm2"]["scale"], lyr["layer_norm2"]["bias"])
        hn = L.apply_linear(lyr["fc1"], hn)
        hn = _act(hn.astype(jnp.float32), cfg.hidden_act).astype(cfg.dtype)
        hn = L.apply_linear(lyr["fc2"], hn)
        h = res + hn
        if output_hidden_states:
            hidden_states.append(h)

    pooled = layer_norm(
        h[:, 0], params["post_layernorm"]["scale"], params["post_layernorm"]["bias"]
    )
    out = {"last_hidden_state": h, "pooler_output": pooled}
    if output_hidden_states:
        out["hidden_states"] = tuple(hidden_states)
    if "visual_projection" in params:
        out["image_embeds"] = linear(pooled, params["visual_projection"]["w"])
    return out


def create_image_encoder(
    cfg: CLIPVisionConfig = VIT_H_IMAGE_ENCODER,
    rng: Optional[jax.Array] = None,
    params=None,
) -> Model:
    if params is None:
        params = L.device_put_tree(
            init_clip_vision_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    return Model(
        config=cfg,
        params=params,
        forward=clip_vision_fwd,
        name="image_encoder",
        static_argnames=("output_hidden_states",),
    )
