"""IP-Adapter: image-prompt conditioning via decoupled cross-attention.

Reference parity target: the community example the reference ships
(``community/optimize_sd15_with_controlnet_and_ip_adapter.py``) — an SD
pipeline whose attn2 layers get extra image-conditioned K/V projections,
plus a small ``image_proj`` head mapping CLIP image embeddings to
``num_tokens`` context tokens.

Loading injects ``ip_to_k``/``ip_to_v`` param dicts into each attn2 of
the UNet param tree (picked up by ``layers.attention_fwd``) — a pure tree
transform, so the hot-swap story is identical to LoRA: update the
compiled model's params, zero recompiles... unless the UNet was compiled
*without* IP weights before (tree structure changes), in which case the
first IP call compiles once per signature like any new model.
"""

import logging
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sfast_tpu.models.unet_2d_condition import UNetConfig
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.linear import linear

logger = logging.getLogger(__name__)


def attn2_paths_in_diffusers_order(cfg: UNetConfig):
    """Paths of every attn2 param dict, in diffusers' attn_processors
    iteration order (down_blocks → up_blocks → mid_block — module
    attribute assignment order in UNet2DConditionModel.__init__), which
    is the order IP-Adapter checkpoints number their weights."""
    n = len(cfg.block_out_channels)
    paths = []
    for i, btype in enumerate(cfg.down_block_types):
        if btype != "CrossAttnDownBlock2D":
            continue
        for j in range(cfg.layers_per_block):
            for k in range(cfg.transformer_layers_per_block[i]):
                paths.append(
                    ("down_blocks", i, "attentions", j, "blocks", k, "attn2")
                )
    for i, btype in enumerate(cfg.up_block_types):
        if btype != "CrossAttnUpBlock2D":
            continue
        level = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            for k in range(cfg.transformer_layers_per_block[level]):
                paths.append(
                    ("up_blocks", i, "attentions", j, "blocks", k, "attn2")
                )
    for k in range(cfg.transformer_layers_per_block[-1]):
        paths.append(("mid_block", "attentions", 0, "blocks", k, "attn2"))
    return paths


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def load_ip_adapter(
    unet_cfg: UNetConfig,
    unet_params,
    ip_state_dict: Dict,
    *,
    num_tokens: int = 4,
    dtype=jnp.bfloat16,
) -> Tuple[dict, dict]:
    """Inject IP-Adapter weights from a torch ``ip_adapter.bin``-style
    state dict ({"image_proj": {...}, "ip_adapter": {"1.to_k_ip.weight",
    ...}}) into a copy of the UNet param tree.

    Returns ``(new_unet_params, image_proj_params)``.
    """
    from sfast_tpu.interop.torch_bridge import linear_w, vec

    ip_sd = ip_state_dict["ip_adapter"]
    proj_sd = ip_state_dict["image_proj"]

    paths = attn2_paths_in_diffusers_order(unet_cfg)

    import copy

    # deep-copy of containers only; array leaves are shared (immutable)
    new_params = copy.deepcopy(unet_params)
    key_id = 1
    loaded = 0
    for path in paths:
        k_key = f"{key_id}.to_k_ip.weight"
        v_key = f"{key_id}.to_v_ip.weight"
        if k_key in ip_sd:
            node = _get(new_params, path)
            node["ip_to_k"] = {"w": linear_w(ip_sd, k_key, dtype)}
            node["ip_to_v"] = {"w": linear_w(ip_sd, v_key, dtype)}
            loaded += 1
        key_id += 2
    if loaded == 0:
        logger.warning("load_ip_adapter: no ip_adapter keys matched")

    image_proj = {
        "proj": {
            "w": linear_w(proj_sd, "proj.weight", dtype),
            "b": vec(proj_sd, "proj.bias", dtype),
        },
        "norm": {
            "scale": vec(proj_sd, "norm.weight"),
            "bias": vec(proj_sd, "norm.bias"),
        },
        "num_tokens": num_tokens,
    }
    return new_params, image_proj


def ip_image_embed(image_proj, clip_image_embeds: jax.Array) -> jax.Array:
    """CLIP image embeddings (B, D_clip) → IP context tokens
    (B, num_tokens, cross_dim)."""
    n = image_proj["num_tokens"]
    h = linear(clip_image_embeds, image_proj["proj"]["w"], image_proj["proj"]["b"])
    h = h.reshape(h.shape[0], n, -1)
    return layer_norm(h, image_proj["norm"]["scale"], image_proj["norm"]["bias"])


def init_ip_adapter_params(
    rng, unet_cfg: UNetConfig, unet_params, *, clip_embed_dim: int = 1024,
    num_tokens: int = 4, dtype=jnp.float32,
):
    """Random-init IP-Adapter (tests / training-from-scratch)."""
    from sfast_tpu.models import layers as L
    import copy

    gen = L.as_host_rng(rng)
    new_params = copy.deepcopy(unet_params)
    for path in attn2_paths_in_diffusers_order(unet_cfg):
        node = _get(new_params, path)
        to_k = node["to_k"]
        # weight may be int8-quantized (w_q) — same (in, out) layout
        dim = (
            to_k["w"] if "w" in to_k else to_k.get("w_q", to_k.get("w_q8"))
        ).shape[1]
        ctx = unet_cfg.cross_attention_dim
        node["ip_to_k"] = {"w": jnp.asarray(L._randn(gen, (ctx, dim), dtype, 0.02))}
        node["ip_to_v"] = {"w": jnp.asarray(L._randn(gen, (ctx, dim), dtype, 0.02))}
    image_proj = {
        "proj": {
            "w": jnp.asarray(
                L._randn(gen, (clip_embed_dim, num_tokens * unet_cfg.cross_attention_dim), dtype, 0.02)
            ),
            "b": jnp.zeros((num_tokens * unet_cfg.cross_attention_dim,), dtype),
        },
        "norm": L.init_norm(unet_cfg.cross_attention_dim),
        "num_tokens": num_tokens,
    }
    image_proj["norm"] = {
        "scale": jnp.asarray(image_proj["norm"]["scale"]),
        "bias": jnp.asarray(image_proj["norm"]["bias"]),
    }
    return new_params, image_proj
