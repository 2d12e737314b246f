"""CLIP vision encoder parity vs transformers + IP-Adapter loading."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.clip_vision import (
    TINY_IMAGE_ENCODER,
    clip_vision_fwd,
    create_image_encoder,
    CLIPVisionConfig,
)
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.ip_adapter import (
    attn2_paths_in_diffusers_order,
    init_ip_adapter_params,
    ip_image_embed,
    load_ip_adapter,
)

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_clip_vision_parity_with_transformers():
    import torch
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
    )
    model = CLIPVisionModel(hf_cfg).eval()

    # convert weights
    from sfast_tpu.interop.torch_bridge import conv_w, linear_w, vec

    sd = model.state_dict()
    pre = "vision_model."
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, projection_dim=None, dtype=jnp.float32,
    )

    def norm(k):
        return {"scale": vec(sd, k + ".weight"), "bias": vec(sd, k + ".bias")}

    params = {
        "class_embedding": vec(sd, pre + "embeddings.class_embedding", jnp.float32),
        "patch_embedding": {
            "w": conv_w(sd, pre + "embeddings.patch_embedding.weight", jnp.float32)
        },
        "position_embedding": vec(
            sd, pre + "embeddings.position_embedding.weight", jnp.float32
        ),
        "pre_layernorm": norm(pre + "pre_layrnorm"),  # (sic) transformers typo
        "post_layernorm": norm(pre + "post_layernorm"),
        "layers": [],
    }
    for i in range(2):
        lp = f"{pre}encoder.layers.{i}."
        params["layers"].append(
            {
                "layer_norm1": norm(lp + "layer_norm1"),
                "attn": {
                    "to_q": {"w": linear_w(sd, lp + "self_attn.q_proj.weight", jnp.float32), "b": vec(sd, lp + "self_attn.q_proj.bias", jnp.float32)},
                    "to_k": {"w": linear_w(sd, lp + "self_attn.k_proj.weight", jnp.float32), "b": vec(sd, lp + "self_attn.k_proj.bias", jnp.float32)},
                    "to_v": {"w": linear_w(sd, lp + "self_attn.v_proj.weight", jnp.float32), "b": vec(sd, lp + "self_attn.v_proj.bias", jnp.float32)},
                    "to_out": {"w": linear_w(sd, lp + "self_attn.out_proj.weight", jnp.float32), "b": vec(sd, lp + "self_attn.out_proj.bias", jnp.float32)},
                },
                "layer_norm2": norm(lp + "layer_norm2"),
                "fc1": {"w": linear_w(sd, lp + "mlp.fc1.weight", jnp.float32), "b": vec(sd, lp + "mlp.fc1.bias", jnp.float32)},
                "fc2": {"w": linear_w(sd, lp + "mlp.fc2.weight", jnp.float32), "b": vec(sd, lp + "mlp.fc2.bias", jnp.float32)},
            }
        )

    px = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px).permute(0, 3, 1, 2))

    out = clip_vision_fwd(cfg, CCFG, params, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), ref.pooler_output.numpy(),
        rtol=2e-3, atol=2e-3,
    )


def test_image_encoder_shapes():
    enc = create_image_encoder(TINY_IMAGE_ENCODER, jax.random.key(0))
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = enc(px)
    assert out["last_hidden_state"].shape == (1, 17, 64)  # 16 patches + cls
    assert out["image_embeds"].shape == (1, 32)


def test_attn2_paths_order_and_count():
    paths = attn2_paths_in_diffusers_order(TINY_UNET)
    # tiny: 1 cross down block x 1 layer + 1 cross up block x 2 + mid x 1
    assert len(paths) == 4
    assert paths[0][0] == "down_blocks"
    assert paths[-1][0] == "mid_block"


def test_ip_adapter_injection_and_forward():
    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    new_params, image_proj = init_ip_adapter_params(
        jax.random.key(1), cfg, unet.params, clip_embed_dim=32, num_tokens=4
    )
    # image tokens
    clip_embeds = jax.random.normal(jax.random.key(2), (1, 32), jnp.float32)
    tokens = ip_image_embed(image_proj, clip_embeds)
    assert tokens.shape == (1, 4, 64)

    ip_unet = unet.replace_params(new_params)
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([10.0])
    ctx = jax.random.normal(jax.random.key(4), (1, 7, 64), jnp.float32)
    base = unet(x, t, ctx)
    with_ip = ip_unet(x, t, ctx, ip_adapter_embeds=tokens, ip_adapter_scale=1.0)
    assert np.abs(np.asarray(with_ip) - np.asarray(base)).max() > 1e-6
    # scale 0 recovers base exactly
    no_ip = ip_unet(x, t, ctx, ip_adapter_embeds=tokens, ip_adapter_scale=0.0)
    np.testing.assert_allclose(np.asarray(no_ip), np.asarray(base), atol=1e-5)


def test_load_ip_adapter_torch_format():
    import torch

    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    paths = attn2_paths_in_diffusers_order(cfg)
    ip_sd = {"image_proj": {
        "proj.weight": torch.randn(4 * 64, 32),
        "proj.bias": torch.randn(4 * 64),
        "norm.weight": torch.ones(64),
        "norm.bias": torch.zeros(64),
    }, "ip_adapter": {}}
    key_id = 1
    for p in paths:
        dim = 32 if p[0] == "down_blocks" else 64
        # our tiny unet: down block channels 32, up/mid 64... read from tree
        node = unet.params
        for q in p:
            node = node[q]
        dim_out = node["to_k"]["w"].shape[1]
        ip_sd["ip_adapter"][f"{key_id}.to_k_ip.weight"] = torch.randn(dim_out, 64)
        ip_sd["ip_adapter"][f"{key_id}.to_v_ip.weight"] = torch.randn(dim_out, 64)
        key_id += 2

    new_params, image_proj = load_ip_adapter(cfg, unet.params, ip_sd, dtype=jnp.float32)
    for p in paths:
        node = new_params
        for q in p:
            node = node[q]
        assert "ip_to_k" in node and "ip_to_v" in node
        assert node["ip_to_k"]["w"].shape[0] == 64
