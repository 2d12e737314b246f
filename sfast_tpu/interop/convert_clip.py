"""transformers CLIPTextModel state_dict → sfast_tpu params.

Works from a plain state_dict + config so it needs only key-naming
knowledge, not a live transformers install.
"""

import jax.numpy as jnp

from sfast_tpu.models.clip_text import CLIPTextConfig
from sfast_tpu.interop.torch_bridge import linear_w, vec


def clip_config_from_hf(hf_config, dtype=jnp.bfloat16) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        max_position_embeddings=hf_config.max_position_embeddings,
        hidden_act=hf_config.hidden_act,
        projection_dim=getattr(hf_config, "projection_dim", None),
        eos_token_id=getattr(hf_config, "eos_token_id", 49407) or 49407,
        dtype=dtype,
    )


def convert_clip_text_params(sd: dict, cfg: CLIPTextConfig):
    dt = cfg.dtype
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""

    def norm(key):
        return {"scale": vec(sd, key + ".weight"), "bias": vec(sd, key + ".bias")}

    p = {
        "token_embedding": vec(sd, pre + "embeddings.token_embedding.weight", dt),
        "position_embedding": vec(
            sd, pre + "embeddings.position_embedding.weight", dt
        ),
        "final_layer_norm": norm(pre + "final_layer_norm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}."
        p["layers"].append(
            {
                "layer_norm1": norm(lp + "layer_norm1"),
                "attn": {
                    "to_q": {
                        "w": linear_w(sd, lp + "self_attn.q_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.q_proj.bias", dt),
                    },
                    "to_k": {
                        "w": linear_w(sd, lp + "self_attn.k_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.k_proj.bias", dt),
                    },
                    "to_v": {
                        "w": linear_w(sd, lp + "self_attn.v_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.v_proj.bias", dt),
                    },
                    "to_out": {
                        "w": linear_w(sd, lp + "self_attn.out_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.out_proj.bias", dt),
                    },
                },
                "layer_norm2": norm(lp + "layer_norm2"),
                "fc1": {
                    "w": linear_w(sd, lp + "mlp.fc1.weight", dt),
                    "b": vec(sd, lp + "mlp.fc1.bias", dt),
                },
                "fc2": {
                    "w": linear_w(sd, lp + "mlp.fc2.weight", dt),
                    "b": vec(sd, lp + "mlp.fc2.bias", dt),
                },
            }
        )
    if "text_projection.weight" in sd:
        p["text_projection"] = {"w": linear_w(sd, "text_projection.weight", dt)}
    return p


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------


def clip_vision_config_from_hf(hf_config, dtype=jnp.bfloat16):
    from sfast_tpu.models.clip_vision import CLIPVisionConfig

    return CLIPVisionConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        projection_dim=getattr(hf_config, "projection_dim", None),
        hidden_act=hf_config.hidden_act,
        dtype=dtype,
    )


def convert_clip_vision_params(sd: dict, cfg):
    from sfast_tpu.interop.torch_bridge import conv_w

    dt = cfg.dtype
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""

    def norm(key):
        return {"scale": vec(sd, key + ".weight"), "bias": vec(sd, key + ".bias")}

    p = {
        "class_embedding": vec(sd, pre + "embeddings.class_embedding", dt),
        "patch_embedding": {
            "w": conv_w(sd, pre + "embeddings.patch_embedding.weight", dt)
        },
        "position_embedding": vec(
            sd, pre + "embeddings.position_embedding.weight", dt
        ),
        # transformers spells it 'pre_layrnorm' (sic)
        "pre_layernorm": norm(pre + "pre_layrnorm"),
        "post_layernorm": norm(pre + "post_layernorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}."
        p["layers"].append(
            {
                "layer_norm1": norm(lp + "layer_norm1"),
                "attn": {
                    "to_q": {
                        "w": linear_w(sd, lp + "self_attn.q_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.q_proj.bias", dt),
                    },
                    "to_k": {
                        "w": linear_w(sd, lp + "self_attn.k_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.k_proj.bias", dt),
                    },
                    "to_v": {
                        "w": linear_w(sd, lp + "self_attn.v_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.v_proj.bias", dt),
                    },
                    "to_out": {
                        "w": linear_w(sd, lp + "self_attn.out_proj.weight", dt),
                        "b": vec(sd, lp + "self_attn.out_proj.bias", dt),
                    },
                },
                "layer_norm2": norm(lp + "layer_norm2"),
                "fc1": {
                    "w": linear_w(sd, lp + "mlp.fc1.weight", dt),
                    "b": vec(sd, lp + "mlp.fc1.bias", dt),
                },
                "fc2": {
                    "w": linear_w(sd, lp + "mlp.fc2.weight", dt),
                    "b": vec(sd, lp + "mlp.fc2.bias", dt),
                },
            }
        )
    if "visual_projection.weight" in sd:
        p["visual_projection"] = {"w": linear_w(sd, "visual_projection.weight", dt)}
    return p
