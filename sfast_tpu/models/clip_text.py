"""CLIP text encoder(s) — pure-JAX mirror of transformers'
CLIPTextModel / CLIPTextModelWithProjection.

Covers the text encoders the reference compiles lazily
(``diffusion_pipeline_compiler.py:96-118``): SD1.5 (CLIP ViT-L, quick_gelu,
last hidden state), SD2.x (OpenCLIP, gelu, penultimate layer), and SDXL's
dual encoders (ViT-L hidden[-2] + OpenCLIP bigG hidden[-2] & pooled
projection).

TPU notes: token gather is one embedding lookup; the causal self-attention
runs on the XLA path (seq=77 — below the flash-kernel payoff threshold,
see ``ops/attention.py``); everything else is MXU matmuls.
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.module import Model
from sfast_tpu.models import layers as L
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.linear import linear


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # 'quick_gelu' (ViT-L) | 'gelu' (OpenCLIP)
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection
    # eos token id for pooled output: 49407 for ViT-L; OpenCLIP pads with 0
    eos_token_id: int = 49407
    # what the paired tokenizer pads with: EOS for SD1.5's CLIPTokenizer,
    # 0 ('!') for SD2/SDXL's tokenizers — needed to synthesize the
    # empty-prompt encoding when no tokenizer is attached
    pad_token_id: int = 49407
    dtype: Any = jnp.bfloat16


SD15_TEXT_ENCODER = CLIPTextConfig()
SD21_TEXT_ENCODER = CLIPTextConfig(
    hidden_size=1024, intermediate_size=4096, num_layers=23, num_heads=16,
    hidden_act="gelu", pad_token_id=0,
)
SDXL_TEXT_ENCODER_2 = CLIPTextConfig(
    hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=20,
    hidden_act="gelu", projection_dim=1280, pad_token_id=0,
)
TINY_TEXT_ENCODER = CLIPTextConfig(
    vocab_size=1000, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, dtype=jnp.float32,
)


def init_clip_text_params(rng, cfg: CLIPTextConfig):
    dt = cfg.dtype
    gen = L.as_host_rng(rng)
    keys = iter(lambda: gen, None)  # infinite host-rng stream
    p = {
        "token_embedding": L._randn(
            gen, (cfg.vocab_size, cfg.hidden_size), dt, 0.02
        ),
        "position_embedding": L._randn(
            gen, (cfg.max_position_embeddings, cfg.hidden_size), dt, 0.02
        ),
        "final_layer_norm": L.init_norm(cfg.hidden_size),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        p["layers"].append(
            {
                "layer_norm1": L.init_norm(cfg.hidden_size),
                "attn": L.init_attention(
                    next(keys), cfg.hidden_size, cfg.num_heads, qkv_bias=True, dtype=dt
                ),
                "layer_norm2": L.init_norm(cfg.hidden_size),
                "fc1": L.init_linear(
                    next(keys), cfg.hidden_size, cfg.intermediate_size, dtype=dt
                ),
                "fc2": L.init_linear(
                    next(keys), cfg.intermediate_size, cfg.hidden_size, dtype=dt
                ),
            }
        )
    if cfg.projection_dim is not None:
        p["text_projection"] = L.init_linear(
            next(keys), cfg.hidden_size, cfg.projection_dim, bias=False, dtype=dt
        )
    return p


def _mlp_act(x, act: str):
    if act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(act)


def clip_text_fwd(
    cfg: CLIPTextConfig,
    ccfg: CompilationConfig,
    params,
    input_ids: jax.Array,
    *,
    output_hidden_states: bool = False,
):
    """input_ids: (B, S) int32.  Returns a dict mirroring transformers'
    output: last_hidden_state, pooler_output (EOS token), optionally
    hidden_states tuple (for SD2/SDXL penultimate-layer conditioning) and
    text_embeds when a projection head exists."""
    b, s = input_ids.shape
    h = params["token_embedding"][input_ids] + params["position_embedding"][:s]
    h = h.astype(cfg.dtype)

    hidden_states = [h] if output_hidden_states else None
    for lyr in params["layers"]:
        res = h
        hn = layer_norm(h, lyr["layer_norm1"]["scale"], lyr["layer_norm1"]["bias"])
        attn_out = L.attention_fwd(
            lyr["attn"], hn, heads=cfg.num_heads, causal=True, attn_backend="xla"
        )
        h = res + attn_out
        res = h
        hn = layer_norm(h, lyr["layer_norm2"]["scale"], lyr["layer_norm2"]["bias"])
        hn = linear(hn, lyr["fc1"]["w"], lyr["fc1"].get("b"))
        hn = _mlp_act(hn.astype(jnp.float32), cfg.hidden_act).astype(cfg.dtype)
        hn = linear(hn, lyr["fc2"]["w"], lyr["fc2"].get("b"))
        h = res + hn
        if output_hidden_states:
            hidden_states.append(h)

    last = layer_norm(
        h, params["final_layer_norm"]["scale"], params["final_layer_norm"]["bias"]
    )

    # pooled output: hidden state at the EOS token (argmax over id match,
    # mirroring transformers' eos_token pooling)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = last[jnp.arange(b), eos_pos]

    out = {"last_hidden_state": last, "pooler_output": pooled}
    if output_hidden_states:
        out["hidden_states"] = tuple(hidden_states)
    if "text_projection" in params:
        out["text_embeds"] = linear(pooled, params["text_projection"]["w"])
    return out


def create_text_encoder(
    cfg: CLIPTextConfig = SD15_TEXT_ENCODER,
    rng: Optional[jax.Array] = None,
    params=None,
) -> Model:
    if params is None:
        params = L.device_put_tree(
            init_clip_text_params(rng if rng is not None else jax.random.key(0), cfg)
        )
    return Model(
        config=cfg,
        params=params,
        forward=clip_text_fwd,
        name="text_encoder",
        static_argnames=("output_hidden_states",),
    )
