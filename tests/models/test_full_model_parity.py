"""FULL-model converter parity (VERDICT r2 #5).

`test_checkpoint_shaped_parity.py` proves each *block* converter against
a diffusers-named torch replica; this file composes COMPLETE tiny models
with diffusers' exact top-to-bottom state_dict naming and forward
semantics, runs the real ``convert_*_params`` on their state_dicts, and
asserts whole-forward parity.  Block parity cannot catch wiring bugs
*between* blocks — skip-stack ordering, downsample placement, per-level
head counts, SDXL micro-conditioning plumbing — which is exactly what
the reference's e2e tests exercise on real checkpoints
(tests/compilers/test_stable_diffusion_pipeline_compiler.py:248-467).

The CLIP test uses the REAL ``transformers.CLIPTextModel`` as ground
truth (transformers is installed; diffusers is not).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from sfast_tpu.config import CompilationConfig

torch.manual_seed(0)

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def _j(t):
    return jnp.asarray(t.detach().numpy())


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _to_nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# diffusers-replica torch modules (exact key naming + forward semantics)
# ---------------------------------------------------------------------------


def timestep_embedding(t, dim, flip_sin_to_cos=True, freq_shift=0.0):
    """diffusers Timesteps.get_timestep_embedding."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        skip = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return skip + h


class Attention(nn.Module):
    def __init__(self, dim, heads, context_dim=None):
        super().__init__()
        self.heads = heads
        ctx = context_dim or dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx, dim, bias=False)
        self.to_v = nn.Linear(ctx, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, s, d = q.shape
        dh = d // self.heads
        q, k, v = (
            z.reshape(b, -1, self.heads, dh).transpose(1, 2) for z in (q, k, v)
        )
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, d))


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """diffusers Transformer2DModel: GN(32, eps 1e-6) → proj → blocks →
    proj → +residual.  use_linear_projection flips conv1x1↔linear AND the
    project/reshape order."""

    def __init__(self, c, heads, context_dim, depth=1, use_linear=False):
        super().__init__()
        self.use_linear = use_linear
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c) if use_linear else nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(c, heads, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Linear(c, c) if use_linear else nn.Conv2d(c, c, 1)

    def forward(self, x, context):
        b, c, hh, ww = x.shape
        residual = x
        h = self.norm(x)
        if self.use_linear:
            h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
        else:
            h = self.proj_in(h).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        if self.use_linear:
            h = self.proj_out(h)
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            h = self.proj_out(h)
        return h + residual


class Downsample2D(nn.Module):
    """UNet flavor: conv stride 2, padding 1.  VAE encoder flavor
    (padding=0): diffusers pads (0,1,0,1) asymmetrically first."""

    def __init__(self, c, padding=1):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchUNet2DConditionModel(nn.Module):
    """Complete diffusers UNet2DConditionModel replica driven by the same
    raw config dict that ``unet_config_from_diffusers`` consumes."""

    def __init__(self, cfg: dict):
        super().__init__()
        self.cfg = cfg
        bo = cfg["block_out_channels"]
        n = len(bo)
        groups = cfg.get("norm_num_groups", 32)
        heads = cfg.get("num_attention_heads") or cfg["attention_head_dim"]
        heads = (heads,) * n if isinstance(heads, int) else heads
        tl = cfg.get("transformer_layers_per_block", 1)
        tl = (tl,) * n if isinstance(tl, int) else tl
        lpb = cfg["layers_per_block"]
        cross = cfg["cross_attention_dim"]
        use_lin = cfg.get("use_linear_projection", False)
        tdim = bo[0] * 4

        self.conv_in = nn.Conv2d(cfg["in_channels"], bo[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(bo[0], tdim)
        if cfg.get("addition_embed_type") == "text_time":
            self.add_embedding = TimestepEmbedding(
                cfg["projection_class_embeddings_input_dim"], tdim
            )

        self.down_blocks = nn.ModuleList()
        c_out = bo[0]
        for i, btype in enumerate(cfg["down_block_types"]):
            c_in, c_out = c_out, bo[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [
                    ResnetBlock2D(c_in if j == 0 else c_out, c_out, tdim, groups)
                    for j in range(lpb)
                ]
            )
            if btype == "CrossAttnDownBlock2D":
                blk.attentions = nn.ModuleList(
                    [
                        Transformer2DModel(c_out, heads[i], cross, tl[i], use_lin)
                        for _ in range(lpb)
                    ]
                )
            if i != n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(c_out)])
            self.down_blocks.append(blk)

        c_mid = bo[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(c_mid, c_mid, tdim, groups) for _ in range(2)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [Transformer2DModel(c_mid, heads[-1], cross, tl[-1], use_lin)]
        )

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(bo))
        c_prev = rev[0]
        for i, btype in enumerate(cfg["up_block_types"]):
            c_out = rev[i]
            c_skip_in = rev[min(i + 1, n - 1)]
            level = n - 1 - i
            resnets = []
            for j in range(lpb + 1):
                res_skip = c_skip_in if j == lpb else c_out
                res_in = c_prev if j == 0 else c_out
                resnets.append(
                    ResnetBlock2D(res_in + res_skip, c_out, tdim, groups)
                )
            blk = nn.Module()
            blk.resnets = nn.ModuleList(resnets)
            if btype == "CrossAttnUpBlock2D":
                blk.attentions = nn.ModuleList(
                    [
                        Transformer2DModel(
                            c_out, heads[level], cross, tl[level], use_lin
                        )
                        for _ in range(lpb + 1)
                    ]
                )
            if i != n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(c_out)])
            self.up_blocks.append(blk)
            c_prev = c_out

        self.conv_norm_out = nn.GroupNorm(groups, bo[0])
        self.conv_out = nn.Conv2d(bo[0], cfg["out_channels"], 3, padding=1)

    def forward(self, sample, timesteps, ehs, added_cond_kwargs=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        t_emb = timestep_embedding(timesteps, cfg["block_out_channels"][0])
        emb = self.time_embedding(t_emb)
        if cfg.get("addition_embed_type") == "text_time":
            te = added_cond_kwargs["text_embeds"]
            tid = added_cond_kwargs["time_ids"]
            time_embeds = timestep_embedding(
                tid.flatten(), cfg["addition_time_embed_dim"]
            ).reshape(te.shape[0], -1)
            emb = emb + self.add_embedding(torch.cat([te, time_embeds], dim=-1))

        h = self.conv_in(sample)
        res_stack = [h]
        for blk in self.down_blocks:
            for j, rn in enumerate(blk.resnets):
                h = rn(h, emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ehs)
                res_stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                res_stack.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, ehs)
        h = self.mid_block.resnets[1](h, emb)

        for blk in self.up_blocks:
            for j, rn in enumerate(blk.resnets):
                h = rn(torch.cat([h, res_stack.pop()], dim=1), emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ehs)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# UNet full-forward parity
# ---------------------------------------------------------------------------

SD_FLAVOR = {
    "sample_size": 16,
    "in_channels": 4,
    "out_channels": 4,
    "block_out_channels": (32, 64),
    "down_block_types": ("CrossAttnDownBlock2D", "DownBlock2D"),
    "up_block_types": ("UpBlock2D", "CrossAttnUpBlock2D"),
    "layers_per_block": 2,
    "attention_head_dim": 4,  # legacy heads-per-level naming, like SD1.5
    "cross_attention_dim": 48,
    "norm_num_groups": 32,
}

XL_FLAVOR = {
    "sample_size": 16,
    "in_channels": 4,
    "out_channels": 4,
    "block_out_channels": (32, 64),
    "down_block_types": ("DownBlock2D", "CrossAttnDownBlock2D"),
    "up_block_types": ("CrossAttnUpBlock2D", "UpBlock2D"),
    "layers_per_block": 2,
    "num_attention_heads": (4, 8),
    "transformer_layers_per_block": (1, 2),
    "cross_attention_dim": 48,
    "use_linear_projection": True,
    "addition_embed_type": "text_time",
    "addition_time_embed_dim": 8,
    "projection_class_embeddings_input_dim": 16 + 6 * 8,
    "norm_num_groups": 32,
}


@pytest.mark.parametrize("flavor", ["sd", "xl"], ids=["sd15", "sdxl"])
def test_full_unet_parity(flavor):
    from sfast_tpu.interop.convert_unet import (
        convert_unet_params,
        unet_config_from_diffusers,
    )
    from sfast_tpu.models.unet_2d_condition import unet_fwd

    raw = SD_FLAVOR if flavor == "sd" else XL_FLAVOR
    m = TorchUNet2DConditionModel(raw).eval()
    cfg = unet_config_from_diffusers(raw, dtype=jnp.float32)
    p = convert_unet_params(m.state_dict(), cfg)

    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor(421.0)
    ehs = torch.randn(2, 7, raw["cross_attention_dim"])
    ack_t = ack_j = None
    if flavor == "xl":
        te = torch.randn(2, 16)
        tid = torch.arange(12, dtype=torch.float32).reshape(2, 6)
        ack_t = {"text_embeds": te, "time_ids": tid}
        ack_j = {"text_embeds": _j(te), "time_ids": _j(tid)}
    with torch.no_grad():
        ref = m(x, t, ehs, ack_t)
    out = unet_fwd(
        cfg, CCFG, p, _nhwc(x), jnp.asarray(421.0), _j(ehs),
        added_cond_kwargs=ack_j,
    )
    np.testing.assert_allclose(_to_nchw(out), ref.numpy(), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# VAE full-forward parity (encoder incl. asymmetric downsample padding)
# ---------------------------------------------------------------------------


class VaeAttention(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).reshape(b, c, hh * ww).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return x + o.transpose(1, 2).reshape(b, c, hh, ww)


class TorchAutoencoderKL(nn.Module):
    """diffusers AutoencoderKL with exact encoder./decoder. naming.
    Encoder downsamplers use padding=0 + (0,1,0,1) pad — the VAE quirk
    block-level tests cannot see."""

    def __init__(self, bo=(32, 64), lpb=1, groups=32, latent=4):
        super().__init__()
        n = len(bo)

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, bo[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        c_out = bo[0]
        for i in range(n):
            c_in, c_out = c_out, bo[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [
                    ResnetBlock2D(
                        c_in if j == 0 else c_out, c_out, None, groups, eps=1e-6
                    )
                    for j in range(lpb)
                ]
            )
            if i != n - 1:
                blk.downsamplers = nn.ModuleList([Downsample2D(c_out, padding=0)])
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(bo[-1], bo[-1], None, groups, eps=1e-6) for _ in range(2)]
        )
        enc.mid_block.attentions = nn.ModuleList([VaeAttention(bo[-1], groups)])
        enc.conv_norm_out = nn.GroupNorm(groups, bo[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(bo[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent, bo[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock2D(bo[-1], bo[-1], None, groups, eps=1e-6) for _ in range(2)]
        )
        dec.mid_block.attentions = nn.ModuleList([VaeAttention(bo[-1], groups)])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(bo))
        c_prev = rev[0]
        for i in range(n):
            c_out = rev[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [
                    ResnetBlock2D(
                        c_prev if j == 0 else c_out, c_out, None, groups, eps=1e-6
                    )
                    for j in range(lpb + 1)
                ]
            )
            if i != n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(c_out)])
            dec.up_blocks.append(blk)
            c_prev = c_out
        dec.conv_norm_out = nn.GroupNorm(groups, bo[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(bo[0], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        mb = self.encoder.mid_block
        h = mb.resnets[0](h)
        h = mb.attentions[0](h)
        h = mb.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        mb = self.decoder.mid_block
        h = mb.resnets[0](h)
        h = mb.attentions[0](h)
        h = mb.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for rn in blk.resnets:
                h = rn(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def test_full_vae_parity():
    from sfast_tpu.interop.convert_vae import convert_vae_params
    from sfast_tpu.models.autoencoder_kl import (
        VAEConfig,
        vae_decode_fwd,
        vae_encode_fwd,
    )

    m = TorchAutoencoderKL().eval()
    cfg = VAEConfig(
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=32,
        dtype=jnp.float32,
    )
    p = convert_vae_params(m.state_dict(), cfg)

    img = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref_mom = m.encode_moments(img)
    mean, logvar = vae_encode_fwd(cfg, CCFG, p, _nhwc(img))
    ref_mean, ref_logvar = ref_mom.chunk(2, dim=1)
    np.testing.assert_allclose(
        _to_nchw(mean), ref_mean.numpy(), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        _to_nchw(logvar), ref_logvar.clamp(-30, 20).numpy(), rtol=2e-3, atol=2e-3
    )

    z = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        ref_img = m.decode(z)
    out = vae_decode_fwd(cfg, CCFG, p, _nhwc(z))
    np.testing.assert_allclose(_to_nchw(out), ref_img.numpy(), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# CLIP text encoder vs the REAL transformers module
# ---------------------------------------------------------------------------


def test_full_clip_parity_vs_transformers():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    from sfast_tpu.interop.convert_clip import (
        clip_config_from_hf,
        convert_clip_text_params,
    )
    from sfast_tpu.models.clip_text import clip_text_fwd

    hf_cfg = HFConfig(
        vocab_size=120,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        projection_dim=24,
        # eos != 2 selects transformers' non-legacy pooling (first-EOS
        # match, what sfast_tpu implements).  The legacy eos==2 branch
        # pools at argmax(input_ids), which coincides with first-EOS for
        # real CLIP checkpoints (eos 49407 is the max id) but not for
        # arbitrary tiny vocabs.
        eos_token_id=3,
        bos_token_id=1,
    )
    hm = CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = clip_config_from_hf(hf_cfg, dtype=jnp.float32)
    p = convert_clip_text_params(dict(hm.state_dict()), cfg)

    ids = torch.tensor(
        [[1, 5, 9, 33, 3, 0, 0, 0], [1, 77, 51, 12, 60, 101, 3, 0]],
        dtype=torch.long,
    )
    with torch.no_grad():
        ref = hm(ids, output_hidden_states=True)
    out = clip_text_fwd(
        cfg, CCFG, p, jnp.asarray(ids.numpy()), output_hidden_states=True
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-4,
    )
    # penultimate hidden state — the SD2/SDXL conditioning tap
    np.testing.assert_allclose(
        np.asarray(out["hidden_states"][-2]),
        ref.hidden_states[-2].numpy(),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["text_embeds"]), ref.text_embeds.numpy(),
        rtol=2e-4, atol=2e-4,
    )


# ---------------------------------------------------------------------------
# ControlNet full-forward parity
# ---------------------------------------------------------------------------


class TorchControlNetModel(nn.Module):
    """diffusers ControlNetModel: UNet encoder side + cond embedding +
    zero convs, with `.config` exposed the way convert_controlnet reads it."""

    def __init__(self, raw: dict, cond_chans=(16, 32)):
        super().__init__()
        self.config = dict(raw)
        self.config["conditioning_embedding_out_channels"] = cond_chans
        unet = TorchUNet2DConditionModel(raw)
        self.conv_in = unet.conv_in
        self.time_embedding = unet.time_embedding
        self.down_blocks = unet.down_blocks
        self.mid_block = unet.mid_block
        self._cfg = raw

        ce = nn.Module()
        ce.conv_in = nn.Conv2d(3, cond_chans[0], 3, padding=1)
        blocks = []
        for i in range(len(cond_chans) - 1):
            blocks.append(nn.Conv2d(cond_chans[i], cond_chans[i], 3, padding=1))
            blocks.append(
                nn.Conv2d(cond_chans[i], cond_chans[i + 1], 3, padding=1, stride=2)
            )
        ce.blocks = nn.ModuleList(blocks)
        bo = raw["block_out_channels"]
        ce.conv_out = nn.Conv2d(cond_chans[-1], bo[0], 3, padding=1)
        nn.init.zeros_(ce.conv_out.weight)
        nn.init.zeros_(ce.conv_out.bias)
        self.controlnet_cond_embedding = ce

        n, lpb = len(bo), raw["layers_per_block"]
        zc = [nn.Conv2d(bo[0], bo[0], 1)]
        for i in range(n):
            for _ in range(lpb):
                zc.append(nn.Conv2d(bo[i], bo[i], 1))
            if i != n - 1:
                zc.append(nn.Conv2d(bo[i], bo[i], 1))
        self.controlnet_down_blocks = nn.ModuleList(zc)
        self.controlnet_mid_block = nn.Conv2d(bo[-1], bo[-1], 1)
        # diffusers zero-inits these; random values give the test teeth
        for c in [*self.controlnet_down_blocks, self.controlnet_mid_block]:
            nn.init.normal_(c.weight, std=0.1)
            nn.init.normal_(c.bias, std=0.1)

    def forward(self, sample, timesteps, ehs, cond, conditioning_scale=1.0):
        cfg = self._cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        emb = self.time_embedding(
            timestep_embedding(timesteps, cfg["block_out_channels"][0])
        )
        c = F.silu(self.controlnet_cond_embedding.conv_in(cond))
        for blk in self.controlnet_cond_embedding.blocks:
            c = F.silu(blk(c))
        c = self.controlnet_cond_embedding.conv_out(c)

        h = self.conv_in(sample) + c
        res_stack = [h]
        for blk in self.down_blocks:
            for j, rn in enumerate(blk.resnets):
                h = rn(h, emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ehs)
                res_stack.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                res_stack.append(h)
        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, ehs)
        h = self.mid_block.resnets[1](h, emb)

        down = [
            zc(r) * conditioning_scale
            for zc, r in zip(self.controlnet_down_blocks, res_stack)
        ]
        mid = self.controlnet_mid_block(h) * conditioning_scale
        return down, mid


def test_full_controlnet_parity():
    from sfast_tpu.interop.diffusers_adapter import convert_controlnet

    raw = dict(SD_FLAVOR)
    m = TorchControlNetModel(raw).eval()
    cn = convert_controlnet(m, jnp.float32)

    x = torch.randn(2, 4, 8, 8)
    t = torch.tensor(33.0)
    ehs = torch.randn(2, 7, raw["cross_attention_dim"])
    cond = torch.rand(2, 3, 16, 16)  # pixel-space control image, 2x latent
    with torch.no_grad():
        ref_down, ref_mid = m(x, t, ehs, cond, conditioning_scale=0.7)
    down, mid = cn(
        _nhwc(x), jnp.asarray(33.0), _j(ehs), _nhwc(cond),
        conditioning_scale=0.7,
    )
    assert len(down) == len(ref_down)
    for got, want in zip(down, ref_down):
        np.testing.assert_allclose(
            _to_nchw(got), want.numpy(), rtol=2e-3, atol=2e-3
        )
    np.testing.assert_allclose(_to_nchw(mid), ref_mid.numpy(), rtol=2e-3, atol=2e-3)
