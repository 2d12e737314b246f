"""Checkpoint-shaped converter parity.

diffusers is not installed in this image, so these tests build SMALL
TORCH MODULES that replicate diffusers' exact state_dict naming AND
forward semantics (ResnetBlock2D, BasicTransformerBlock with GEGLU,
Attention with to_out.0, VAE mid attention, SpatioTemporalResBlock,
TemporalDecoder tail).  The torch state_dicts go through the REAL
sfast_tpu converters and the converted forwards must match the torch
forwards numerically — the test the round-trip suite cannot provide
(it only checks export∘convert == id against our own exporter).

Reference analog: its e2e tests load real HF checkpoints
(tests/compilers/test_stable_diffusion_pipeline_compiler.py:248-467);
this is the zero-egress equivalent.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models import layers as L
from sfast_tpu.interop.convert_unet import _resnet, _transformer_block
from sfast_tpu.interop.convert_vae import _vae_attention
from sfast_tpu.interop.convert_svd import _st_resnet, _conv3d

torch.manual_seed(0)

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def _j(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy())


def _nhwc(t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# diffusers-replica torch modules (exact key naming + forward semantics)
# ---------------------------------------------------------------------------


class TorchResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (silu nonlinearity, default output scale)."""

    def __init__(self, cin, cout, temb_dim=None, groups=8, eps=1e-5):
        super().__init__()
        self.eps_groups = (eps, groups)
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


class TorchAttention(nn.Module):
    """diffusers Attention: to_q/k/v (no bias), to_out = [Linear, Dropout]."""

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
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out[1](self.to_out[0](o))


class TorchGEGLU(nn.Module):
    """diffusers GEGLU: hidden_states * gelu(gate), gate = SECOND chunk."""

    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        hidden_states, gate = self.proj(x).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class TorchFeedForward(nn.Module):
    """diffusers FeedForward: net = [GEGLU, Dropout, Linear]."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [TorchGEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TorchBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, heads, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cin,cout,temb", [(16, 16, None), (16, 32, 24)])
def test_resnet_block_parity(cin, cout, temb):
    m = TorchResnetBlock2D(cin, cout, temb).eval()
    p = _resnet(m.state_dict(), "", jnp.float32)

    x = torch.randn(2, cin, 8, 8)
    te = torch.randn(2, temb) if temb else None
    with torch.no_grad():
        ref = m(x, te)
    out = L.resnet_block_fwd(
        p,
        _nhwc(x),
        _j(te) if temb else None,
        groups=8,
        gn_backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), rtol=2e-4, atol=2e-4
    )


def test_basic_transformer_block_parity():
    """BasicTransformerBlock incl. the GEGLU gate convention — the round-1
    half-swap bug is exactly what this catches."""
    dim, heads, ctx_dim = 32, 4, 24
    m = TorchBasicTransformerBlock(dim, heads, ctx_dim).eval()
    p = _transformer_block(m.state_dict(), "", jnp.float32)

    x = torch.randn(2, 10, dim)
    ctx = torch.randn(2, 7, ctx_dim)
    with torch.no_grad():
        ref = m(x, ctx)
    out = L.transformer_block_fwd(
        p, _j(x), _j(ctx), heads=heads, attn_backend="xla", geglu_backend="xla"
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_geglu_gate_convention_guard():
    """A converter/forward pair with swapped GEGLU halves CANNOT pass:
    assert the swap would actually be detected by the block parity."""
    dim = 16
    m = TorchFeedForward(dim).eval()
    sd = m.state_dict()
    p = {
        "proj": {
            "w": _j(sd["net.0.proj.weight"]).T,
            "b": _j(sd["net.0.proj.bias"]),
        },
        "out": {"w": _j(sd["net.2.weight"]).T, "b": _j(sd["net.2.bias"])},
    }
    x = torch.randn(3, 5, dim)
    with torch.no_grad():
        ref = m(x)
    out = L.feed_forward_fwd(p, _j(x), geglu_backend="xla")
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)
    # swapped halves must NOT match (sanity that the test has teeth)
    w = np.asarray(p["proj"]["w"])
    inner = w.shape[1] // 2
    w_sw = np.concatenate([w[:, inner:], w[:, :inner]], axis=1)
    b = np.asarray(p["proj"]["b"])
    b_sw = np.concatenate([b[inner:], b[:inner]])
    p_sw = {"proj": {"w": jnp.asarray(w_sw), "b": jnp.asarray(b_sw)}, "out": p["out"]}
    out_sw = L.feed_forward_fwd(p_sw, _j(x), geglu_backend="xla")
    assert np.abs(np.asarray(out_sw) - ref.numpy()).max() > 1e-3


def test_vae_mid_attention_parity():
    """diffusers VAE mid attention: GroupNorm(eps 1e-6) → 1-head qkv (with
    bias) → to_out.0 → residual add."""
    from sfast_tpu.models.autoencoder_kl import _vae_attention_fwd

    c, groups = 32, 8

    class TorchVaeAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
            self.to_q = nn.Linear(c, c)
            self.to_k = nn.Linear(c, c)
            self.to_v = nn.Linear(c, c)
            self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Dropout(0.0)])

        def forward(self, x):
            b, ch, hh, ww = x.shape
            h = self.group_norm(x).reshape(b, ch, hh * ww).transpose(1, 2)
            q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
            o = F.scaled_dot_product_attention(
                q[:, None], k[:, None], v[:, None]
            )[:, 0]
            o = self.to_out[0](o)
            return x + o.transpose(1, 2).reshape(b, ch, hh, ww)

    m = TorchVaeAttn().eval()
    p = _vae_attention(m.state_dict(), "", jnp.float32)
    p["group_norm"] = {
        "scale": _j(m.group_norm.weight),
        "bias": _j(m.group_norm.bias),
    }
    x = torch.randn(2, c, 6, 6)
    with torch.no_grad():
        ref = m(x)
    out = _vae_attention_fwd(p, _nhwc(x), groups=groups)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), rtol=2e-4, atol=2e-4
    )


class TorchTemporalResnetBlock(nn.Module):
    """diffusers TemporalResnetBlock: GroupNorm over C of (B,C,F,H,W),
    Conv3d kernel (3,1,1) padding (1,0,0)."""

    def __init__(self, c, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c, eps=eps)
        self.conv1 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(groups, c, eps=eps)
        self.conv2 = nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return x + h


class TorchSpatioTemporalResBlock(nn.Module):
    """diffusers SpatioTemporalResBlock as built by the TemporalDecoder
    blocks: spatial eps 1e-6, temporal eps 1e-5, merge 'learned',
    switch_spatial_to_temporal_mix=True."""

    def __init__(self, cin, cout, groups=8):
        super().__init__()
        self.spatial_res_block = TorchResnetBlock2D(
            cin, cout, None, groups=groups, eps=1e-6
        )
        self.temporal_res_block = TorchTemporalResnetBlock(
            cout, groups=groups, eps=1e-5
        )

        class Mixer(nn.Module):
            def __init__(self):
                super().__init__()
                self.mix_factor = nn.Parameter(torch.tensor([0.3]))

        self.time_mixer = Mixer()

    def forward(self, x, num_frames):
        h = self.spatial_res_block(x)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h5 = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        t5 = self.temporal_res_block(h5)
        alpha = 1.0 - torch.sigmoid(self.time_mixer.mix_factor)
        out = alpha * h5 + (1 - alpha) * t5
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


def test_spatio_temporal_resblock_parity():
    from sfast_tpu.models.autoencoder_kl_temporal import _dec_st_resnet_fwd

    m = TorchSpatioTemporalResBlock(16, 16).eval()
    p = _st_resnet(m.state_dict(), "", jnp.float32)
    x = torch.randn(4, 16, 6, 6)  # 4 = 2 videos × 2 frames
    with torch.no_grad():
        ref = m(x, num_frames=2)
    out = _dec_st_resnet_fwd(
        p, _nhwc(x), num_frames=2, groups=8, gn_backend="xla"
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), rtol=3e-4, atol=3e-4
    )


def test_time_conv_out_parity():
    """TemporalDecoder's final Conv3d(3,1,1) over (B, C, F, H, W)."""
    from sfast_tpu.models.unet_spatio_temporal import _conv_temporal

    m = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0)).eval()
    p = _conv3d({"w.weight": m.weight, "w.bias": m.bias}, "w", jnp.float32)
    x = torch.randn(1, 3, 4, 5, 5)  # (B, C, F, H, W)
    with torch.no_grad():
        ref = m(x)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # (B, F, H, W, C)
    out = _conv_temporal(x_j, p["w"], p["b"])
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref.numpy(), rtol=2e-4, atol=2e-4
    )


def test_controlnet_cond_embedding_parity():
    """ControlNet conditioning stem: conv_in → silu-interleaved blocks →
    conv_out (diffusers ControlNetConditioningEmbedding), converted with
    the same _conv + key naming convert_controlnet uses."""
    from sfast_tpu.interop.convert_unet import _conv
    from sfast_tpu.ops.conv import conv2d

    chans = (4, 8)

    class TorchCondEmb(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
            blocks = []
            for i in range(len(chans) - 1):
                blocks.append(nn.Conv2d(chans[i], chans[i], 3, padding=1))
                blocks.append(
                    nn.Conv2d(chans[i], chans[i + 1], 3, padding=1, stride=2)
                )
            self.blocks = nn.ModuleList(blocks)
            self.conv_out = nn.Conv2d(chans[-1], 16, 3, padding=1)

        def forward(self, x):
            h = F.silu(self.conv_in(x))
            for b in self.blocks:
                h = F.silu(b(h))
            return self.conv_out(h)

    m = TorchCondEmb().eval()
    sd = m.state_dict()
    ce = {
        "conv_in": _conv(sd, "conv_in", jnp.float32),
        "blocks": [],
        "conv_out": _conv(sd, "conv_out", jnp.float32),
    }
    i = 0
    while f"blocks.{i}.weight" in sd:
        ce["blocks"].append(_conv(sd, f"blocks.{i}", jnp.float32))
        i += 1

    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        ref = m(x)
    # replicate controlnet_fwd's inline cond-embedding loop
    c = conv2d(_nhwc(x), ce["conv_in"]["w"], ce["conv_in"]["b"], padding=1, act="silu")
    for i in range(0, len(ce["blocks"]), 2):
        c = conv2d(c, ce["blocks"][i]["w"], ce["blocks"][i]["b"], padding=1, act="silu")
        c = conv2d(
            c, ce["blocks"][i + 1]["w"], ce["blocks"][i + 1]["b"],
            padding=1, stride=2, act="silu",
        )
    c = conv2d(c, ce["conv_out"]["w"], ce["conv_out"]["b"], padding=1)
    np.testing.assert_allclose(
        np.asarray(c).transpose(0, 3, 1, 2), ref.numpy(), rtol=2e-4, atol=2e-4
    )


def test_lcm_timestep_embedding_cond_proj_parity():
    """diffusers TimestepEmbedding with cond_proj (LCM-distilled UNets,
    time_cond_proj_dim=256): condition is projected bias-free and added
    to the sinusoidal embedding BEFORE linear_1.  The torch replica's
    state_dict goes through the real converter helper and the converted
    forward must match, including the guidance-scale embedding builder
    (LatentConsistencyModelPipeline.get_guidance_scale_embedding)."""
    from sfast_tpu.interop.convert_unet import _time_embedding

    cin, tdim, cdim = 16, 64, 32

    class TorchTimestepEmbedding(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = nn.Linear(cin, tdim)
            self.linear_2 = nn.Linear(tdim, tdim)
            self.cond_proj = nn.Linear(cdim, cin, bias=False)

        def forward(self, sample, condition):
            sample = sample + self.cond_proj(condition)
            return self.linear_2(F.silu(self.linear_1(sample)))

    m = TorchTimestepEmbedding().eval()
    p = _time_embedding({f"te.{k}": v for k, v in m.state_dict().items()},
                        "te.", jnp.float32)
    assert "cond_proj" in p and "b" not in p["cond_proj"]

    t_emb = torch.randn(2, cin)
    # diffusers get_guidance_scale_embedding(w=guidance-1, dim=cdim)
    w = torch.tensor([7.5 - 1.0, 1.5 - 1.0])
    half = cdim // 2
    emb = torch.exp(
        torch.arange(half, dtype=torch.float32)
        * (-math.log(10000.0) / (half - 1))
    )
    emb = (w * 1000.0)[:, None] * emb[None, :]
    w_emb_ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
    with torch.no_grad():
        ref = m(t_emb, w_emb_ref)

    w_emb = L.guidance_scale_embedding(_j(w), cdim)
    # sin/cos of ~6500-rad arguments: one f32 ulp in the log-spaced freq
    # shifts the phase by ~1e-3 absolute — compare with that tolerance
    np.testing.assert_allclose(
        np.asarray(w_emb), w_emb_ref.numpy(), rtol=0, atol=5e-3
    )
    # module-forward parity with the IDENTICAL embedding (isolates the
    # cond_proj/linear path from the trig tolerance above)
    out = L.time_embedding_fwd(p, _j(t_emb), cond=_j(w_emb_ref))
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy(), rtol=2e-5, atol=2e-5
    )
