"""AutoencoderKLTemporalDecoder (SVD video VAE): structure, temporal
behavior, and converter round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.autoencoder_kl_temporal import (
    SVD_VAE,
    TINY_TEMPORAL_VAE,
    create_temporal_vae,
    init_temporal_vae_params,
)
from sfast_tpu.interop.convert_vae import convert_temporal_vae_params
from sfast_tpu.interop.export_vae import export_temporal_vae_state_dict

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_decode_shapes_and_encoder():
    dec, enc = create_temporal_vae(TINY_TEMPORAL_VAE, jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    mean, logvar = enc(img)
    assert mean.shape == (2, 16, 16, 4)
    frames = jax.random.normal(jax.random.key(2), (4, 16, 16, 4), jnp.float32)
    out = dec(frames, num_frames=4)
    assert out.shape == (4, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_no_post_quant_conv():
    p = init_temporal_vae_params(jax.random.key(0), TINY_TEMPORAL_VAE)
    assert "post_quant_conv" not in p  # diffusers temporal model has none
    assert "quant_conv" in p
    assert "time_conv_out" in p["decoder"]


def test_temporal_smoothing_is_active():
    """Decoding N frames together must differ from decoding them one by
    one — the time_conv_out and temporal resnets look across frames.
    This is exactly the gap a per-frame standard decoder leaves."""
    dec, _ = create_temporal_vae(TINY_TEMPORAL_VAE, jax.random.key(0))
    frames = jax.random.normal(jax.random.key(3), (4, 8, 8, 4), jnp.float32)
    joint = dec(frames, num_frames=4)
    solo = jnp.concatenate(
        [dec(frames[i : i + 1], num_frames=1) for i in range(4)], axis=0
    )
    assert np.abs(np.asarray(joint) - np.asarray(solo)).max() > 1e-4


def test_frame_permutation_changes_output():
    dec, _ = create_temporal_vae(TINY_TEMPORAL_VAE, jax.random.key(0))
    frames = jax.random.normal(jax.random.key(4), (4, 8, 8, 4), jnp.float32)
    a = dec(frames, num_frames=4)
    b = dec(frames[::-1], num_frames=4)
    # if temporal layers were inert, b would be a reversed
    assert np.abs(np.asarray(b) - np.asarray(a[::-1])).max() > 1e-5


def test_converter_roundtrip():
    """export (diffusers naming) → convert → identical tree + identical
    decode output."""
    cfg = TINY_TEMPORAL_VAE
    p0 = init_temporal_vae_params(jax.random.key(5), cfg)
    sd = export_temporal_vae_state_dict(p0, cfg)
    # spot-check diffusers key names
    for k in (
        "decoder.mid_block.resnets.0.spatial_res_block.conv1.weight",
        "decoder.mid_block.resnets.0.temporal_res_block.conv1.weight",
        "decoder.mid_block.resnets.0.time_mixer.mix_factor",
        "decoder.mid_block.attentions.0.to_q.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "decoder.time_conv_out.weight",
        "quant_conv.weight",
    ):
        assert k in sd, k
    assert "post_quant_conv.weight" not in sd
    assert tuple(sd["decoder.time_conv_out.weight"].shape) == (3, 3, 3, 1, 1)

    p1 = convert_temporal_vae_params(sd, cfg)
    dec0, _ = create_temporal_vae(cfg, params=p0)
    dec1, _ = create_temporal_vae(cfg, params=p1)
    z = jax.random.normal(jax.random.key(6), (2, 8, 8, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dec0(z, num_frames=2)),
        np.asarray(dec1(z, num_frames=2)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_full_size_param_structure():
    """Full SVD VAE structure builds (shape-only via eval_shape)."""
    params = jax.eval_shape(
        lambda k: init_temporal_vae_params(k, SVD_VAE), jax.random.key(0)
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    # encoder (~34M) + temporal decoder (~63M): must exceed the standard
    # KL VAE's 83.65M by the temporal-resnet/time_conv_out additions
    assert n > 83_653_863, n
