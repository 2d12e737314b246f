"""ControlNet structural tests + end-to-end with the SD pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.controlnet import (
    TINY_CONTROLNET,
    SD15_CONTROLNET,
    create_controlnet,
    init_controlnet_params,
)
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
from sfast_tpu.schedulers import DDIMScheduler
from sfast_tpu.pipelines import StableDiffusionPipeline

CCFG = CompilationConfig.Default().replace(enable_pallas=False)
TINY_CN = dataclasses.replace(
    TINY_CONTROLNET,
    unet=dataclasses.replace(TINY_UNET, cross_attention_dim=64),
)


def test_controlnet_output_structure():
    cn = create_controlnet(TINY_CN, jax.random.key(0))
    # latent 16x16 (pixel 32x32 for the x2 tiny VAE world: conditioning
    # embedding has one stride-2 conv, so control image is 32x32)
    lat = jax.random.normal(jax.random.key(1), (2, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (2, 7, 64), jnp.float32)
    cond = jnp.ones((2, 32, 32, 3), jnp.float32)
    down, mid = cn(lat, jnp.array([5.0, 5.0]), ctx, cond)
    # conv_in + 1 resnet/block*2 blocks + 1 downsample = 4 residuals
    assert len(down) == 4
    assert down[0].shape == (2, 16, 16, 32)
    assert down[-1].shape == (2, 8, 8, 64)
    assert mid.shape == (2, 8, 8, 64)


def test_zero_init_outputs_are_zero():
    """Fresh ControlNet has zero projections -> residuals are exactly 0
    (the safe-start property of ControlNet)."""
    cn = create_controlnet(TINY_CN, jax.random.key(0))
    lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 64), jnp.float32)
    cond = jnp.ones((1, 32, 32, 3), jnp.float32)
    down, mid = cn(lat, jnp.array([5.0]), ctx, cond)
    for r in down:
        np.testing.assert_array_equal(np.asarray(r), 0)
    np.testing.assert_array_equal(np.asarray(mid), 0)


def test_conditioning_scale():
    cn = create_controlnet(TINY_CN, jax.random.key(0))
    # make projections nonzero
    params = cn.params
    params["controlnet_mid_block"]["w"] = (
        jnp.ones_like(params["controlnet_mid_block"]["w"]) * 0.01
    )
    lat = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 64), jnp.float32)
    cond = jnp.ones((1, 32, 32, 3), jnp.float32)
    _, mid1 = cn(lat, jnp.array([5.0]), ctx, cond, conditioning_scale=1.0)
    _, mid2 = cn(lat, jnp.array([5.0]), ctx, cond, conditioning_scale=2.0)
    np.testing.assert_allclose(
        np.asarray(mid2), 2 * np.asarray(mid1), rtol=1e-4, atol=1e-6
    )


def test_pipeline_with_controlnet_end_to_end():
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(TINY_CN.unet, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        controlnet=create_controlnet(TINY_CN, jax.random.key(3)),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    ids = jnp.ones((1, 77), jnp.int32)
    # control image resolution = latent res x 2^(stride-2 convs in the
    # conditioning embedding); tiny config has one -> 2*16 = 32
    cond = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    out = pipe(
        prompt_ids=ids, height=32, width=32, num_inference_steps=2, seed=0,
        control_image=cond,
    )
    assert out.images.shape == (1, 32, 32, 3)

    # nonzero projections must change the result vs no control
    base = pipe(prompt_ids=ids, height=32, width=32, num_inference_steps=2, seed=0)
    # zero-init controlnet => identical output
    np.testing.assert_array_equal(out.images, base.images)


def test_sd15_controlnet_param_count():
    """diffusers SD1.5 ControlNet has 361_279_120 params."""
    params = init_controlnet_params(0, SD15_CONTROLNET)
    n = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))
    assert n == 361_279_120, n


def test_fused_loop_matches_stepwise_with_control():
    """The fused loop hoists the control-image hint embedding out of the
    denoising loop (computed once per call); the stepwise path computes
    it per step inside controlnet_fwd.  Both must produce identical
    latents — with NONZERO output projections so the control branch
    actually contributes."""

    def build(fuse):
        dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
        cn = create_controlnet(TINY_CN, jax.random.key(3))
        # perturb the zero-init output convs so control residuals matter
        p = jax.tree_util.tree_map(lambda x: x, cn.params)
        for zc in list(p["controlnet_down_blocks"]) + [p["controlnet_mid_block"]]:
            zc["w"] = jnp.ones_like(zc["w"]) * 0.05
        cn.params = p
        pipe = StableDiffusionPipeline(
            unet=create_unet(TINY_CN.unet, jax.random.key(1)),
            vae=dec,
            vae_encode=enc,
            text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
            controlnet=cn,
            scheduler=DDIMScheduler(),
            dtype=jnp.float32,
        )
        sfast_tpu.compile(pipe, CCFG.replace(fuse_denoising_loop=fuse))
        return pipe

    ids = jnp.ones((1, 77), jnp.int32)
    cond = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    kw = dict(
        prompt_ids=ids, height=32, width=32, num_inference_steps=3, seed=0,
        control_image=cond, output_type="latent",
    )
    lat_fused = np.asarray(build(True)(**kw).images)
    lat_step = np.asarray(build(False)(**kw).images)
    # control must contribute (vs no control image at all)
    lat_nc = np.asarray(
        build(True)(
            prompt_ids=ids, height=32, width=32, num_inference_steps=3,
            seed=0, output_type="latent",
        ).images
    )
    assert np.abs(lat_fused - lat_nc).max() > 0
    np.testing.assert_allclose(lat_fused, lat_step, rtol=2e-4, atol=2e-4)
