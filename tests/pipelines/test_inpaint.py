"""Image inpainting: masked-latent blend through the public pipeline.

The reference supports inpainting by compiling diffusers'
``StableDiffusionInpaintPipeline`` transparently (README.md:371 "Image
Inpainting: Yes"); here the blend is implemented in the pipeline itself
(``StableDiffusionPipeline._inpaint_blend``): the preserved region is the
original encoded latents forward-noised to each step's level, the repaint
region follows the denoised trajectory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
from sfast_tpu.schedulers import DDIMScheduler
from sfast_tpu.pipelines import StableDiffusionPipeline
from sfast_tpu.utils.image import preprocess_image, preprocess_mask_image

# stepwise-only so the inpaint run and its img2img control take the exact
# same python loop (bitwise-comparable latents)
CCFG = CompilationConfig.Default().replace(
    enable_pallas=False, fuse_denoising_loop=False
)


def _pipe():
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(TINY_UNET, cross_attention_dim=64),
            jax.random.key(1),
        ),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    return sfast_tpu.compile(pipe, CCFG)


def _image(h=32, w=32):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(1, h, w, 3), dtype=np.uint8)


def test_mask_preprocess_orientation_and_shape():
    mask = np.zeros((32, 32), np.uint8)
    mask[:, 16:] = 255  # right half: repaint
    keep = np.asarray(preprocess_mask_image(mask, 4, 4))
    assert keep.shape == (1, 4, 4, 1)
    # keep-mask orientation: white (repaint) -> 0, black (preserve) -> 1
    np.testing.assert_array_equal(keep[0, :, :2, 0], 1.0)
    np.testing.assert_array_equal(keep[0, :, 2:, 0], 0.0)
    # float input in [0,1] and channelled layouts behave the same
    keep_f = np.asarray(
        preprocess_mask_image(mask[..., None].astype(np.float32) / 255.0, 4, 4)
    )
    np.testing.assert_array_equal(keep, keep_f)
    # RGBA: opaque alpha must NOT count as repaint signal (a B/W mask
    # PNG loads as RGBA with alpha=255 everywhere; treating alpha as a
    # channel silently repainted the whole image)
    rgba = np.zeros((32, 32, 4), np.uint8)
    rgba[:, 16:, :3] = 255
    rgba[..., 3] = 255  # fully opaque
    keep_rgba = np.asarray(preprocess_mask_image(rgba, 4, 4))
    np.testing.assert_array_equal(keep, keep_rgba)


def test_all_repaint_mask_equals_img2img():
    pipe = _pipe()
    img = _image()
    kw = dict(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=3, strength=1.0,
        seed=3, guidance_scale=7.5, output_type="latent",
    )
    plain = pipe(image=img, **kw).images
    full_mask = np.full((32, 32), 255, np.uint8)
    inpaint = pipe(image=img, mask_image=full_mask, **kw).images
    # keep_mask == 0 everywhere -> the blend is an exact no-op
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(inpaint))


def test_keep_region_is_original_latents():
    pipe = _pipe()
    img = _image()
    seed = 11
    mask = np.zeros((32, 32), np.uint8)
    mask[:, 16:] = 255  # repaint right half, preserve left half
    out = pipe(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        image=img, mask_image=mask,
        height=32, width=32, num_inference_steps=3, strength=1.0,
        seed=seed, output_type="latent",
    ).images
    # replicate the pipeline's encode RNG to recover the original
    # latents z0 (documented key layout: key -> (key, k_enc, k_noise))
    _, k_enc, _ = jax.random.split(jax.random.key(seed), 3)
    mean, logvar = pipe.vae_encode(preprocess_image(img, jnp.float32))
    z0 = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        k_enc, mean.shape, dtype=jnp.float32
    ).astype(mean.dtype)
    z0 = np.asarray(z0 * pipe.vae_config.scaling_factor, np.float32)
    out = np.asarray(out, np.float32)
    lw = out.shape[2]
    # final blend step uses the CLEAN original latents in the keep region
    np.testing.assert_allclose(
        out[:, :, : lw // 2], z0[:, :, : lw // 2], rtol=0, atol=0
    )
    # and the repaint region actually got denoised away from z0
    assert np.abs(out[:, :, lw // 2 :] - z0[:, :, lw // 2 :]).max() > 1e-3


def test_mask_without_image_raises():
    pipe = _pipe()
    mask = np.full((32, 32), 255, np.uint8)
    try:
        pipe(
            prompt_ids=jnp.ones((1, 77), jnp.int32),
            mask_image=mask, height=32, width=32, num_inference_steps=1,
        )
    except ValueError as e:
        assert "mask_image" in str(e)
    else:
        raise AssertionError("expected ValueError for mask without image")
