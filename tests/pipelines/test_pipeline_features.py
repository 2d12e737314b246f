"""Pipeline feature coverage: batch bucketing, SD2.1 penultimate
conditioning, freeze mode, Karras sigmas."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
from sfast_tpu.schedulers import (
    DDIMScheduler,
    EulerDiscreteScheduler,
    SchedulerConfig,
)
from sfast_tpu.pipelines import StableDiffusionPipeline

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def _pipe(scheduler=None, ccfg=CCFG):
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(TINY_UNET, cross_attention_dim=64),
            jax.random.key(1),
        ),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=scheduler or DDIMScheduler(),
        dtype=jnp.float32,
    )
    return sfast_tpu.compile(pipe, ccfg)


def test_batch_bucketing_bounds_executables():
    pipe = _pipe(ccfg=CCFG.replace(batch_buckets=(2, 4)))
    kw = dict(height=32, width=32, num_inference_steps=1, seed=0)
    out1 = pipe(prompt_ids=jnp.ones((1, 77), jnp.int32), **kw)
    n_after_1 = pipe.unet.cache_size
    out2 = pipe(prompt_ids=jnp.ones((2, 77), jnp.int32), **kw)
    assert out1.images.shape[0] == 1  # padding rows dropped
    assert out2.images.shape[0] == 2
    # bs1 padded to the same bucket as bs2 -> no new unet executable
    assert pipe.unet.cache_size == n_after_1
    out3 = pipe(prompt_ids=jnp.ones((3, 77), jnp.int32), **kw)
    assert out3.images.shape[0] == 3  # bucket 4, sliced back


def test_penultimate_conditioning_mode():
    pipe = _pipe()
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=32, width=32, num_inference_steps=1,
              seed=0, output_type="latent")
    last = pipe(**kw).images
    pipe.clip_skip_mode = "penultimate"  # SD2.x conditioning
    pen = pipe(**kw).images
    assert np.abs(np.asarray(last) - np.asarray(pen)).max() > 0


def test_freeze_mode_pipeline():
    pipe = _pipe(ccfg=CCFG.replace(freeze=True))
    out = pipe(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=2, seed=0,
    )
    assert out.images.shape == (1, 32, 32, 3)


def test_karras_sigmas_euler():
    sch = EulerDiscreteScheduler(
        config=SchedulerConfig(use_karras_sigmas=True)
    )
    pipe = _pipe(scheduler=sch)
    out = pipe(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=4, seed=0,
    )
    assert out.images.shape == (1, 32, 32, 3)
