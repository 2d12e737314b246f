"""AutoencoderTiny (TAESD) tests: shapes, pipeline drop-in."""

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.autoencoder_tiny import (
    TAESD,
    TINY_TEST_TAESD,
    create_tiny_vae,
    init_tiny_vae_params,
)
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
from sfast_tpu.schedulers import DDIMScheduler
from sfast_tpu.pipelines import StableDiffusionPipeline
import dataclasses

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_tiny_vae_shapes():
    dec, enc = create_tiny_vae(TINY_TEST_TAESD, jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (1, 32, 32, 3), jnp.float32)
    mean, logvar = enc(img)
    assert mean.shape == (1, 16, 16, 4)  # 2 stages -> one downsample
    out = dec(mean)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_taesd_param_count_ballpark():
    """TAESD is ~2.4M params (1.2M per side); structure sanity."""
    params = init_tiny_vae_params(0, TAESD)
    n = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))
    assert 2_000_000 < n < 3_000_000, n


def test_tiny_vae_as_pipeline_drop_in():
    """The reference swaps TAESD in for fast benchmarks — same here."""
    dec, enc = create_tiny_vae(TINY_TEST_TAESD, jax.random.key(0))
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
    sfast_tpu.compile(pipe, CCFG)
    out = pipe(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=2, seed=0,
    )
    assert out.images.shape == (1, 32, 32, 3)
