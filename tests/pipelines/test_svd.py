"""SVD: spatio-temporal UNet, EDM scheduler, image-to-video pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_spatio_temporal import (
    TINY_SVD_UNET,
    create_svd_unet,
)
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
from sfast_tpu.models.autoencoder_kl_temporal import (
    TINY_TEMPORAL_VAE,
    create_temporal_vae,
)
from sfast_tpu.models.clip_vision import TINY_IMAGE_ENCODER, create_image_encoder
from sfast_tpu.schedulers.edm_euler import EDMEulerScheduler
from sfast_tpu.pipelines.stable_video_diffusion import StableVideoDiffusionPipeline

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_svd_unet_forward_shape():
    unet = create_svd_unet(TINY_SVD_UNET, jax.random.key(0))
    b, f = 2, 4
    x = jax.random.normal(jax.random.key(1), (b, f, 16, 16, 8), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (b, 1, 32), jnp.float32)
    ids = jnp.ones((b, 3), jnp.float32)
    out = unet(x, jnp.array([0.5, 0.5]), ctx, ids)
    assert out.shape == (b, f, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_svd_unet_temporal_mixing_is_active():
    """Permuting frames must change per-frame outputs (temporal layers
    actually look across frames)."""
    unet = create_svd_unet(TINY_SVD_UNET, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16, 8), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 1, 32), jnp.float32)
    ids = jnp.ones((1, 3), jnp.float32)
    out = unet(x, jnp.array([0.5]), ctx, ids)
    out_perm = unet(x[:, ::-1], jnp.array([0.5]), ctx, ids)
    # frame 0 of the permuted input is frame 3 of the original; if temporal
    # layers were inert, out_perm would just be out reversed
    assert np.abs(np.asarray(out_perm) - np.asarray(out[:, ::-1])).max() > 1e-4


def test_edm_scheduler_exact_denoising():
    """With a model that returns the exact EDM target, one Euler step must
    land on x0 + sigma_next * n."""
    sch = EDMEulerScheduler(sigma_max=10.0)
    st = sch.set_timesteps(8)
    k1, k2 = jax.random.split(jax.random.key(0))
    x0 = jax.random.normal(k1, (1, 4, 4, 4)) * 0.5
    n = jax.random.normal(k2, (1, 4, 4, 4))
    for i in range(8):
        sigma = st["sigmas"][i]
        x = x0 + sigma * n
        c_skip, c_out, c_in = sch._c(sigma)
        # model output F such that c_skip*x + c_out*F == x0
        target = (x0 - c_skip * x) / c_out
        prev, _ = sch.step(st, target, i, x)
        expected = x0 + st["sigmas"][i + 1] * n
        np.testing.assert_allclose(
            np.asarray(prev), np.asarray(expected), rtol=2e-3, atol=2e-3
        )


def test_edm_scale_model_input():
    sch = EDMEulerScheduler()
    st = sch.set_timesteps(4)
    x = jnp.ones((1, 2, 2, 2))
    scaled = sch.scale_model_input(st, x, 0)
    expected = 1.0 / np.sqrt(float(st["sigmas"][0]) ** 2 + 1)
    np.testing.assert_allclose(np.asarray(scaled)[0, 0, 0, 0], expected, rtol=1e-4)


@pytest.fixture(scope="module")
def svd_pipe():
    # real SVD checkpoints ship AutoencoderKLTemporalDecoder — the
    # pipeline decodes through it with frame-aware chunks
    dec, enc = create_temporal_vae(TINY_TEMPORAL_VAE, jax.random.key(0))
    pipe = StableVideoDiffusionPipeline(
        unet=create_svd_unet(TINY_SVD_UNET, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        image_encoder=create_image_encoder(TINY_IMAGE_ENCODER, jax.random.key(2)),
        dtype=jnp.float32,
    )
    return sfast_tpu.compile(pipe, CCFG)


def test_svd_pipeline_standard_vae_still_works():
    """Per-frame decode with a standard KL decoder remains supported."""
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableVideoDiffusionPipeline(
        unet=create_svd_unet(TINY_SVD_UNET, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        image_encoder=create_image_encoder(TINY_IMAGE_ENCODER, jax.random.key(2)),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    img = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    out = pipe(img, num_frames=2, height=32, width=32, num_inference_steps=1)
    assert out.images.shape == (1, 2, 32, 32, 3)


def test_svd_pipeline_end_to_end(svd_pipe):
    img = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    out = svd_pipe(
        img, num_frames=4, height=32, width=32, num_inference_steps=2, seed=0,
        decode_chunk_size=2,
    )
    assert out.images.shape == (1, 4, 32, 32, 3)
    assert out.images.dtype == np.uint8


def test_svd_pipeline_latent_output_and_determinism(svd_pipe):
    img = np.random.RandomState(1).randint(0, 255, (1, 32, 32, 3), np.uint8)
    kw = dict(
        num_frames=4, height=32, width=32, num_inference_steps=2, seed=3,
        output_type="latent",
    )
    a = svd_pipe(img, **kw).images
    b = svd_pipe(img, **kw).images
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1, 4, 16, 16, 4)


def test_svd_fused_loop_matches_stepwise(svd_pipe):
    """fuse_denoising_loop compiles the whole SVD denoise loop into one
    executable; latents must match the stepwise path exactly."""
    import numpy as np
    import sfast_tpu
    from sfast_tpu.config import CompilationConfig

    kw = dict(
        num_frames=3, height=32, width=32, num_inference_steps=3,
        decode_chunk_size=2, seed=0, output_type="latent",
    )
    img = np.zeros((1, 32, 32, 3), np.uint8)
    lat_step = np.asarray(svd_pipe(img, **kw).images)
    svd_pipe.set_compilation_config(
        svd_pipe._ccfg.replace(fuse_denoising_loop=True)
    )
    lat_fused = np.asarray(svd_pipe(img, **kw).images)
    svd_pipe.set_compilation_config(
        svd_pipe._ccfg.replace(fuse_denoising_loop=False)
    )
    np.testing.assert_allclose(lat_step, lat_fused, rtol=2e-4, atol=2e-4)
