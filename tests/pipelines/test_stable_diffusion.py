"""End-to-end pipeline tests on tiny models (CPU) — the assertable
counterpart of the reference's visual-only e2e benchmarks
(tests/compilers/test_stable_diffusion_pipeline_compiler.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
from sfast_tpu.schedulers import DDIMScheduler, DPMSolverMultistepScheduler
from sfast_tpu.pipelines import StableDiffusionPipeline

import dataclasses

TINY_UNET32 = dataclasses.replace(TINY_UNET, cross_attention_dim=64)


def _tiny_pipe(scheduler=None):
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    return StableDiffusionPipeline(
        unet=create_unet(TINY_UNET32, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=scheduler or DDIMScheduler(),
        dtype=jnp.float32,
    )


CCFG = CompilationConfig.Default().replace(enable_pallas=False)


@pytest.fixture(scope="module")
def compiled_pipe():
    pipe = _tiny_pipe()
    return sfast_tpu.compile(pipe, CCFG)


def test_text2img_end_to_end(compiled_pipe):
    ids = jnp.ones((1, 77), jnp.int32)
    out = compiled_pipe(
        prompt_ids=ids, height=128, width=128, num_inference_steps=3, seed=7
    )
    assert out.images.shape == (1, 128, 128, 3)
    assert out.images.dtype == np.uint8


def test_determinism_same_seed(compiled_pipe):
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=64, width=64, num_inference_steps=2, seed=3)
    a = compiled_pipe(**kw).images
    b = compiled_pipe(**kw).images
    np.testing.assert_array_equal(a, b)
    c = compiled_pipe(prompt_ids=ids, height=64, width=64, num_inference_steps=2, seed=4).images
    assert (a != c).any()


def test_latent_output_and_guidance(compiled_pipe):
    ids = jnp.ones((1, 77), jnp.int32)
    lat = compiled_pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=2,
        output_type="latent", seed=0,
    ).images
    assert lat.shape == (1, 32, 32, 4)  # tiny VAE is a x2 autoencoder
    lat_g0 = compiled_pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=2,
        output_type="latent", seed=0, guidance_scale=1.0,
    ).images
    assert np.abs(np.asarray(lat) - np.asarray(lat_g0)).max() > 0


def test_img2img(compiled_pipe):
    ids = jnp.ones((1, 77), jnp.int32)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    out = compiled_pipe(
        prompt_ids=ids, image=img, strength=0.5, num_inference_steps=4,
        height=64, width=64, seed=1,
    )
    assert out.images.shape == (1, 64, 64, 3)


def test_callback_on_step_end(compiled_pipe):
    ids = jnp.ones((1, 77), jnp.int32)
    seen = []
    compiled_pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=3, seed=0,
        callback_on_step_end=lambda p, i, t, kw: seen.append(i),
    )
    assert seen == [0, 1, 2]


def test_fused_loop_matches_stepwise():
    """The single-executable lax.fori_loop denoise must produce the same
    latents as the stepwise path."""
    pipe = _tiny_pipe(DPMSolverMultistepScheduler())
    sfast_tpu.compile(pipe, CCFG)
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(
        prompt_ids=ids, height=64, width=64, num_inference_steps=4,
        output_type="latent", seed=5,
    )
    stepwise = pipe(**kw).images

    pipe.set_compilation_config(CCFG.replace(fuse_denoising_loop=True))
    fused = pipe(**kw).images
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(fused), rtol=2e-4, atol=2e-4
    )


def test_batch_of_prompts(compiled_pipe):
    ids = jnp.ones((2, 77), jnp.int32)
    out = compiled_pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=2, seed=0
    )
    assert out.images.shape == (2, 64, 64, 3)


def test_map_pipelined_matches_sequential(compiled_pipe):
    """map() (windowed dispatch-ahead serving) must yield exactly the
    images sequential calls produce, in order."""
    ids = [jnp.full((1, 77), i + 1, jnp.int32) for i in range(3)]
    kw = dict(height=64, width=64, num_inference_steps=2, seed=5)
    seq = [compiled_pipe(prompt_ids=i, **kw).images for i in ids]
    piped = [o.images for o in compiled_pipe.map(ids, window=2, **kw)]
    assert len(piped) == len(seq)
    for a, b in zip(seq, piped):
        assert b.dtype == np.uint8
        np.testing.assert_array_equal(a, b)


def test_map_rejects_device_output(compiled_pipe):
    with pytest.raises(ValueError):
        next(compiled_pipe.map([jnp.ones((1, 77), jnp.int32)], output_type="device"))


def test_map_rejects_bad_item_type(compiled_pipe):
    """A non-prompt, non-array item must fail at the surface with a
    clear TypeError, not an AttributeError deep inside __call__
    (ADVICE r4, low)."""
    with pytest.raises(TypeError, match="map\\(\\) items"):
        next(
            compiled_pipe.map(
                [("a", "b")], height=64, width=64, num_inference_steps=2
            )
        )


def test_fused_loop_rekeys_on_step_count_change():
    """A fused loop built for N steps must not be reused for M != N —
    the fori_loop trip count and step-array lengths are baked in (round-1
    silent-wrong-result bug)."""
    pipe = _tiny_pipe(DPMSolverMultistepScheduler())
    sfast_tpu.compile(pipe, CCFG.replace(fuse_denoising_loop=True))
    ids = jnp.ones((1, 77), jnp.int32)

    def run(nsteps, fused):
        pipe.set_compilation_config(
            CCFG.replace(fuse_denoising_loop=fused)
        )
        return pipe(
            prompt_ids=ids, height=64, width=64, num_inference_steps=nsteps,
            output_type="latent", seed=5,
        ).images

    fused6 = run(6, True)
    # now a DIFFERENT step count through the same pipeline object
    pipe.set_compilation_config(CCFG.replace(fuse_denoising_loop=True))
    fused6b = pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=6,
        output_type="latent", seed=5,
    ).images
    fused3 = pipe(
        prompt_ids=ids, height=64, width=64, num_inference_steps=3,
        output_type="latent", seed=5,
    ).images
    np.testing.assert_allclose(np.asarray(fused6), np.asarray(fused6b), rtol=1e-5)
    stepwise3 = run(3, False)
    np.testing.assert_allclose(
        np.asarray(fused3), np.asarray(stepwise3), rtol=2e-4, atol=2e-4
    )


def test_default_uncond_is_bos_eos_pad(compiled_pipe):
    """The synthesized empty-prompt ids are [BOS, EOS, pad...] — not the
    old zeros row (id 0 = '!' in the CLIP vocab)."""
    ids = jnp.full((2, 77), 5, jnp.int32)
    ids = ids.at[:, 0].set(49406)
    neg = compiled_pipe._empty_prompt_ids(ids)
    assert neg.shape == ids.shape
    np.testing.assert_array_equal(np.asarray(neg[:, 0]), 49406)
    eos = 49407
    np.testing.assert_array_equal(np.asarray(neg[:, 1]), eos)
    np.testing.assert_array_equal(np.asarray(neg[:, 2:]), eos)


def test_int8_attention_pipeline_quality(monkeypatch):
    """enable_int8_attention must produce latents close to the bf16
    attention path end-to-end (the quality gate for the int8 MXU trade)."""
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=128, width=128, num_inference_steps=3,
              seed=11, output_type="latent")
    ref_pipe = sfast_tpu.compile(_tiny_pipe(), CCFG)
    ref = np.asarray(ref_pipe(**kw).images)

    # force the int8 kernel on all non-trivial seqs (tiny shapes route to
    # XLA under the auto rule, which would make this test vacuous), in
    # interpret mode so it runs on CPU
    from sfast_tpu.ops import attention as A
    import sfast_tpu.models.layers as L

    orig = A.dot_product_attention

    def forced(q, k, v, **akw):
        if akw.get("backend") == "int8" and q.shape[-2] >= 64:
            akw["backend"] = "flash_int8"
            akw["interpret"] = True
        return orig(q, k, v, **akw)

    monkeypatch.setattr(A, "dot_product_attention", forced)
    monkeypatch.setattr(L, "dot_product_attention", forced)  # import-time bind

    int8_pipe = sfast_tpu.compile(
        _tiny_pipe(),
        CCFG.replace(enable_pallas=True, enable_flash_attention=True,
                     enable_int8_attention=True),
    )
    out = np.asarray(int8_pipe(**kw).images)
    err = np.abs(out - ref)
    rel = np.sqrt((err**2).mean()) / np.sqrt((ref**2).mean())
    assert rel < 0.05, rel  # latent-space RMS within 5% after 3 steps
    assert err.max() > 0  # and the int8 path actually ran (not identical)


def test_fused_pipeline_single_dispatch():
    """fuse_denoising_loop + np output takes the whole-pipeline
    executable (prompt encode → loop → VAE → uint8 in ONE dispatch):
    deterministic per seed, seed-sensitive, and LoRA hot-swap (params are
    arguments, not constants) must change the output without growing the
    signature cache."""
    pipe = _tiny_pipe(DPMSolverMultistepScheduler())
    sfast_tpu.compile(pipe, CCFG.replace(fuse_denoising_loop=True))
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=64, width=64, num_inference_steps=3)

    a = pipe(seed=7, **kw).images
    b = pipe(seed=7, **kw).images
    c = pipe(seed=8, **kw).images
    assert a.shape == (1, 64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)

    fp = pipe._fused_loops[
        ("full", 3, True, False, False, False, True, None)
    ]
    n_sigs = fp.cache_size
    assert n_sigs == 1
    new_params = jax.tree_util.tree_map(
        lambda t: t * 1.05, pipe.unet.params
    )
    pipe.unet.update_params(new_params)
    d = pipe(seed=7, **kw).images
    assert not np.array_equal(a, d)
    assert fp.cache_size == n_sigs


def test_fused_loop_with_controlnet_matches_stepwise():
    """The ControlNet branch compiles INTO the fused loop; latents must
    match the stepwise path exactly (same rng layout on both)."""
    from sfast_tpu.models.controlnet import ControlNetConfig, create_controlnet

    pipe = _tiny_pipe(DPMSolverMultistepScheduler())
    ccfg_c = ControlNetConfig(
        unet=TINY_UNET32, conditioning_embedding_out_channels=(16, 32)
    )
    pipe.controlnet = create_controlnet(ccfg_c, jax.random.key(9))
    ids = jnp.ones((1, 77), jnp.int32)
    ctrl = np.zeros((1, 64, 64, 3), np.uint8)
    kw = dict(
        prompt_ids=ids, height=64, width=64, num_inference_steps=3,
        control_image=ctrl, output_type="latent", seed=4,
    )
    sfast_tpu.compile(pipe, CCFG)
    stepwise = pipe(**kw).images
    pipe.set_compilation_config(CCFG.replace(fuse_denoising_loop=True))
    fused = pipe(**kw).images
    assert (3, True, False, True, None) in pipe._fused_loops
    np.testing.assert_allclose(
        np.asarray(stepwise), np.asarray(fused), rtol=3e-4, atol=3e-4
    )


def test_scheduler_swap_invalidates_fused_loops_and_cached_state():
    """Swapping ``pipe.scheduler`` after compile must rebuild the fused
    loop (it closes over the old scheduler's ``step``) and drop the
    cached device-resident scheduler state — otherwise the new scheduler
    silently runs the old trajectory (or crashes on a state-key
    mismatch, as DPM++'s fused loop did when fed Euler state)."""
    from sfast_tpu.schedulers import EulerDiscreteScheduler

    pipe = _tiny_pipe(DPMSolverMultistepScheduler())
    sfast_tpu.compile(pipe, CCFG.replace(fuse_denoising_loop=True))
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=64, width=64, num_inference_steps=3)

    a = np.asarray(pipe(seed=0, **kw).images)
    b = np.asarray(pipe(seed=0, **kw).images)  # second call: cached state
    np.testing.assert_array_equal(a, b)
    assert 3 in pipe._sched_states

    pipe.scheduler = EulerDiscreteScheduler()
    e = np.asarray(pipe(seed=0, **kw).images)
    assert pipe._sched_obj is pipe.scheduler
    assert (a != e).any()

    pipe.scheduler = DPMSolverMultistepScheduler()
    a2 = np.asarray(pipe(seed=0, **kw).images)
    np.testing.assert_array_equal(a, a2)
