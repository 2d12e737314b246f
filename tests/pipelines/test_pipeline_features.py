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


def test_ip_adapter_through_pipeline():
    """IP-Adapter image tokens flow through the pipeline call into every
    attn2 (community ControlNet+IP-Adapter config)."""
    import dataclasses as dc
    from sfast_tpu.ip_adapter import init_ip_adapter_params, ip_image_embed

    cfg_u = dc.replace(TINY_UNET, cross_attention_dim=64)
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    unet = create_unet(cfg_u, jax.random.key(1))
    ip_params, image_proj = init_ip_adapter_params(
        jax.random.key(5), cfg_u, unet.params, clip_embed_dim=32
    )
    pipe = StableDiffusionPipeline(
        unet=unet.replace_params(ip_params),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    tokens = ip_image_embed(image_proj, jnp.ones((1, 32)))
    tokens = jnp.concatenate([jnp.zeros_like(tokens), tokens], axis=0)  # CFG
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=32, width=32, num_inference_steps=2,
              seed=0, output_type="latent")
    base = pipe(**kw).images
    with_ip = pipe(ip_adapter_embeds=tokens, **kw).images
    assert np.abs(np.asarray(base) - np.asarray(with_ip)).max() > 0
    zero_scale = pipe(ip_adapter_embeds=tokens, ip_adapter_scale=0.0, **kw).images
    np.testing.assert_allclose(np.asarray(zero_scale), np.asarray(base), atol=1e-5)


def test_instant_id_composition_controlnet_plus_ip_adapter():
    """InstantID = ControlNet (spatial keypoints) + IP-Adapter (identity
    tokens) in ONE pipeline call (≙ reference
    examples/optimize_instant_id_pipeline.py composition).  Both branches
    must be active and independently scalable."""
    import dataclasses as dc
    from sfast_tpu.ip_adapter import init_ip_adapter_params, ip_image_embed
    from sfast_tpu.models.controlnet import ControlNetConfig, create_controlnet

    cfg_u = dc.replace(TINY_UNET, cross_attention_dim=64)
    cfg_c = ControlNetConfig(
        unet=cfg_u, conditioning_embedding_out_channels=(16, 32)
    )
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    unet = create_unet(cfg_u, jax.random.key(1))
    ip_params, image_proj = init_ip_adapter_params(
        jax.random.key(5), cfg_u, unet.params, clip_embed_dim=32
    )
    controlnet = create_controlnet(cfg_c, jax.random.key(3))
    # the output convs are ZERO-initialized (diffusers zero-conv design),
    # so a fresh ControlNet is inert by construction — randomize them so
    # the branch actually contributes in this test
    cn_params = dict(controlnet.params)
    cn_params["controlnet_down_blocks"] = [
        jax.tree_util.tree_map(
            lambda a: jax.random.normal(jax.random.key(11 + i), a.shape, a.dtype)
            * 0.1,
            zc,
        )
        for i, zc in enumerate(cn_params["controlnet_down_blocks"])
    ]
    cn_params["controlnet_mid_block"] = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.key(99), a.shape, a.dtype) * 0.1,
        cn_params["controlnet_mid_block"],
    )
    pipe = StableDiffusionPipeline(
        unet=unet.replace_params(ip_params),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        controlnet=controlnet.replace_params(cn_params),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    tokens = ip_image_embed(image_proj, jnp.ones((1, 32)))
    tokens = jnp.concatenate([jnp.zeros_like(tokens), tokens], axis=0)
    kps = np.zeros((1, 32, 32, 3), np.uint8)
    kps[:, 8:12, 8:12] = 255
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=32, width=32, num_inference_steps=2,
              seed=0, output_type="latent")

    both = pipe(control_image=kps, ip_adapter_embeds=tokens, **kw).images
    only_cn = pipe(control_image=kps, **kw).images
    only_ip = pipe(ip_adapter_embeds=tokens, **kw).images
    # each branch contributes
    assert np.abs(np.asarray(both) - np.asarray(only_cn)).max() > 0
    assert np.abs(np.asarray(both) - np.asarray(only_ip)).max() > 0
    # scales kill each branch independently
    cn_off = pipe(
        control_image=kps, controlnet_conditioning_scale=0.0,
        ip_adapter_embeds=tokens, **kw,
    ).images
    ip_off = pipe(
        control_image=kps, ip_adapter_embeds=tokens, ip_adapter_scale=0.0, **kw
    ).images
    np.testing.assert_allclose(np.asarray(ip_off), np.asarray(only_cn), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn_off), np.asarray(only_ip), atol=1e-4)
    assert np.abs(np.asarray(cn_off) - np.asarray(both)).max() > 0


def _instant_id_pipe():
    """InstantID-style pipe (ControlNet w/ randomized zero-convs +
    IP-Adapter) shared by the stepwise and single-dispatch tests."""
    import dataclasses as dc
    from sfast_tpu.ip_adapter import init_ip_adapter_params, ip_image_embed
    from sfast_tpu.models.controlnet import ControlNetConfig, create_controlnet

    cfg_u = dc.replace(TINY_UNET, cross_attention_dim=64)
    cfg_c = ControlNetConfig(
        unet=cfg_u, conditioning_embedding_out_channels=(16, 32)
    )
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    unet = create_unet(cfg_u, jax.random.key(1))
    ip_params, image_proj = init_ip_adapter_params(
        jax.random.key(5), cfg_u, unet.params, clip_embed_dim=32
    )
    controlnet = create_controlnet(cfg_c, jax.random.key(3))
    cn_params = dict(controlnet.params)
    cn_params["controlnet_down_blocks"] = [
        jax.tree_util.tree_map(
            lambda a: jax.random.normal(jax.random.key(11 + i), a.shape, a.dtype)
            * 0.1,
            zc,
        )
        for i, zc in enumerate(cn_params["controlnet_down_blocks"])
    ]
    cn_params["controlnet_mid_block"] = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.key(99), a.shape, a.dtype) * 0.1,
        cn_params["controlnet_mid_block"],
    )
    pipe = StableDiffusionPipeline(
        unet=unet.replace_params(ip_params),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        controlnet=controlnet.replace_params(cn_params),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    tokens = ip_image_embed(image_proj, jnp.ones((1, 32)))
    tokens = jnp.concatenate([jnp.zeros_like(tokens), tokens], axis=0)
    return pipe, tokens


def test_full_single_dispatch_with_controlnet_and_ip_adapter():
    """ControlNet + IP-Adapter compile INTO the whole-pipeline
    single-dispatch executable (uint8 control image normalized on
    device); the image must match the stepwise path and the cache key
    must carry the branch flags."""
    pipe, tokens = _instant_id_pipe()
    kps = np.zeros((1, 32, 32, 3), np.uint8)
    kps[:, 8:12, 8:12] = 255
    kw = dict(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32, width=32, num_inference_steps=2, seed=0,
        control_image=kps, ip_adapter_embeds=tokens,
    )
    sfast_tpu.compile(pipe, CCFG)
    stepwise = np.asarray(pipe(**kw).images)
    pipe.set_compilation_config(CCFG.replace(fuse_denoising_loop=True))
    fused = np.asarray(pipe(**kw).images)
    # key: (tag, steps, synth_uncond, with_control, ctrl_u8, with_ip)
    assert ("full", 2, True, True, True, True, True, None) in pipe._fused_loops
    assert fused.dtype == np.uint8 and fused.shape == (1, 32, 32, 3)
    # same math, different fusion: allow one uint8 rounding flip
    assert np.abs(fused.astype(int) - stepwise.astype(int)).max() <= 1
    # float control images fall back to host-normalized upload
    fkw = dict(kw)
    fkw["control_image"] = kps.astype(np.float32) / 255.0
    fused_f = np.asarray(pipe(**fkw).images)
    assert ("full", 2, True, True, False, True, True, None) in pipe._fused_loops
    assert np.abs(fused_f.astype(int) - fused.astype(int)).max() <= 1


def test_warmup_precompiles_resolutions():
    """warmup() compiles the fused-full executable per (H, W, steps)
    combo WITHOUT executing; the later real call is a pure cache hit."""
    pipe = _pipe(ccfg=CCFG.replace(fuse_denoising_loop=True))
    out = pipe.warmup(resolutions=((32, 32), (64, 64)), steps=(2,))
    assert out is None
    fp = pipe._fused_loops[("full", 2, True, False, False, False, True, None)]
    assert fp.cache_size == 2  # one executable per resolution
    img = pipe(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=64, width=64, num_inference_steps=2, seed=0,
    ).images
    assert img.shape == (1, 64, 64, 3)
    assert fp.cache_size == 2  # served from the warmed cache


def test_warmup_background_thread():
    pipe = _pipe(ccfg=CCFG.replace(fuse_denoising_loop=True))
    t = pipe.warmup(resolutions=((32, 32),), steps=(2,), background=True)
    t.join(timeout=300)
    assert not t.is_alive()
    assert (
        pipe._fused_loops[("full", 2, True, False, False, False, True, None)].cache_size
        == 1
    )


def test_warmup_after_quantize_serves_quantized_structure():
    """Serving flow: quantize (W8A8 static), then pre-warm resolutions —
    the warmed executables must carry the QUANTIZED param structure so
    the later real call is a pure cache hit."""
    from sfast_tpu.quant import calibrate_pipeline, quantize_pipeline

    pipe = _pipe(ccfg=CCFG.replace(fuse_denoising_loop=True))
    ids = jnp.ones((1, 77), jnp.int32)
    cal = calibrate_pipeline(pipe, ids, height=32, width=32, timesteps=(999,))
    quantize_pipeline(pipe, mode="w8a8", quantize_convs=True, act_scales=cal)
    pipe.warmup(resolutions=((32, 32),), steps=(2,))
    fp = pipe._fused_loops[("full", 2, True, False, False, False, True, None)]
    n = fp.cache_size
    assert n >= 1
    img = pipe(prompt_ids=ids, height=32, width=32, num_inference_steps=2,
               seed=0).images
    assert img.shape == (1, 32, 32, 3)
    assert fp.cache_size == n  # warmed executable reused, no recompile


def test_map_through_controlnet_path_matches_sequential():
    """map() (windowed serving) forwards kwargs to __call__, so the
    ControlNet branch must serve through it unchanged — the sustained
    ControlNet serving bench (benchmarks/bench_extra_configs.py cn-map)
    relies on exactly this path."""
    from sfast_tpu.models.controlnet import ControlNetConfig, create_controlnet

    cfg_u = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(cfg_u, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        controlnet=create_controlnet(
            ControlNetConfig(
                unet=cfg_u, conditioning_embedding_out_channels=(16, 32)
            ),
            jax.random.key(3),
        ),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    control = np.zeros((1, 32, 32, 3), np.uint8)
    control[:, 8:12, 8:12] = 255
    ids = [jnp.full((1, 77), i + 1, jnp.int32) for i in range(3)]
    kw = dict(height=32, width=32, num_inference_steps=2, seed=5,
              control_image=control)
    seq = [pipe(prompt_ids=i, **kw).images for i in ids]
    piped = [o.images for o in pipe.map(ids, window=2, **kw)]
    assert len(piped) == len(seq)
    for a, b in zip(seq, piped):
        np.testing.assert_array_equal(a, b)
