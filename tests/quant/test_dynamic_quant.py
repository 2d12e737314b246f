"""Int8 weight-only quantization (≙ reference
tests/operators/test_cutlass_qlinear.py + README.md:267-289 usage)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.ops.quant import int8_linear, quantize_weight
from sfast_tpu.quant import quantize_linear_params
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 32), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8
    deq = wq.astype(jnp.float32) * scale
    # per-channel int8: worst-case error = scale/2 per element
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_int8_linear_close_to_fp(tolerance=2e-2):
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k1, (8, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32), jnp.float32) * 0.1
    b = jax.random.normal(k3, (32,), jnp.float32)
    wq, scale = quantize_weight(w)
    out = int8_linear(x, wq, scale, b)
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=tolerance, atol=tolerance)


def test_quantize_unet_params_structure():
    unet = create_unet(TINY_UNET, jax.random.key(0))
    qparams = quantize_linear_params(unet.params, min_features=1)
    attn = qparams["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]
    assert "w_q" in attn["to_q"] and attn["to_q"]["w_q"].dtype == jnp.int8
    assert "w" not in attn["to_q"]
    # convs untouched
    assert "w" in qparams["conv_in"]


def test_quantized_unet_runs_and_is_close():
    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([100.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 64), jnp.float32)
    ref = unet(x, t, ctx)

    q = unet.replace_params(quantize_linear_params(unet.params, min_features=1))
    out = q(x, t, ctx)
    assert out.shape == ref.shape
    # int8 error is small relative to activations
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-6
    )
    assert rel < 0.1, rel


def test_quantized_memory_halves():
    unet = create_unet(TINY_UNET, jax.random.key(0))

    def nbytes(t):
        return sum(
            np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(t)
        )

    before = nbytes(unet.params)
    after = nbytes(quantize_linear_params(unet.params, min_features=1))
    assert after < before


def test_compiled_quantized_model():
    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    q = unet.replace_params(quantize_linear_params(unet.params, min_features=1))
    compiled = sfast_tpu.compile_unet(q, CCFG)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    out = compiled(x, jnp.array([1.0]), jnp.zeros((1, 7, 64)))
    assert bool(jnp.isfinite(out).all())
    assert compiled.cache_size == 1


def test_w8a8_conv_close_to_fp():
    from sfast_tpu.ops.quant import conv2d_w8a8, quantize_conv_weight
    from sfast_tpu.ops.conv import conv2d

    k1, k2 = jax.random.split(jax.random.key(7))
    x = jax.random.normal(k1, (1, 8, 8, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 32), jnp.float32) * 0.1
    ref = conv2d(x, w, None, padding=1)
    wq, ws = quantize_conv_weight(w)
    out = conv2d_w8a8(x, wq, ws, None, padding=1)
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-6
    )
    assert rel < 0.05, rel


def test_w8a8_unet_runs():
    cfg = dataclasses.replace(TINY_UNET, cross_attention_dim=64)
    unet = create_unet(cfg, jax.random.key(0))
    from sfast_tpu.quant import quantize_conv_params

    q = unet.replace_params(
        quantize_conv_params(unet.params, min_channels=1)
    )
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4), jnp.float32)
    out = q(x, jnp.array([5.0]), jnp.zeros((1, 7, 64)))
    ref = unet(x, jnp.array([5.0]), jnp.zeros((1, 7, 64)))
    assert out.shape == ref.shape
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-6
    )
    assert rel < 0.2, rel


def test_w8a8_linear_close_to_fp():
    from sfast_tpu.ops.quant import linear_w8a8, quantize_weight

    x = jax.random.normal(jax.random.key(0), (32, 128), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (128, 64), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.key(2), (64,), jnp.float32)
    wq, scale = quantize_weight(w)
    out = linear_w8a8(x, wq, scale, b)
    ref = x @ w + b
    err = jnp.abs(out - ref).max() / jnp.abs(ref).max()
    assert float(err) < 3e-2, float(err)


def test_w8a8_mode_routes_through_full_int8():
    """mode='w8a8' stores w_q8 and apply_linear picks the full-int8 path."""
    from sfast_tpu.quant.dynamic_quant import quantize_linear_params
    from sfast_tpu.models import layers as L

    params = {"to_q": {"w": jax.random.normal(jax.random.key(0), (128, 128), jnp.float32) * 0.1}}
    q = quantize_linear_params(params, mode="w8a8")
    assert "w_q8" in q["to_q"] and "w" not in q["to_q"]
    x = jax.random.normal(jax.random.key(1), (4, 128), jnp.float32)
    out = L.apply_linear(q["to_q"], x)
    ref = x @ params["to_q"]["w"]
    err = jnp.abs(out - ref).max() / jnp.abs(ref).max()
    assert float(err) < 4e-2, float(err)


def test_quantize_pipeline_w8a8_end_to_end():
    """quantize_pipeline rewrites the UNet tree (w -> w_q8) through the
    CompiledModel (allow_restructure) and the pipeline still produces a
    close latent trajectory — the CPU version of bench_w8a8's on-device
    agreement bound."""
    import sfast_tpu
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.quant import quantize_pipeline
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler
    import dataclasses
    import jax
    import numpy as np

    from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet

    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(TINY_UNET, cross_attention_dim=64),
            jax.random.key(1),
        ),
        vae=dec, vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DPMSolverMultistepScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(
        pipe, CompilationConfig.Default().replace(enable_pallas=False)
    )
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(height=32, width=32, num_inference_steps=4, seed=0,
              output_type="latent")
    ref = np.asarray(pipe(prompt_ids=ids, **kw).images, np.float32)

    quantize_pipeline(pipe, mode="w8a8", quantize_convs=True)
    q = pipe.unet.params
    leaves = jax.tree_util.tree_leaves(q)
    assert any(l.dtype == jnp.int8 for l in leaves)  # really quantized
    got = np.asarray(pipe(prompt_ids=ids, **kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.25, rel  # int8 trajectory stays close over 4 steps


def test_calibrated_static_w8a8_end_to_end():
    """calibrate_pipeline captures per-site activation ranges under jit
    (site enumeration via eval_shape + ordered amax capture), and the
    static-scale W8A8 path reproduces the bf16 trajectory closely."""
    import dataclasses

    import sfast_tpu
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
    from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.quant import calibrate_pipeline, quantize_pipeline
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler

    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(TINY_UNET, cross_attention_dim=64),
            jax.random.key(1),
        ),
        vae=dec, vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DPMSolverMultistepScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(
        pipe, CompilationConfig.Default().replace(enable_pallas=False)
    )
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(height=32, width=32, num_inference_steps=4, seed=0,
              output_type="latent")
    ref = np.asarray(pipe(prompt_ids=ids, **kw).images, np.float32)

    cal = calibrate_pipeline(
        pipe, ids, height=32, width=32, timesteps=(999, 400)
    )
    assert len(cal.amax) > 10  # linear + conv sites captured
    assert all(v > 0 for v in cal.amax.values())

    quantize_pipeline(pipe, mode="w8a8", quantize_convs=True, act_scales=cal)
    # structural check: a_scale present in the rebuilt tree
    assert "a_scale" in str(jax.tree_util.tree_structure(pipe.unet.params))

    got = np.asarray(pipe(prompt_ids=ids, **kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.25, rel


def test_packed_static_w8a8_single_executable_path():
    """The TPU bench path: params PACKED, calibration over a zero-byte
    host placeholder tree, quantize as ONE jitted unpack→quantize→repack
    executable.  Must bake the SAME scales at the SAME sites as the eager
    unpacked transform (path-keyed scales survive pack/trace, where
    object ids would not).

    Comparison is on the quantized TREES plus a statistical latent bound
    — NOT allclose on final latents: the packed and dict-param pipelines
    are different executables, whose max-reductions differ by ~1 f32 ulp
    (measured 1.2e-7); one ulp of a_scale flips int8 rounding at
    boundaries and 4 denoise steps amplify that chaotically."""
    import dataclasses

    import sfast_tpu
    from sfast_tpu.config import CompilationConfig
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
    from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.quant import calibrate_pipeline, quantize_pipeline
    from sfast_tpu.runtime.packed_params import PackedParams, pack_tree
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler

    def build(params):
        dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
        pipe = StableDiffusionPipeline(
            unet=create_unet(
                dataclasses.replace(TINY_UNET, cross_attention_dim=64),
                params=params,
            ),
            vae=dec, vae_encode=enc,
            text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
            scheduler=DPMSolverMultistepScheduler(),
            dtype=jnp.float32,
        )
        sfast_tpu.compile(
            pipe, CompilationConfig.Default().replace(enable_pallas=False)
        )
        return pipe

    raw = create_unet(
        dataclasses.replace(TINY_UNET, cross_attention_dim=64),
        jax.random.key(1),
    ).params
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=32, width=32, num_inference_steps=4,
              seed=0, output_type="latent")

    # eager/unpacked reference path
    pipe_u = build(raw)
    cal_u = calibrate_pipeline(pipe_u, ids, height=32, width=32,
                               timesteps=(999, 400))
    quantize_pipeline(pipe_u, mode="w8a8", quantize_convs=True,
                      act_scales=cal_u)
    ref = np.asarray(pipe_u(**kw).images, np.float32)

    # packed path (what the device bench runs)
    pipe_p = build(pack_tree(raw))
    cal_p = calibrate_pipeline(pipe_p, ids, height=32, width=32,
                               timesteps=(999, 400))
    assert cal_p.amax, "no sites captured on the packed path"
    # path keys AND measured ranges must agree between the packed and
    # unpacked calibrations (values to reduction-order ulps)
    assert set(cal_p.amax) == set(cal_u.amax)
    for k, v in cal_u.amax.items():
        assert abs(cal_p.amax[k] - v) <= 1e-4 * max(abs(v), 1e-6), (k, v)
    quantize_pipeline(pipe_p, mode="w8a8", quantize_convs=True,
                      act_scales=cal_p)
    assert isinstance(pipe_p.unet.params, PackedParams)
    assert "a_scale" in str(pipe_p.unet.params.treedef)

    # the strong check: the packed transform quantized the SAME sites to
    # the SAME int8 weights and (ulp-close) scales as the eager one
    flat_u = jax.tree_util.tree_flatten_with_path(pipe_u.unet.params)[0]
    flat_p = {
        tuple(str(k) for k in p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(
            pipe_p.unet.params.unpack()
        )[0]
    }
    n_q = n_a = 0
    for p, leaf_u in flat_u:
        key = tuple(str(k) for k in p)
        a, b = np.asarray(leaf_u), np.asarray(flat_p[key])
        assert a.shape == b.shape, key
        if a.dtype == np.int8:
            n_q += 1
            # identical quantized weights modulo a 1-ulp scale flip
            assert np.mean(a != b) < 1e-3, key
        elif "scale" in key[-1]:
            n_a += "a_scale" in key[-1]
            np.testing.assert_allclose(b, a, rtol=1e-4, err_msg=str(key))
    assert n_q >= 10 and n_a >= 10, (n_q, n_a)

    # trajectory bound: loose (cross-executable ulps amplify over steps),
    # catches gross scale/site misrouting
    got = np.asarray(pipe_p(**kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.15, rel


def test_sdxl_calibrated_static_w8a8_end_to_end():
    """SDXL calibration must feed the UNet its REQUIRED added
    conditioning (dual-encoder context + text_embeds/time_ids) — the
    SD1.5-shaped calibration forward fails on the XL architecture."""
    from tests.pipelines.test_sdxl_lcm import _xl_pipe, CCFG as XL_CCFG

    import sfast_tpu
    from sfast_tpu.quant import calibrate_pipeline, quantize_pipeline

    pipe = sfast_tpu.compile(_xl_pipe(), XL_CCFG)
    ids = jnp.ones((1, 77), jnp.int32)
    kw = dict(prompt_ids=ids, height=64, width=64, num_inference_steps=3,
              seed=0, output_type="latent")
    ref = np.asarray(pipe(**kw).images, np.float32)

    cal = calibrate_pipeline(pipe, ids, height=64, width=64,
                             timesteps=(999, 400))
    assert len(cal.amax) > 10, len(cal.amax)
    quantize_pipeline(pipe, mode="w8a8", quantize_convs=True, act_scales=cal)
    assert "a_scale" in str(jax.tree_util.tree_structure(pipe.unet.params))
    got = np.asarray(pipe(**kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.25, rel


def test_svd_calibrated_static_w8a8_end_to_end():
    """SVD calibration drives the spatio-temporal UNet with the
    pipeline's own conditioning (prepare_conditioning) and EDM-scaled
    latents; the quantized pipeline must stay on the bf16 trajectory.
    Covers the video path of quantize_pipeline: spatial resnet convs,
    attention/FF linears AND the (3,1,C,C) temporal convs go int8."""
    from sfast_tpu.models.autoencoder_kl_temporal import (
        TINY_TEMPORAL_VAE,
        create_temporal_vae,
    )
    from sfast_tpu.models.clip_vision import (
        TINY_IMAGE_ENCODER,
        create_image_encoder,
    )
    from sfast_tpu.models.unet_spatio_temporal import (
        TINY_SVD_UNET,
        create_svd_unet,
    )
    from sfast_tpu.pipelines.stable_video_diffusion import (
        StableVideoDiffusionPipeline,
    )
    from sfast_tpu.quant import calibrate_svd_pipeline, quantize_pipeline

    dec, enc = create_temporal_vae(TINY_TEMPORAL_VAE, jax.random.key(0))
    pipe = StableVideoDiffusionPipeline(
        unet=create_svd_unet(TINY_SVD_UNET, jax.random.key(1)),
        vae=dec,
        vae_encode=enc,
        image_encoder=create_image_encoder(TINY_IMAGE_ENCODER, jax.random.key(2)),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    img = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    kw = dict(
        num_frames=4, height=32, width=32, num_inference_steps=3, seed=0,
        output_type="latent",
    )
    ref = np.asarray(pipe(img, **kw).images, np.float32)

    cal = calibrate_svd_pipeline(
        pipe, img, height=32, width=32, num_frames=4,
        num_inference_steps=3, step_indices=(0, 2),
    )
    assert len(cal.amax) > 10, len(cal.amax)
    assert all(v > 0 for v in cal.amax.values())

    quantize_pipeline(pipe, mode="w8a8", quantize_convs=True, act_scales=cal)
    tree_str = str(jax.tree_util.tree_structure(pipe.unet.params))
    assert "a_scale" in tree_str
    leaves = jax.tree_util.tree_leaves(pipe.unet.params)
    assert any(l.dtype == jnp.int8 for l in leaves)
    # the 4-D temporal convs are quantizable sites now — at least one
    # ("temporal", "conv1"/"conv2") path must carry int8 weights
    flat = jax.tree_util.tree_flatten_with_path(pipe.unet.params)[0]
    temporal_q = [
        path
        for path, leaf in flat
        if leaf.dtype == jnp.int8
        and any(getattr(k, "key", None) == "temporal" for k in path)
    ]
    assert temporal_q, "no temporal conv was quantized"

    got = np.asarray(pipe(img, **kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.25, rel


def test_controlnet_calibrated_w8a8_end_to_end():
    """Joint UNet+ControlNet calibration feeds the ControlNet residuals
    into the UNet during the amax pass (the served distribution), the
    amax dict splits cleanly by model prefix, and the fully-quantized
    (UNet + CN trunk) pipeline stays on the bf16 trajectory.  Zero-conv
    projections and the cond-embedding stack must remain full precision."""
    from tests.models.test_controlnet import TINY_CN
    from sfast_tpu.models.controlnet import create_controlnet
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.quant import calibrate_controlnet_pipeline, quantize_pipeline
    from sfast_tpu.schedulers import DDIMScheduler

    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    cn = create_controlnet(TINY_CN, jax.random.key(3))
    # make the projections nonzero so the CN branch actually shapes the
    # trajectory (fresh ControlNet outputs exact zeros by design)
    cn.params["controlnet_mid_block"]["w"] = (
        jnp.ones_like(cn.params["controlnet_mid_block"]["w"]) * 0.02
    )
    for zc in cn.params["controlnet_down_blocks"]:
        zc["w"] = jnp.ones_like(zc["w"]) * 0.02
    pipe = StableDiffusionPipeline(
        unet=create_unet(TINY_CN.unet, jax.random.key(1)),
        vae=dec, vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        controlnet=cn,
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    sfast_tpu.compile(pipe, CCFG)
    ids = jnp.ones((1, 77), jnp.int32)
    cond = np.random.RandomState(0).randint(0, 255, (1, 32, 32, 3), np.uint8)
    kw = dict(prompt_ids=ids, height=32, width=32, num_inference_steps=3,
              seed=0, control_image=cond, output_type="latent")
    ref = np.asarray(pipe(**kw).images, np.float32)

    cal_u, cal_cn = calibrate_controlnet_pipeline(
        pipe, ids, cond, height=32, width=32, timesteps=(999, 400)
    )
    assert len(cal_u.amax) > 10 and len(cal_cn.amax) > 5
    # prefixes were stripped: keys are model-relative tree paths
    assert all(k[0] in ("down_blocks", "mid_block", "up_blocks", "conv_in",
                        "conv_out", "time_embedding", "add_embedding",
                        "controlnet_cond_embedding", "controlnet_down_blocks",
                        "controlnet_mid_block")
               for cal in (cal_u, cal_cn) for k in cal.amax)

    quantize_pipeline(
        pipe, mode="w8a8", quantize_convs=True, act_scales=cal_u,
        quantize_controlnet=True, controlnet_act_scales=cal_cn,
    )
    cn_leaves_with_path = jax.tree_util.tree_flatten_with_path(
        pipe.controlnet.params
    )[0]
    assert any(l.dtype == jnp.int8 for _, l in cn_leaves_with_path)
    for path, leaf in cn_leaves_with_path:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if "controlnet_down_blocks" in keys or "controlnet_mid_block" in keys:
            assert leaf.dtype != jnp.int8, path  # projections stay fp
        if "controlnet_cond_embedding" in keys:
            assert leaf.dtype != jnp.int8, path

    got = np.asarray(pipe(**kw).images, np.float32)
    assert np.isfinite(got).all()
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (np.sqrt(np.mean(ref**2)) + 1e-12)
    assert rel < 0.25, rel


def test_calibration_isolated_from_concurrent_traces():
    """The calibration sink is thread-local: tracing activity in another
    thread (e.g. pipe.warmup(background=True)) must not pollute the
    site/amax association."""
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import TINY_TEXT_ENCODER, create_text_encoder
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.quant import calibrate_pipeline
    from sfast_tpu.schedulers import DPMSolverMultistepScheduler

    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(TINY_UNET, cross_attention_dim=64),
            jax.random.key(1),
        ),
        vae=dec, vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DPMSolverMultistepScheduler(), dtype=jnp.float32,
    )
    sfast_tpu.compile(
        pipe,
        CompilationConfig.Default().replace(
            enable_pallas=False, fuse_denoising_loop=True
        ),
    )
    ids = jnp.ones((1, 77), jnp.int32)
    # serial reference association
    ref = calibrate_pipeline(pipe, ids, height=32, width=32, timesteps=(999,))
    # same calibration with a live warmup trace in another thread
    t = pipe.warmup(resolutions=((64, 64),), steps=(2,), background=True)
    try:
        cal = calibrate_pipeline(pipe, ids, height=32, width=32,
                                 timesteps=(999,))
    finally:
        t.join(timeout=300)
    assert not t.is_alive()
    assert set(cal.amax) == set(ref.amax)
    for k, v in ref.amax.items():
        assert abs(cal.amax[k] - v) <= 1e-4 * max(abs(v), 1e-6), k
