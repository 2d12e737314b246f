"""Weight-stacked scan over iso-shaped UNet blocks (stack_iso_blocks).

XLA TPU codegen emits MBs of machine code per conv call site and shares
none of it between identical sites; stacking iso-shaped runs into
``lax.scan`` bodies makes the compiler emit each body once (smaller
executable, faster compile — the warm-start lever the reference gets for
free from CUDA-graph replay, README.md:28).  These tests pin the
transform to exact numerical parity with the unrolled forward.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

import sfast_tpu
from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import (
    SDXL_UNET,
    TINY_UNET,
    create_unet,
    init_unet_params,
    stack_iso_blocks,
    unet_fwd,
)

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_segment_iso_runs_partition():
    """The shared grouping rule (models/layers.segment_iso_runs): maximal
    runs of identical shape signature become one stacked scan segment;
    singles stay unstacked; order is preserved."""
    from sfast_tpu.models.layers import segment_iso_runs

    a = {"w": jnp.zeros((4, 4))}
    b = {"w": jnp.zeros((4, 4))}
    c = {"w": jnp.zeros((8, 4))}  # different shape: breaks the run
    d = {"w": jnp.zeros((4, 4), jnp.bfloat16)}  # different dtype: single
    segs = segment_iso_runs([a, b, c, d])
    assert [list(s) for s in segs] == [["scan"], ["one"], ["one"]]
    assert segs[0]["scan"]["w"].shape == (2, 4, 4)  # a,b stacked
    assert segs[1]["one"]["w"].shape == (8, 4)
    assert segs[2]["one"]["w"].dtype == jnp.bfloat16
    # all-identical: one scan over everything
    segs = segment_iso_runs([a, b, a])
    assert len(segs) == 1 and segs[0]["scan"]["w"].shape == (3, 4, 4)
    # no two alike: no scan segments at all
    segs = segment_iso_runs([a, c])
    assert [list(s) for s in segs] == [["one"], ["one"]]


def test_lcm_timestep_cond_helper():
    """lcm_timestep_cond: None without a cond_proj dim; otherwise the
    w-embedding of (gs − 1) broadcast to the batch — the single site all
    six pipeline paths share."""
    from sfast_tpu.models.layers import (
        guidance_scale_embedding,
        lcm_timestep_cond,
    )

    assert lcm_timestep_cond(7.5, None, 2) is None
    t = lcm_timestep_cond(8.0, 32, 3)
    assert t.shape == (3, 32)
    np.testing.assert_allclose(
        np.asarray(t[0]),
        np.asarray(guidance_scale_embedding(7.0, 32)[0]),
        rtol=0,
        atol=0,
    )
    np.testing.assert_array_equal(np.asarray(t[0]), np.asarray(t[2]))

# layers_per_block=2 so iso runs actually exist: both level-0 down pairs
# (32->32) scan, and the first two resnets of each up block scan
DEEP_UNET = dataclasses.replace(TINY_UNET, layers_per_block=2)

# SDXL-shaped tiny config: text_time embedding, linear projections, and
# transformer depth 2 (exercises the depth-block ``_stacked`` scan)
DEEP_XL_UNET = dataclasses.replace(
    SDXL_UNET,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(2, 2),
    num_heads=(4, 4),
    cross_attention_dim=64,
    projection_class_embeddings_input_dim=64 + 6 * 256,
    layers_per_block=2,
    norm_num_groups=8,
    dtype=jnp.float32,
)


def _io(cfg, b=2):
    x = jax.random.normal(
        jax.random.key(1), (b, 16, 16, cfg.in_channels), jnp.float32
    )
    t = jnp.array([10.0] * b)
    ctx = jax.random.normal(
        jax.random.key(2), (b, 7, cfg.cross_attention_dim), jnp.float32
    )
    return x, t, ctx


def test_stacked_groups_exist_and_shapes():
    params = init_unet_params(jax.random.key(0), DEEP_UNET)
    stacked = stack_iso_blocks(params)
    segs = stacked["down_blocks"][0]["segments"]
    # level 0 down: two iso (resnet 32->32, attn) pairs -> ONE scan seg
    assert len(segs) == 1 and "scan" in segs[0]
    lead = jax.tree_util.tree_leaves(segs[0]["scan"])[0].shape[0]
    assert lead == 2
    # every up block has 3 resnets; at least one scan run of >=2 each
    for blk in stacked["up_blocks"]:
        kinds = [("scan" in s) for s in blk["segments"]]
        assert any(kinds)


def test_stacked_matches_unrolled_sd():
    params = init_unet_params(jax.random.key(0), DEEP_UNET)
    x, t, ctx = _io(DEEP_UNET)
    ref = unet_fwd(DEEP_UNET, CCFG, params, x, t, ctx)
    out = unet_fwd(DEEP_UNET, CCFG, stack_iso_blocks(params), x, t, ctx)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
    )


def test_stacked_matches_unrolled_xl_depth_blocks():
    params = init_unet_params(jax.random.key(0), DEEP_XL_UNET)
    stacked = stack_iso_blocks(params)
    # depth-2 transformers must be stacked wherever attentions exist
    blk = stacked["down_blocks"][1]["segments"][0]
    attn = (blk.get("one") or blk["scan"])["attention"]
    assert "_stacked" in attn["blocks"]
    x, t, ctx = _io(DEEP_XL_UNET)
    added = {
        "text_embeds": jax.random.normal(jax.random.key(3), (2, 64)),
        "time_ids": jnp.tile(
            jnp.array([[16.0, 16.0, 0.0, 0.0, 16.0, 16.0]]), (2, 1)
        ),
    }
    ref = unet_fwd(
        DEEP_XL_UNET, CCFG, params, x, t, ctx, added_cond_kwargs=added
    )
    out = unet_fwd(
        DEEP_XL_UNET, CCFG, stacked, x, t, ctx, added_cond_kwargs=added
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
    )


def test_stacked_matches_unrolled_with_controlnet_residuals():
    """The scan ys must feed the skip stack in the same order the
    unrolled path appends — additional residuals zip positionally."""
    params = init_unet_params(jax.random.key(0), DEEP_UNET)
    x, t, ctx = _io(DEEP_UNET, b=1)
    # residual shapes: trace the unrolled forward's res_stack layout by
    # reusing the forward itself (zeros = no-op, then randoms)
    n_res = 1 + 2 * len(DEEP_UNET.down_block_types) + (
        len(DEEP_UNET.down_block_types) - 1
    )
    shapes = []
    h, w, c0 = 16, 16, DEEP_UNET.block_out_channels[0]
    shapes.append((1, h, w, c0))
    for i, _ in enumerate(DEEP_UNET.down_block_types):
        c = DEEP_UNET.block_out_channels[i]
        for _j in range(DEEP_UNET.layers_per_block):
            shapes.append((1, h, w, c))
        if i < len(DEEP_UNET.down_block_types) - 1:
            h, w = h // 2, w // 2
            shapes.append((1, h, w, c))
    assert len(shapes) == n_res
    res = [
        jax.random.normal(jax.random.key(10 + i), s, jnp.float32) * 0.1
        for i, s in enumerate(shapes)
    ]
    mid = jax.random.normal(
        jax.random.key(99), (1, h, w, DEEP_UNET.block_out_channels[-1])
    ) * 0.1
    kw = dict(
        down_block_additional_residuals=res,
        mid_block_additional_residual=mid,
    )
    ref = unet_fwd(DEEP_UNET, CCFG, params, x, t, ctx, **kw)
    out = unet_fwd(
        DEEP_UNET, CCFG, stack_iso_blocks(params), x, t, ctx, **kw
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
    )


def test_env_gate_via_fused_pipeline(monkeypatch):
    """SFAST_TPU_STACK_ISO=1 routes the fused loop through the stacked
    forward; output must match the unstacked fused run, and flipping the
    env mid-process must invalidate the cached executables."""
    from sfast_tpu.models.autoencoder_kl import TINY_TEST_VAE, create_vae
    from sfast_tpu.models.clip_text import (
        TINY_TEXT_ENCODER,
        create_text_encoder,
    )
    from sfast_tpu.pipelines import StableDiffusionPipeline
    from sfast_tpu.schedulers import DDIMScheduler

    dec, enc = create_vae(TINY_TEST_VAE, jax.random.key(0))
    pipe = StableDiffusionPipeline(
        unet=create_unet(
            dataclasses.replace(
                DEEP_UNET, cross_attention_dim=64, sample_size=8
            ),
            jax.random.key(1),
        ),
        vae=dec,
        vae_encode=enc,
        text_encoder=create_text_encoder(TINY_TEXT_ENCODER, jax.random.key(2)),
        scheduler=DDIMScheduler(),
        dtype=jnp.float32,
    )
    pipe = sfast_tpu.compile(
        pipe, CCFG.replace(fuse_denoising_loop=True)
    )
    kw = dict(
        prompt_ids=jnp.ones((1, 77), jnp.int32),
        height=32,
        width=32,
        num_inference_steps=2,
        seed=0,
        guidance_scale=7.5,
        output_type="np",
    )
    # count real re-traces: a stale executable reused after the env flip
    # would produce bit-identical output and an unchanged cache length,
    # so neither alone can detect a missing invalidation
    builds = []
    orig_build = type(pipe)._build_fused_pipeline

    def counting_build(self, *a, **k):
        builds.append(1)
        return orig_build(self, *a, **k)

    monkeypatch.setattr(type(pipe), "_build_fused_pipeline", counting_build)

    monkeypatch.setenv("SFAST_TPU_STACK_ISO", "0")
    plain = np.asarray(pipe(**kw).images)
    n_builds = len(builds)
    assert n_builds >= 1
    monkeypatch.setenv("SFAST_TPU_STACK_ISO", "1")
    stacked = np.asarray(pipe(**kw).images)
    # the flip must invalidate the fused cache and re-trace under the flag
    assert len(builds) == n_builds + 1, "env flip did not re-trace"
    assert plain.dtype == stacked.dtype == np.uint8
    # same math, different program structure: allow 1 uint8 rounding flip
    assert np.abs(plain.astype(int) - stacked.astype(int)).max() <= 1
    # repeat call under the same flag must NOT re-trace again
    np.asarray(pipe(**kw).images)
    assert len(builds) == n_builds + 1


def test_vae_decoder_stacked_matches_unrolled(monkeypatch):
    from sfast_tpu.models.autoencoder_kl import (
        TINY_TEST_VAE,
        init_vae_params,
        stack_iso_decoder,
        vae_decode_fwd,
    )

    params = init_vae_params(jax.random.key(0), TINY_TEST_VAE)
    stacked = stack_iso_decoder(params)
    blocks = stacked["decoder"]["up_blocks"]
    # first up block: both resnets iso (32->32) -> one scan run; the
    # second transitions channels (32->16 then 16->16) -> singles
    assert any("scan" in s for s in blocks[0]["segments"])
    assert all("one" in s for s in blocks[1]["segments"])
    z = jax.random.normal(
        jax.random.key(1), (1, 4, 4, TINY_TEST_VAE.latent_channels), jnp.float32
    )
    monkeypatch.setenv("SFAST_TPU_STACK_ISO", "0")
    ref = vae_decode_fwd(TINY_TEST_VAE, CCFG, params, z)
    out = vae_decode_fwd(TINY_TEST_VAE, CCFG, stacked, z)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-5
    )
    # the env gate inside vae_decode_fwd applies the transform itself
    # (separate opt-in: VAE stacking measured -69 ms/image on v5e)
    monkeypatch.setenv("SFAST_TPU_STACK_ISO_VAE", "1")
    gated = vae_decode_fwd(TINY_TEST_VAE, CCFG, params, z)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(gated), rtol=2e-5, atol=2e-5
    )
