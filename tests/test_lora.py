"""LoRA: init/merge/hot-swap + diffusers-format conversion
(reference behavior: switch_lora without recompile, README.md:228-265,
tests/compilers/...:438-465)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.compilers.diffusion_pipeline_compiler import compile_model
from sfast_tpu.config import CompilationConfig
from sfast_tpu.lora import (
    convert_diffusers_lora,
    init_lora_params,
    merge_lora,
    switch_lora,
)
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet

CCFG = CompilationConfig.Default().replace(enable_pallas=False)


def test_init_lora_targets_attention():
    unet = create_unet(TINY_UNET, jax.random.key(0))
    lora = init_lora_params(jax.random.key(1), unet.params, rank=2)
    assert len(lora) > 0
    for path, f in lora.items():
        assert path[-1] == "w"
        assert path[-2] in ("to_q", "to_k", "to_v", "to_out")
        assert f["a"].shape[-1] == 2 and f["b"].shape[0] == 2
        np.testing.assert_array_equal(np.asarray(f["b"]), 0)


def test_merge_zero_b_is_identity():
    unet = create_unet(TINY_UNET, jax.random.key(0))
    lora = init_lora_params(jax.random.key(1), unet.params, rank=2)
    merged = merge_lora(unet.params, lora, scale=1.0)
    a = jax.tree_util.tree_leaves(unet.params)
    b = jax.tree_util.tree_leaves(merged)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_switch_lora_no_recompile_changes_output():
    unet = create_unet(TINY_UNET, jax.random.key(0))
    compiled = compile_model(unet, CCFG)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([5.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 7, 32), jnp.float32)
    base_out = compiled(x, t, ctx)
    assert compiled.cache_size == 1

    lora = init_lora_params(jax.random.key(1), unet.params, rank=2)
    # poke B so the delta is nonzero
    lora = {
        k: {"a": v["a"], "b": jnp.ones_like(v["b"]) * 0.1} for k, v in lora.items()
    }
    switch_lora(compiled, unet.params, lora, scale=1.0)
    lora_out = compiled(x, t, ctx)
    assert compiled.cache_size == 1  # the invariant
    assert np.abs(np.asarray(lora_out) - np.asarray(base_out)).max() > 1e-5

    # switch back (scale 0 == base)
    switch_lora(compiled, unet.params, lora, scale=0.0)
    back = compiled(x, t, ctx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(base_out), atol=1e-6)


def test_convert_diffusers_lora_peft_style():
    import torch

    r, din, dout = 2, 32, 32
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": torch.randn(r, din),
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": torch.randn(dout, r),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0.lora_A.weight": torch.randn(r, din),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0.lora_B.weight": torch.randn(dout, r),
    }
    lora, _ = convert_diffusers_lora(sd)
    paths = set(lora.keys())
    assert ("down_blocks", 0, "attentions", 0, "blocks", 0, "attn1", "to_q", "w") in paths
    assert ("mid_block", "attentions", 0, "blocks", 0, "attn2", "to_out", "w") in paths
    for f in lora.values():
        assert f["a"].shape == (din, r)
        assert f["b"].shape == (r, dout)


def test_converted_lora_merges_into_tiny_unet():
    import torch

    unet = create_unet(TINY_UNET, jax.random.key(0))
    # TINY_UNET block0 attention dim = 32
    sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight": torch.randn(2, 32) * 0.1,
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight": torch.randn(32, 2) * 0.1,
    }
    lora, _ = convert_diffusers_lora(sd)
    merged = merge_lora(unet.params, lora)
    orig = unet.params["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["w"]
    new = merged["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["w"]
    assert np.abs(np.asarray(new) - np.asarray(orig)).max() > 1e-6
