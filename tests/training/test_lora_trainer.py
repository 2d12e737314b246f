"""LoRA training step (≙ reference training path via aot_autograd
backends, dynamo/backends/sfast_jit.py:52-64 +
examples/optimize_train_text_to_image_lora.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.config import CompilationConfig
from sfast_tpu.models.unet_2d_condition import TINY_UNET, create_unet
from sfast_tpu.training import lora_training_setup, make_lora_train_step

CFG = dataclasses.replace(TINY_UNET, cross_attention_dim=64)


def test_train_step_updates_lora_and_loss_finite():
    unet = create_unet(CFG, jax.random.key(0))
    lora, tx, opt_state = lora_training_setup(unet, rank=2)
    step = jax.jit(
        make_lora_train_step(
            unet, tx, ccfg=CompilationConfig.Default().replace(enable_pallas=False)
        )
    )
    batch = {
        "latents": jax.random.normal(jax.random.key(1), (2, 16, 16, 4)),
        "context": jax.random.normal(jax.random.key(2), (2, 7, 64)),
    }
    lora2, opt_state, loss = step(lora, opt_state, unet.params, batch, jax.random.key(3))
    assert np.isfinite(float(loss))
    # B factors start at zero; after one adamw step they must move
    b_before = jax.tree_util.tree_leaves({k: v["b"] for k, v in lora.items()})
    b_after = jax.tree_util.tree_leaves({k: v["b"] for k, v in lora2.items()})
    moved = any(np.abs(np.asarray(x) - np.asarray(y)).max() > 0 for x, y in zip(b_before, b_after))
    assert moved


def test_two_steps_run_and_loss_changes():
    unet = create_unet(CFG, jax.random.key(0))
    lora, tx, opt_state = lora_training_setup(unet, rank=2)
    step = jax.jit(
        make_lora_train_step(
            unet, tx, ccfg=CompilationConfig.Default().replace(enable_pallas=False)
        )
    )
    batch = {
        "latents": jax.random.normal(jax.random.key(1), (2, 16, 16, 4)),
        "context": jax.random.normal(jax.random.key(2), (2, 7, 64)),
    }
    lora, opt_state, l1 = step(lora, opt_state, unet.params, batch, jax.random.key(3))
    lora, opt_state, l2 = step(lora, opt_state, unet.params, batch, jax.random.key(3))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)
