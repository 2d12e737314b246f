"""LoRA fine-tuning step — the training path.

Reference counterpart: the ``sfast_jit_trace_aot_autograd`` torch.compile
backends used by ``examples/optimize_train_text_to_image_lora.py:721-744``
(compile fwd+bwd of the UNet while training LoRA on text-to-image data).
TPU-native version: one pure ``train_step`` (loss → grad → optax update)
jitted over a device mesh with dp×tp shardings — forward AND backward
compile into a single XLA executable.

The diffusion loss follows the standard LDM recipe the example uses:
sample t, noise the latents, predict eps, MSE.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from sfast_tpu.config import CompilationConfig
from sfast_tpu.lora import init_lora_params, merge_lora
from sfast_tpu.schedulers.common import SchedulerConfig, alphas_cumprod


def lora_training_setup(
    unet_model,
    *,
    rank: int = 4,
    learning_rate: float = 1e-4,
    rng: Optional[jax.Array] = None,
):
    """Create (lora_params, optimizer, opt_state) for a UNet Model."""
    rng = rng if rng is not None else jax.random.key(0)
    lora = init_lora_params(rng, unet_model.params, rank=rank)
    tx = optax.adamw(learning_rate)
    # dict-keyed-by-tuple pytrees are fine for optax
    opt_state = tx.init(lora)
    return lora, tx, opt_state


def make_lora_train_step(
    unet_model,
    tx,
    *,
    ccfg: Optional[CompilationConfig] = None,
    sched_cfg: SchedulerConfig = SchedulerConfig(),
) -> Callable:
    """Returns ``train_step(lora, opt_state, base_params, batch, rng)``
    → ``(lora, opt_state, loss)``.

    ``batch``: dict with ``latents`` (B,h,w,4) clean VAE latents and
    ``context`` (B,S,D) text embeddings.
    """
    ccfg = ccfg or CompilationConfig.Default()
    apply = unet_model.apply_fn(ccfg)
    ac = jnp.asarray(alphas_cumprod(sched_cfg), jnp.float32)
    n_train = sched_cfg.num_train_timesteps

    def loss_fn(lora, base_params, latents, context, t, noise):
        params = merge_lora(base_params, lora, 1.0)
        a = jnp.sqrt(ac[t])[:, None, None, None]
        s = jnp.sqrt(1 - ac[t])[:, None, None, None]
        noisy = (a * latents + s * noise).astype(latents.dtype)
        pred = apply(params, noisy, t.astype(jnp.float32), context)
        return jnp.mean(
            (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )

    def train_step(lora, opt_state, base_params, batch, rng):
        k_t, k_n = jax.random.split(rng)
        b = batch["latents"].shape[0]
        t = jax.random.randint(k_t, (b,), 0, n_train)
        noise = jax.random.normal(k_n, batch["latents"].shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base_params, batch["latents"], batch["context"], t, noise
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step
