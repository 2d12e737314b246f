"""Euler discrete scheduler (k-diffusion parametrization), deterministic
and ancestral variants, with optional Karras sigma respacing."""

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfast_tpu.schedulers.common import (
    SchedulerConfig,
    alphas_cumprod,
    karras_respace,
    select_timesteps,
)


def _kd_sigmas(cfg: SchedulerConfig, num_steps: int):
    ac = alphas_cumprod(cfg)
    all_sigmas = np.sqrt((1 - ac) / ac)
    ts = select_timesteps(cfg, num_steps)
    sigmas = all_sigmas[ts]
    if cfg.use_karras_sigmas:
        sigmas = karras_respace(sigmas, num_steps)
        # map back to (fractional) train timesteps by log-sigma interp
        log_all = np.log(all_sigmas)
        ts = np.interp(np.log(sigmas), log_all, np.arange(len(log_all)))
    return sigmas, ts


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    config: SchedulerConfig = SchedulerConfig()
    ancestral: bool = False
    order: int = 1

    @property
    def needs_noise(self) -> bool:
        return self.ancestral

    def set_timesteps(self, num_steps: int) -> Dict:
        sigmas, ts = _kd_sigmas(self.config, num_steps)
        sigmas = np.concatenate([sigmas, [0.0]])
        return {
            "timesteps": jnp.asarray(ts, jnp.float32),
            "sigmas": jnp.asarray(sigmas, jnp.float32),
            "init_noise_sigma": jnp.float32(np.sqrt(sigmas[0] ** 2 + 1)),
        }

    def scale_model_input(self, state, sample, i):
        s = state["sigmas"][i]
        return (sample.astype(jnp.float32) / jnp.sqrt(s**2 + 1)).astype(sample.dtype)

    def add_noise(self, state, original, noise, i):
        """Forward-diffuse for img2img entry.  Euler latents live in
        k-diffusion x-space (``scale_model_input`` divides by
        ``sqrt(sigma²+1)``), so this is diffusers EulerDiscrete.add_noise:
        ``z + sigma·noise`` — NOT the VP-space ``a·z + sigma·a·noise``."""
        sig = state["sigmas"][i]
        return original + sig * noise

    def _pred_x0(self, model_output, sample, sigma):
        pt = self.config.prediction_type
        if pt == "epsilon":
            return sample - sigma * model_output
        if pt == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample / (
                sigma**2 + 1
            )
        if pt == "sample":
            return model_output
        raise ValueError(pt)

    def step(
        self, state, model_output, i, sample, noise: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Dict]:
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        sigma = state["sigmas"][i]
        sigma_next = state["sigmas"][i + 1]
        x0 = self._pred_x0(model_output, sample, sigma)
        if self.ancestral:
            var = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
            sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - var, 0.0))
            d = (sample - x0) / sigma
            prev = sample + (sigma_down - sigma) * d
            if noise is None:
                raise ValueError("ancestral Euler requires noise")
            prev = prev + jnp.sqrt(var) * noise.astype(jnp.float32)
        else:
            d = (sample - x0) / sigma
            prev = sample + (sigma_next - sigma) * d
        return prev.astype(dtype), state


def EulerAncestralDiscreteScheduler(config: SchedulerConfig = SchedulerConfig()):
    return EulerDiscreteScheduler(config=config, ancestral=True)
