"""EDM Euler scheduler (Karras et al. 2022 preconditioning) — the SVD
sampler: sigma schedule on a Karras rho-ramp, model wrapped with
c_in/c_skip/c_out/c_noise, deterministic Euler steps."""

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EDMEulerScheduler:
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    sigma_data: float = 1.0
    rho: float = 7.0
    order: int = 1

    def set_timesteps(self, num_steps: int) -> Dict:
        ramp = np.linspace(0, 1, num_steps)
        inv = 1.0 / self.rho
        sigmas = (
            self.sigma_max**inv + ramp * (self.sigma_min**inv - self.sigma_max**inv)
        ) ** self.rho
        sigmas = np.concatenate([sigmas, [0.0]])
        return {
            # model-facing timestep is c_noise = 0.25·log(sigma)
            "timesteps": jnp.asarray(0.25 * np.log(sigmas[:-1]), jnp.float32),
            "sigmas": jnp.asarray(sigmas, jnp.float32),
            "init_noise_sigma": jnp.float32(sigmas[0]),
        }

    def _c(self, sigma):
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        return c_skip, c_out, c_in

    def scale_model_input(self, state, sample, i):
        sigma = state["sigmas"][i]
        _, _, c_in = self._c(sigma)
        return (sample.astype(jnp.float32) * c_in).astype(sample.dtype)

    def step(self, state, model_output, i, sample) -> Tuple[jnp.ndarray, Dict]:
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        sigma = state["sigmas"][i]
        sigma_next = state["sigmas"][i + 1]
        c_skip, c_out, _ = self._c(sigma)
        denoised = c_skip * sample + c_out * model_output
        d = (sample - denoised) / sigma
        prev = sample + (sigma_next - sigma) * d
        return prev.astype(dtype), state
