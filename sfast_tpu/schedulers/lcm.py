"""LCM scheduler (Latent Consistency Models, 1-8 step inference).

The LCM/LCM-LoRA 4-step config is a BASELINE.md tracked config — it
stresses fixed per-step overhead, which is exactly what the executable
cache (≙ CUDA graphs) exists to kill.
"""

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sfast_tpu.schedulers.common import SchedulerConfig, alphas_cumprod


@dataclasses.dataclass(frozen=True)
class LCMScheduler:
    config: SchedulerConfig = SchedulerConfig()
    original_inference_steps: int = 50
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    order: int = 1
    needs_noise: bool = True

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def set_timesteps(self, num_steps: int) -> Dict:
        n = self.config.num_train_timesteps
        k = n // self.original_inference_steps
        # LCM's distilled timestep grid, then an even subset of num_steps
        lcm_origin = np.asarray(range(1, self.original_inference_steps + 1)) * k - 1
        skip = len(lcm_origin) // num_steps
        ts = lcm_origin[::-1][::skip][:num_steps]

        ac = alphas_cumprod(self.config)
        a = np.sqrt(ac[ts])
        s = np.sqrt(1 - ac[ts])
        # previous-step (toward clean) alphas: shifted; terminal = clean
        a_prev = np.concatenate([a[1:], [1.0]])
        s_prev = np.concatenate([s[1:], [0.0]])
        return {
            "timesteps": jnp.asarray(ts, jnp.float32),
            "alpha_t": jnp.asarray(a, jnp.float32),
            "sigma_t": jnp.asarray(s, jnp.float32),
            "alpha_prev": jnp.asarray(a_prev, jnp.float32),
            "sigma_prev": jnp.asarray(s_prev, jnp.float32),
            "num_steps": num_steps,
        }

    def scale_model_input(self, state, sample, i):
        return sample

    def _boundary(self, t):
        s = t * self.timestep_scaling
        c_skip = self.sigma_data**2 / (s**2 + self.sigma_data**2)
        c_out = s / jnp.sqrt(s**2 + self.sigma_data**2)
        return c_skip, c_out

    def step(
        self, state, model_output, i, sample, noise: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Dict]:
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a_t, s_t = state["alpha_t"][i], state["sigma_t"][i]
        t = state["timesteps"][i]

        pt = self.config.prediction_type
        if pt == "epsilon":
            x0 = (sample - s_t * model_output) / a_t
        elif pt == "v_prediction":
            x0 = a_t * sample - s_t * model_output
        else:
            x0 = model_output

        c_skip, c_out = self._boundary(t)
        denoised = c_out * x0 + c_skip * sample

        # all but the last step re-noise to the next timestep
        a_p, s_p = state["alpha_prev"][i], state["sigma_prev"][i]
        if noise is None:
            noise = jnp.zeros_like(sample)
        renoised = a_p * denoised + s_p * noise.astype(jnp.float32)
        is_last = i == state["num_steps"] - 1
        prev = jnp.where(is_last, denoised, renoised)
        return prev.astype(dtype), state
