"""DDIM scheduler (eta=0, deterministic)."""

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from sfast_tpu.schedulers.common import (
    SchedulerConfig,
    alphas_cumprod,
    predicted_eps,
    predicted_x0,
    select_timesteps,
)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    config: SchedulerConfig = SchedulerConfig()
    order: int = 1

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def set_timesteps(self, num_steps: int) -> Dict:
        ac = alphas_cumprod(self.config)
        ts = select_timesteps(self.config, num_steps)
        # per-step alpha/sigma, extended with the terminal (clean) point
        a = np.sqrt(ac[ts])
        s = np.sqrt(1.0 - ac[ts])
        a = np.concatenate([a, [1.0]])
        s = np.concatenate([s, [0.0]])
        return {
            "timesteps": jnp.asarray(ts, jnp.float32),
            "alpha_t": jnp.asarray(a, jnp.float32),
            "sigma_t": jnp.asarray(s, jnp.float32),
        }

    def scale_model_input(self, state, sample, i):
        return sample

    def step(self, state, model_output, i, sample) -> Tuple[jnp.ndarray, Dict]:
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)
        a_t, s_t = state["alpha_t"][i], state["sigma_t"][i]
        a_p, s_p = state["alpha_t"][i + 1], state["sigma_t"][i + 1]
        x0 = predicted_x0(self.config, model_output, sample, a_t, s_t)
        eps = predicted_eps(self.config, model_output, sample, a_t, s_t)
        prev = a_p * x0 + s_p * eps
        return prev.astype(dtype), state
