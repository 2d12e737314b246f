"""DPM-Solver++ (2M) multistep scheduler — the 50-step workhorse config
of the BASELINE (SD1.5 50-step DPM++).

Functional reformulation of the multistep solver: the state pytree
carries the previous x0 prediction, and order selection (first-order on
the first and final steps) is a ``jnp.where`` over both candidate
updates, so the whole thing stays branch-free under jit / fori_loop.
"""

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from sfast_tpu.schedulers.common import SchedulerConfig, alphas_cumprod, karras_respace, select_timesteps

_SIGMA_FLOOR = 1e-10


@dataclasses.dataclass(frozen=True)
class DPMSolverMultistepScheduler:
    config: SchedulerConfig = SchedulerConfig()
    solver_order: int = 2
    lower_order_final: bool = True
    order: int = 1  # pipeline-visible: one model eval per step

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def set_timesteps(self, num_steps: int) -> Dict:
        ac = alphas_cumprod(self.config)
        all_sigmas = np.sqrt((1 - ac) / ac)
        ts = select_timesteps(self.config, num_steps)
        sigmas = all_sigmas[ts]
        if self.config.use_karras_sigmas:
            sigmas = karras_respace(sigmas, num_steps)
            log_all = np.log(all_sigmas)
            ts = np.interp(np.log(sigmas), log_all, np.arange(len(log_all)))
        sigmas = np.concatenate([sigmas, [_SIGMA_FLOOR]])
        return {
            "timesteps": jnp.asarray(ts, jnp.float32),
            "sigmas": jnp.asarray(sigmas, jnp.float32),
            # scalar zero broadcasts against any latent shape, keeping the
            # state pytree structure fixed across steps (fori_loop carry)
            "x0_prev": jnp.zeros((), jnp.float32),
            # whether a previous x0 prediction exists: the FIRST EXECUTED
            # step (not step index 0 — img2img enters at start_index>0)
            # must be first-order, like diffusers' lower_order_nums guard
            "has_history": jnp.zeros((), jnp.bool_),
            "num_steps": num_steps,
        }

    def prepare_state(self, state, sample) -> Dict:
        """Shape the multistep history to the latents so the state pytree
        is a valid fixed-shape ``fori_loop`` carry."""
        new = dict(state)
        new["x0_prev"] = jnp.zeros(sample.shape, jnp.float32)
        return new

    def scale_model_input(self, state, sample, i):
        # VP-space latents; input scaling is identity (matches diffusers
        # DPMSolverMultistep with init_noise_sigma == 1)
        return sample

    def add_noise(self, state, original, noise, i):
        """Forward-diffuse for img2img entry.  DPM++ latents live in
        VP-space: alpha_t·z + sigma_t·noise with (alpha, sigma) derived
        from the kd sigma (matches diffusers DPMSolverMultistep.add_noise)."""
        a, s = self._alpha_sigma(state["sigmas"][i])
        return a * original + s * noise

    @staticmethod
    def _alpha_sigma(kd_sigma):
        alpha = 1.0 / jnp.sqrt(1.0 + kd_sigma**2)
        return alpha, kd_sigma * alpha

    def _pred_x0(self, model_output, sample, kd_sigma):
        a, s = self._alpha_sigma(kd_sigma)
        pt = self.config.prediction_type
        if pt == "epsilon":
            return (sample - s * model_output) / a
        if pt == "v_prediction":
            return a * sample - s * model_output
        if pt == "sample":
            return model_output
        raise ValueError(pt)

    def step(
        self, state, model_output, i, sample
    ) -> Tuple[jnp.ndarray, Dict]:
        dtype = sample.dtype
        sample = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)

        sig_s0 = state["sigmas"][i]       # current
        sig_t = state["sigmas"][i + 1]    # next (toward clean)
        sig_s1 = state["sigmas"][jnp.maximum(i - 1, 0)]  # previous

        a_t, st_t = self._alpha_sigma(sig_t)
        a_s0, st_s0 = self._alpha_sigma(sig_s0)
        a_s1, st_s1 = self._alpha_sigma(sig_s1)

        lam_t = jnp.log(a_t / st_t)
        lam_s0 = jnp.log(a_s0 / st_s0)
        lam_s1 = jnp.log(a_s1 / st_s1)
        h = lam_t - lam_s0
        h_last = lam_s0 - lam_s1

        x0 = self._pred_x0(model_output, sample, sig_s0)
        x0_prev = state["x0_prev"]

        ratio = st_t / st_s0
        phi = jnp.expm1(-h)  # exp(-h) - 1

        first = ratio * sample - a_t * phi * x0

        r = h_last / h
        d1 = (x0 - x0_prev) / jnp.maximum(r, 1e-20)
        second = ratio * sample - a_t * phi * (x0 + 0.5 * d1)

        num_steps = state["num_steps"]
        use_first = jnp.logical_not(state["has_history"])
        if self.lower_order_final:
            use_first = jnp.logical_or(use_first, i == num_steps - 1)
        if self.solver_order < 2:
            prev = first
        else:
            prev = jnp.where(use_first, first, second)

        new_state = dict(state)
        new_state["x0_prev"] = x0
        new_state["has_history"] = jnp.ones((), jnp.bool_)
        return prev.astype(dtype), new_state
