"""Scheduler foundations — pure-jnp, jit-able by construction.

The reference leaves schedulers eager by default and optionally traces
``scale_model_input``/``step`` (``diffusion_pipeline_compiler.py:104-107``,
``trace_scheduler`` knob).  On TPU the scheduler *must* stay on device:
an eager step would round-trip the latents to host every denoising
iteration (SURVEY.md §7 hard-parts).  So sfast_tpu schedulers are
functional: a frozen config + a state pytree of precomputed per-step
arrays (timesteps, sigmas, alphas), with ``step(state, model_output, i,
sample)`` pure in all inputs — which also makes the whole denoise loop
fusable under ``lax.fori_loop`` (``fuse_denoising_loop`` knob).

Schedules and spacing follow diffusers semantics (scaled_linear betas for
SD, leading spacing with steps_offset=1, epsilon/v_prediction/sample
prediction types).
"""

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # 'linear'|'scaled_linear'|'squaredcos_cap_v2'
    prediction_type: str = "epsilon"  # 'epsilon'|'v_prediction'|'sample'
    timestep_spacing: str = "leading"  # 'leading'|'trailing'|'linspace'
    steps_offset: int = 1
    # Karras sigma respacing (Euler/DPM option)
    use_karras_sigmas: bool = False


def make_betas(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    if cfg.beta_schedule == "squaredcos_cap_v2":
        t = np.arange(n + 1, dtype=np.float64) / n

        def bar(u):
            return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

        return np.clip(1 - bar(t[1:]) / bar(t[:-1]), 0, 0.999)
    raise ValueError(cfg.beta_schedule)


def alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    return np.cumprod(1.0 - make_betas(cfg))


def select_timesteps(cfg: SchedulerConfig, num_steps: int) -> np.ndarray:
    """Integer train-timestep indices for ``num_steps`` inference steps,
    descending."""
    n = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        ratio = n // num_steps
        ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
        return ts + cfg.steps_offset
    if cfg.timestep_spacing == "trailing":
        ts = np.round(np.arange(n, 0, -n / num_steps)).astype(np.int64) - 1
        return ts
    if cfg.timestep_spacing == "linspace":
        return np.linspace(0, n - 1, num_steps).round()[::-1].astype(np.int64)
    raise ValueError(cfg.timestep_spacing)


def karras_respace(sigmas: np.ndarray, num_steps: int, rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) sigma schedule between the min/max of the
    discrete schedule."""
    smin, smax = sigmas[sigmas > 0].min(), sigmas.max()
    ramp = np.linspace(0, 1, num_steps)
    inv_rho = 1.0 / rho
    return (smax**inv_rho + ramp * (smin**inv_rho - smax**inv_rho)) ** rho


def predicted_x0(
    cfg: SchedulerConfig, model_output, sample, alpha_t, sigma_t
):
    """Convert raw model output to an x0 prediction given
    x_t = alpha_t * x0 + sigma_t * noise."""
    if cfg.prediction_type == "epsilon":
        return (sample - sigma_t * model_output) / alpha_t
    if cfg.prediction_type == "v_prediction":
        return alpha_t * sample - sigma_t * model_output
    if cfg.prediction_type == "sample":
        return model_output
    raise ValueError(cfg.prediction_type)


def predicted_eps(cfg: SchedulerConfig, model_output, sample, alpha_t, sigma_t):
    if cfg.prediction_type == "epsilon":
        return model_output
    if cfg.prediction_type == "v_prediction":
        return sigma_t * sample + alpha_t * model_output
    if cfg.prediction_type == "sample":
        return (sample - alpha_t * model_output) / sigma_t
    raise ValueError(cfg.prediction_type)


def add_noise(state: Dict[str, Any], original, noise, timestep_index):
    """Forward-diffuse clean samples to the given inference-step index
    (img2img entry point)."""
    a = state["alpha_t"][timestep_index]
    s = state["sigma_t"][timestep_index]
    return a * original + s * noise
