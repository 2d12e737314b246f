"""Scheduler edge cases: spacing modes, beta schedules, v-prediction
across solvers, Karras respacing monotonicity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
    SchedulerConfig,
)
from sfast_tpu.schedulers.common import (
    alphas_cumprod,
    karras_respace,
    make_betas,
    select_timesteps,
)


def test_timestep_spacing_modes():
    cfg = SchedulerConfig()
    lead = select_timesteps(cfg, 10)
    assert lead[0] == 901 and lead[-1] == 1  # leading + offset 1
    trail = select_timesteps(
        SchedulerConfig(timestep_spacing="trailing"), 10
    )
    assert trail[0] == 999
    lin = select_timesteps(SchedulerConfig(timestep_spacing="linspace"), 10)
    assert lin[0] == 999 and lin[-1] == 0
    for ts in (lead, trail, lin):
        assert (np.diff(ts) < 0).all()


def test_beta_schedules():
    for sched in ("linear", "scaled_linear", "squaredcos_cap_v2"):
        betas = make_betas(SchedulerConfig(beta_schedule=sched))
        assert betas.shape == (1000,)
        assert (betas > 0).all() and (betas < 1).all()
        ac = alphas_cumprod(SchedulerConfig(beta_schedule=sched))
        assert (np.diff(ac) < 0).all()  # strictly decreasing


def test_unknown_schedule_raises():
    with pytest.raises(ValueError):
        make_betas(SchedulerConfig(beta_schedule="cosine?"))


def test_karras_respace_monotone_and_bounded():
    sig = np.linspace(0.03, 14.6, 50)[::-1]
    k = karras_respace(sig, 50)
    assert (np.diff(k) < 0).all()
    assert k[0] <= sig.max() + 1e-6 and k[-1] >= sig[sig > 0].min() - 1e-6


def test_v_prediction_euler_trajectory():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sch = EulerDiscreteScheduler(config=cfg)
    st = sch.set_timesteps(30)
    k1, k2 = jax.random.split(jax.random.key(0))
    x0 = jax.random.normal(k1, (1, 4, 4, 4)) * 0.5
    n = jax.random.normal(k2, (1, 4, 4, 4))
    x = x0 + st["sigmas"][0] * n
    for i in range(30):
        sigma = st["sigmas"][i]
        # exact v in kd parametrization: v = (eps - sigma*x0...) derive via
        # model inversion of the scheduler's _pred_x0
        # pred_x0 = m*(-sigma/sqrt(s^2+1)) + x/(s^2+1) == x0
        m = (x0 - x / (sigma**2 + 1)) * (-jnp.sqrt(sigma**2 + 1) / sigma)
        x, st = sch.step(st, m, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_dpm_v_prediction_trajectory():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sch = DPMSolverMultistepScheduler(config=cfg)
    st = sch.set_timesteps(20)
    k1, k2 = jax.random.split(jax.random.key(1))
    x0 = jax.random.normal(k1, (1, 4, 4, 4)) * 0.5
    n = jax.random.normal(k2, (1, 4, 4, 4))
    st = sch.prepare_state(st, x0)
    sig0 = st["sigmas"][0]
    a0 = 1.0 / jnp.sqrt(1 + sig0**2)
    x = a0 * x0 + sig0 * a0 * n
    for i in range(20):
        sig = st["sigmas"][i]
        a = 1.0 / jnp.sqrt(1 + sig**2)
        s = sig * a
        v = a * n - s * x0  # exact v for this trajectory
        x, st = sch.step(st, v, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=5e-3, atol=5e-3)


def test_ddim_single_step_full_denoise():
    """num_inference_steps=1 must not blow up (degenerate schedules)."""
    sch = DDIMScheduler()
    st = sch.set_timesteps(1)
    x = jnp.ones((1, 2, 2, 4))
    out, _ = sch.step(st, jnp.zeros_like(x), 0, x)
    assert bool(jnp.isfinite(out).all())
