"""Scheduler correctness.

Key invariant (exactness on the constant-eps problem): if the "model"
returns exactly the noise n used to construct x_t = a·x0 + s·n, then a
deterministic solver step from level i to i+1 must land exactly on
x_{i+1} = a'·x0 + s'·n for DDIM, and the full trajectory must converge
to x0 for all solvers.  This makes correctness assertable without
diffusers installed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfast_tpu.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    EulerDiscreteScheduler,
    EulerAncestralDiscreteScheduler,
    LCMScheduler,
    SchedulerConfig,
)


X0 = None


def _problem(shape=(2, 4, 4, 4)):
    k1, k2 = jax.random.split(jax.random.key(0))
    x0 = jax.random.normal(k1, shape) * 0.5
    noise = jax.random.normal(k2, shape)
    return x0, noise


def test_ddim_single_step_exact():
    sch = DDIMScheduler()
    st = sch.set_timesteps(10)
    x0, n = _problem()
    for i in range(10):
        a, s = st["alpha_t"][i], st["sigma_t"][i]
        xt = a * x0 + s * n
        prev, _ = sch.step(st, n, i, xt)  # model predicts exact eps
        a2, s2 = st["alpha_t"][i + 1], st["sigma_t"][i + 1]
        expected = a2 * x0 + s2 * n
        np.testing.assert_allclose(
            np.asarray(prev), np.asarray(expected), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("num_steps", [10, 50])
def test_ddim_trajectory_recovers_x0(num_steps):
    sch = DDIMScheduler()
    st = sch.set_timesteps(num_steps)
    x0, n = _problem()
    x = st["alpha_t"][0] * x0 + st["sigma_t"][0] * n
    for i in range(num_steps):
        x, st = sch.step(st, n, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_euler_trajectory_recovers_x0():
    sch = EulerDiscreteScheduler()
    st = sch.set_timesteps(50)
    x0, n = _problem()
    # kd-space: x = x0 + sigma * n
    x = x0 + st["sigmas"][0] * n
    for i in range(50):
        inp = sch.scale_model_input(st, x, i)
        # for epsilon prediction with kd latents, exact eps model returns n
        x, st = sch.step(st, n, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


def test_euler_scale_model_input_normalizes():
    sch = EulerDiscreteScheduler()
    st = sch.set_timesteps(10)
    x = jnp.ones((1, 2, 2, 4))
    scaled = sch.scale_model_input(st, x, 0)
    expected = 1.0 / np.sqrt(np.asarray(st["sigmas"][0]) ** 2 + 1)
    np.testing.assert_allclose(np.asarray(scaled)[0, 0, 0, 0], expected, rtol=1e-5)


def test_euler_ancestral_converges_with_exact_model():
    """With a state-aware exact-eps model (eps = (x - x0)/sigma), the
    ancestral sampler must still land on x0 exactly despite fresh noise
    injection at every step."""
    sch = EulerAncestralDiscreteScheduler()
    st = sch.set_timesteps(20)
    x0, n = _problem()
    x = x0 + st["sigmas"][0] * n
    key = jax.random.key(3)
    for i in range(20):
        key, sub = jax.random.split(key)
        eps = (x - x0) / st["sigmas"][i]
        x, st = sch.step(st, eps, i, x, noise=jax.random.normal(sub, x.shape))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("num_steps", [10, 50])
def test_dpm_trajectory_recovers_x0(num_steps):
    sch = DPMSolverMultistepScheduler()
    st = sch.set_timesteps(num_steps)
    x0, n = _problem()
    st = sch.prepare_state(st, x0)
    # VP space: x = a x0 + s n with kd sigma mapping
    sig0 = st["sigmas"][0]
    a0 = 1.0 / jnp.sqrt(1 + sig0**2)
    x = a0 * x0 + sig0 * a0 * n
    for i in range(num_steps):
        x, st = sch.step(st, n, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_dpm_step_jittable_fixed_structure():
    sch = DPMSolverMultistepScheduler()
    st = sch.set_timesteps(4)
    x0, n = _problem((1, 2, 2, 4))
    st = sch.prepare_state(st, x0)
    step = jax.jit(lambda s, mo, i, x: sch.step(s, mo, i, x))
    x = x0
    for i in range(4):
        x, st = step(st, n, jnp.int32(i), x)
    assert x.shape == x0.shape


def test_lcm_final_step_returns_denoised():
    sch = LCMScheduler()
    st = sch.set_timesteps(4)
    x0, n = _problem()
    a, s = st["alpha_t"][3], st["sigma_t"][3]
    xt = a * x0 + s * n
    prev, _ = sch.step(st, n, 3, xt, noise=n)
    # at the last step the output is the consistency-denoised sample (no renoise)
    t = st["timesteps"][3]
    c_skip = 0.25 / ((t * 10) ** 2 + 0.25)
    c_out = (t * 10) / jnp.sqrt((t * 10) ** 2 + 0.25)
    expected = c_out * x0 + c_skip * xt
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expected), rtol=1e-3, atol=1e-3)


def test_lcm_timesteps_descending_and_count():
    sch = LCMScheduler()
    st = sch.set_timesteps(4)
    ts = np.asarray(st["timesteps"])
    assert len(ts) == 4
    assert (np.diff(ts) < 0).all()


def test_v_prediction_ddim():
    cfg = SchedulerConfig(prediction_type="v_prediction")
    sch = DDIMScheduler(config=cfg)
    st = sch.set_timesteps(10)
    x0, n = _problem()
    x = st["alpha_t"][0] * x0 + st["sigma_t"][0] * n
    for i in range(10):
        a, s = st["alpha_t"][i], st["sigma_t"][i]
        v = a * n - s * x0  # exact v for this problem
        x, st = sch.step(st, v, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3, atol=1e-3)


# ---- img2img entry: add_noise lives in each scheduler's sample space ----


def test_euler_add_noise_is_x_space():
    """Euler latents are kd x-space: add_noise must be z + sigma·noise
    (diffusers EulerDiscrete.add_noise) — the VP formula would
    under-scale start latents by 1/sqrt(1+sigma²) at high strength."""
    sch = EulerDiscreteScheduler()
    st = sch.set_timesteps(10)
    z, n = _problem()
    for i in (0, 4, 9):
        out = sch.add_noise(st, z, n, i)
        expected = z + st["sigmas"][i] * n
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-6)


def test_dpm_add_noise_is_vp_space():
    sch = DPMSolverMultistepScheduler()
    st = sch.set_timesteps(10)
    z, n = _problem()
    sig = st["sigmas"][4]
    a = 1.0 / jnp.sqrt(1 + sig**2)
    out = sch.add_noise(st, z, n, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(a * z + sig * a * n), rtol=1e-6
    )


@pytest.mark.parametrize(
    "make_sch", [EulerDiscreteScheduler, DPMSolverMultistepScheduler]
)
def test_img2img_entry_recovers_x0(make_sch):
    """add_noise at start_index then denoising the remaining steps with
    the exact-eps model must recover the original — the property that was
    broken for Euler when the VP formula was used for kd x-space."""
    sch = make_sch()
    num_steps, start = 20, 7
    st = sch.set_timesteps(num_steps)
    x0, n = _problem()
    if hasattr(sch, "prepare_state"):
        st = sch.prepare_state(st, x0)
    x = sch.add_noise(st, x0, n, start)
    for i in range(start, num_steps):
        if isinstance(sch, EulerDiscreteScheduler):
            eps = (x - x0) / st["sigmas"][i]  # exact model in x-space
        else:
            sig = st["sigmas"][i]
            a = 1.0 / jnp.sqrt(1 + sig**2)
            eps = (x - a * x0) / (sig * a)  # exact model in VP space
        x, st = sch.step(st, eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=2e-3, atol=2e-3)


def test_dpm_first_executed_step_is_first_order():
    """Entering the loop at i>0 (img2img) must take a FIRST-order step:
    there is no x0 history, and the second-order update would inject a
    spurious 0.5·(x0/r) term against x0_prev=0 (diffusers guards this
    with lower_order_nums)."""
    sch = DPMSolverMultistepScheduler()
    st = sch.set_timesteps(10)
    x0, n = _problem()
    st = sch.prepare_state(st, x0)
    start = 3
    sig = st["sigmas"][start]
    a = 1.0 / jnp.sqrt(1 + sig**2)
    x = a * x0 + sig * a * n

    out, st2 = sch.step(st, n, start, x)

    # manual first-order DPM++ update
    sig_t = st["sigmas"][start + 1]
    a_t = 1.0 / jnp.sqrt(1 + sig_t**2)
    st_t = sig_t * a_t
    st_s0 = sig * a
    h = jnp.log(a_t / st_t) - jnp.log(a / st_s0)
    x0_pred = (x - st_s0 * n) / a
    expected = (st_t / st_s0) * x - a_t * jnp.expm1(-h) * x0_pred
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-6
    )
    # and the NEXT step must use second order (history now exists)
    assert bool(st2["has_history"])
