"""Golden tests for the diffusion math (schedules, respacing, samplers)."""

import numpy as np
import jax
import jax.numpy as jnp

from dreamvla_tpu.diffusion import (
    cosine_beta_schedule,
    ddim_sample_loop,
    ddim_timestep_map,
    flow_matching_sample_loop,
    linear_beta_schedule,
    make_schedule,
    p_sample_loop,
    q_sample,
    respace_schedule,
)


def test_cosine_schedule_values():
    import math

    betas = cosine_beta_schedule(100)
    acp = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    for i in [0, 7, 50, 99]:
        want = min(1 - acp((i + 1) / 100) / acp(i / 100), 0.999)
        np.testing.assert_allclose(betas[i], want, rtol=1e-12)


def test_linear_schedule_scaled():
    betas = linear_beta_schedule(100)
    np.testing.assert_allclose(betas[0], 10 * 0.0001)
    np.testing.assert_allclose(betas[-1], 10 * 0.02)


def test_ddim_map_matches_reference_striding():
    # reference: smallest stride i with len(range(0, T, i)) == N (respace.py:36-38)
    np.testing.assert_array_equal(ddim_timestep_map(100, 10),
                                  np.arange(0, 100, 10))
    np.testing.assert_array_equal(ddim_timestep_map(100, 50),
                                  np.arange(0, 100, 2))
    np.testing.assert_array_equal(ddim_timestep_map(100, 1), [50])


def test_respaced_betas():
    base = make_schedule("squaredcos_cap_v2", 100)
    sub = respace_schedule(base, ddim_timestep_map(100, 10))
    acp = base.alphas_cumprod
    last = 1.0
    for j, t in enumerate(sub.timestep_map):
        want = 1 - acp[t] / last
        np.testing.assert_allclose(sub.betas[j], want, rtol=1e-12)
        last = acp[t]


def test_q_sample_closed_form():
    sched = make_schedule("squaredcos_cap_v2", 100)
    x0 = jnp.ones((2, 3, 7))
    noise = jnp.full((2, 3, 7), 2.0)
    t = jnp.array([5, 50])
    out = np.asarray(q_sample(sched, x0, t, noise))
    for b, tt in enumerate([5, 50]):
        want = (np.sqrt(sched.alphas_cumprod[tt])
                + 2 * np.sqrt(1 - sched.alphas_cumprod[tt]))
        np.testing.assert_allclose(out[b], want, rtol=1e-5)


def _numpy_ddim(sched, noise, model):
    """Hand-rolled IDDPM ddim_sample_loop (eta=0, EPSILON, clip=False)."""
    x = np.asarray(noise, np.float64)
    acp = sched.alphas_cumprod
    acp_prev = sched.alphas_cumprod_prev
    for t in range(sched.num_timesteps - 1, -1, -1):
        t_model = float(sched.timestep_map[t])
        eps = model(x, t_model)
        x0 = np.sqrt(1.0 / acp[t]) * x - np.sqrt(1.0 / acp[t] - 1.0) * eps
        x = x0 * np.sqrt(acp_prev[t]) + np.sqrt(1 - acp_prev[t]) * eps
    return x


def test_ddim_scan_matches_numpy_reference():
    base = make_schedule("squaredcos_cap_v2", 100)
    sub = respace_schedule(base, ddim_timestep_map(100, 10))
    w = np.linspace(-0.5, 0.5, 7)

    def np_model(x, t):
        return 0.1 * x * w + 0.01 * t

    def jax_model(x, t):
        return 0.1 * x * jnp.asarray(w, jnp.float32) + 0.01 * t[:, None, None]

    noise = np.random.default_rng(0).normal(size=(2, 3, 7)).astype(np.float32)
    want = _numpy_ddim(sub, noise, np_model)
    got = np.asarray(ddim_sample_loop(jax_model, sub, jnp.asarray(noise)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ddpm_ancestral_runs_finite():
    sched = make_schedule("squaredcos_cap_v2", 20)

    def model(x, t):
        return 0.1 * x

    out = p_sample_loop(model, sched, jnp.zeros((2, 3, 7)) + 0.5,
                        jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_flow_matching_euler_matches_numpy():
    def jax_model(x, t):
        return -x + t[:, None, None]

    out = np.asarray(flow_matching_sample_loop(jax_model, 10, (2, 3, 4),
                                               jax.random.PRNGKey(1)))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4)))
    for i in range(10):
        t = i / 10
        x = x + 0.1 * (-x + t)
    np.testing.assert_allclose(out, x, atol=1e-5)
