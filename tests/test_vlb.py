"""VLB diffusion terms + importance samplers vs a torch transcription of the
reference math (models/action_model/diffusion_utils.py:10-88,
gaussian_diffusion.py:691-882, timestep_sampler.py:119-150)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dreamvla_tpu.diffusion.gaussian import make_schedule, q_sample
from dreamvla_tpu.diffusion import vlb


def torch_normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + torch.exp(logvar1 - logvar2)
                  + (mean1 - mean2) ** 2 * torch.exp(-logvar2))


def torch_approx_cdf(x):
    return 0.5 * (1.0 + torch.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def torch_discretized_ll(x, means, log_scales):
    centered = x - means
    inv_stdv = torch.exp(-log_scales)
    cdf_plus = torch_approx_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = torch_approx_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = torch.log(cdf_plus.clamp(min=1e-12))
    log_one_minus = torch.log((1.0 - cdf_min).clamp(min=1e-12))
    return torch.where(
        x < -0.999, log_cdf_plus,
        torch.where(x > 0.999, log_one_minus,
                    torch.log((cdf_plus - cdf_min).clamp(min=1e-12))))


def test_normal_kl_matches_torch():
    rng = np.random.default_rng(0)
    m1, lv1, m2, lv2 = (rng.normal(size=(4, 5)).astype(np.float32)
                        for _ in range(4))
    want = torch_normal_kl(*(torch.from_numpy(a) for a in (m1, lv1, m2, lv2)))
    got = vlb.normal_kl(m1, lv1, m2, lv2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_discretized_ll_matches_torch():
    rng = np.random.default_rng(1)
    x = np.clip(rng.normal(size=(3, 7)), -1, 1).astype(np.float32)
    x[0, 0], x[0, 1] = -1.0, 1.0  # exercise the edge branches
    means = (0.5 * rng.normal(size=(3, 7))).astype(np.float32)
    ls = (0.3 * rng.normal(size=(3, 7)) - 1).astype(np.float32)
    want = torch_discretized_ll(torch.from_numpy(x), torch.from_numpy(means),
                                torch.from_numpy(ls))
    got = vlb.discretized_gaussian_log_likelihood(
        x, means=means, log_scales=ls)
    # log(cdf_plus - cdf_min) amplifies fp32 ULP differences between the
    # two tanh implementations (catastrophic cancellation) — compare
    # relatively, the formulas are identical
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-3,
                               atol=1e-5)


def _torch_vb_term(sched, x_start, x_t, t, eps):
    """Transcribed reference _vb_terms_bpd for epsilon-pred FIXED_SMALL."""
    def ext(tab, t, shape):
        r = torch.from_numpy(np.asarray(tab)).float()[t]
        while r.ndim < len(shape):
            r = r[..., None]
        return r

    pv = sched.posterior_variance
    plvc = np.log(np.append(pv[1], pv[1:]))
    x0 = (ext(sched.sqrt_recip_alphas_cumprod, t, x_t.shape) * x_t
          - ext(sched.sqrt_recipm1_alphas_cumprod, t, x_t.shape) * eps)
    post = lambda xs: (ext(sched.posterior_mean_coef1, t, x_t.shape) * xs
                       + ext(sched.posterior_mean_coef2, t, x_t.shape) * x_t)
    true_mean, true_lv = post(x_start), ext(plvc, t, x_t.shape)
    mean, lv = post(x0), ext(plvc, t, x_t.shape)
    kl = torch_normal_kl(true_mean, true_lv, mean, lv)
    kl = kl.flatten(1).mean(1) / math.log(2.0)
    nll = -torch_discretized_ll(x_start, mean, 0.5 * lv)
    nll = nll.flatten(1).mean(1) / math.log(2.0)
    return torch.where(t == 0, nll, kl)


def test_vb_terms_bpd_matches_torch_oracle():
    sched = make_schedule("squaredcos_cap_v2", 20)
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(4, 3, 7)).astype(np.float32) * 0.5
    noise = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([0, 3, 10, 19])
    x_t = np.asarray(q_sample(sched, jnp.asarray(x0), jnp.asarray(t),
                              jnp.asarray(noise)))
    # deterministic fake eps model shared between both sides
    eps_fn = lambda x, t_model: 0.1 * x + 0.01 * t_model[:, None, None]
    got = vlb.vb_terms_bpd(sched, eps_fn, jnp.asarray(x0), jnp.asarray(x_t),
                           jnp.asarray(t))
    eps_t = torch.from_numpy(np.asarray(
        eps_fn(jnp.asarray(x_t),
               jnp.asarray(sched.timestep_map, jnp.float32)[t])))
    want = _torch_vb_term(sched, torch.from_numpy(x0), torch.from_numpy(x_t),
                          torch.from_numpy(t), eps_t)
    np.testing.assert_allclose(np.asarray(got["output"]), want.numpy(),
                               atol=2e-5)


def test_prior_and_full_bpd_loop():
    sched = make_schedule("squaredcos_cap_v2", 10)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32) * 0.3)
    eps_fn = lambda x, t_model: 0.2 * x
    out = jax.jit(lambda x, r: vlb.calc_bpd_loop(sched, eps_fn, x, r))(
        x0, jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, 10)
    assert out["xstart_mse"].shape == (2, 10)
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_bpd"]),
        rtol=1e-5)
    # the VLB of any model is positive
    assert (np.asarray(out["total_bpd"]) > 0).all()


def test_vlb_training_loss_runs_and_rescales():
    sched = make_schedule("squaredcos_cap_v2", 10)
    x0 = jnp.asarray(np.random.default_rng(4).normal(size=(3, 2, 7)),
                     jnp.float32)
    t = jnp.asarray([0, 4, 9])
    eps_fn = lambda x, tm: 0.3 * x
    base = vlb.vlb_training_loss(sched, eps_fn, x0, t, jax.random.PRNGKey(1))
    resc = vlb.vlb_training_loss(sched, eps_fn, x0, t, jax.random.PRNGKey(1),
                                 rescaled=True)
    np.testing.assert_allclose(np.asarray(resc), np.asarray(base) * 10,
                               rtol=1e-6)


def test_loss_second_moment_resampler_semantics():
    s = vlb.LossSecondMomentResampler(5, history_per_term=2,
                                      uniform_prob=0.001)
    # cold: uniform weights
    np.testing.assert_allclose(s.weights(), np.ones(5))
    # fill history: timestep i gets loss i+1 twice
    for _ in range(2):
        s.update_with_all_losses(np.arange(5), np.arange(1.0, 6.0))
    assert s._warmed_up()
    w = s.weights()
    raw = np.sqrt(np.mean(np.square(
        np.stack([np.arange(1.0, 6.0)] * 2, 1)), -1))
    want = raw / raw.sum() * (1 - 0.001) + 0.001 / 5
    np.testing.assert_allclose(w, want, rtol=1e-12)
    # importance weights are unbiased: E[w] == 1 under the sampling dist
    idx, iw = s.sample(4096, np.random.default_rng(0))
    p = w / w.sum()
    np.testing.assert_allclose((p * (1 / (len(p) * p))).sum(), 1.0,
                               rtol=1e-12)
    assert idx.shape == (4096,) and iw.shape == (4096,)
    # rolling history shifts the oldest entry out
    s.update_with_all_losses([0], [9.0])
    np.testing.assert_allclose(s._loss_history[0], [1.0, 9.0])
