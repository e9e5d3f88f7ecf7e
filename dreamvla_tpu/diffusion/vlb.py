"""Variational-lower-bound diffusion terms + importance timestep samplers.

Capability parity with the reference's IDDPM port beyond the main MSE path:
  * `normal_kl`, `approx_standard_normal_cdf`,
    `discretized_gaussian_log_likelihood`
    (models/action_model/diffusion_utils.py:10-88);
  * `vb_terms_bpd`, `prior_bpd`, `calc_bpd_loop`, and the KL / RESCALED_KL
    training losses (models/action_model/gaussian_diffusion.py:691-882);
  * `UniformSampler` / `LossSecondMomentResampler` importance samplers
    (models/action_model/timestep_sampler.py:13-150).

The reference's main path never exercises these (UniformSampler timesteps
with MSE loss); they exist for research parity. TPU design: everything is a
pure function over the precomputed `DiffusionSchedule` tables; the
full-VLB evaluation loop is a `lax.scan` over timesteps instead of a
Python loop of device syncs; the samplers keep their loss-history state in
host numpy (they run between steps, not inside jit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.diffusion.gaussian import (DiffusionSchedule,
                                             _pred_xstart_from_eps, q_sample)


def _bcast(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    shape = (-1,) + (1,) * (ndim - 1)
    return jnp.asarray(table, jnp.float32)[t].reshape(shape)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians, broadcasting over shapes (nats)."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray,
                                         (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Tanh approximation of the standard normal CDF."""
    return 0.5 * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a gaussian discretized to 1/255 bins; x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta))


def q_mean_variance(sched: DiffusionSchedule, x0, t):
    """Mean/variance of q(x_t | x_0)."""
    mean = _bcast(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
    var = _bcast(1.0 - sched.alphas_cumprod, t, x0.ndim)
    logvar = _bcast(np.log(1.0 - sched.alphas_cumprod), t, x0.ndim)
    return mean, var, logvar


def _posterior_log_variance_clipped(sched: DiffusionSchedule) -> np.ndarray:
    pv = sched.posterior_variance
    return np.log(np.append(pv[1], pv[1:]))


def q_posterior_mean_variance(sched: DiffusionSchedule, x0, x_t, t):
    """Mean/log-variance of q(x_{t-1} | x_t, x_0) (FIXED_SMALL tables)."""
    mean = (_bcast(sched.posterior_mean_coef1, t, x0.ndim) * x0
            + _bcast(sched.posterior_mean_coef2, t, x0.ndim) * x_t)
    logvar = _bcast(_posterior_log_variance_clipped(sched), t, x0.ndim)
    return mean, logvar


def p_mean_variance(sched: DiffusionSchedule, eps_fn, x, t,
                    clip_denoised: bool = False):
    """p(x_{t-1} | x_t) for an epsilon-prediction model, FIXED_SMALL
    variance. eps_fn(x, t_mapped_float) -> eps (respacing applied like
    gaussian.ddim_sample_loop)."""
    t_model = jnp.asarray(sched.timestep_map, jnp.float32)[t]
    eps = eps_fn(x, t_model)
    x0 = _pred_xstart_from_eps(sched, x, t, eps)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    mean, logvar = q_posterior_mean_variance(sched, x0, x, t)
    return {"mean": mean, "log_variance": logvar, "pred_xstart": x0}


def vb_terms_bpd(sched: DiffusionSchedule, eps_fn, x_start, x_t, t,
                 clip_denoised: bool = False):
    """One VLB term in bits: KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)), or
    the decoder NLL at t == 0."""
    true_mean, true_logvar = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(sched, eps_fn, x_t, t, clip_denoised)
    kl = mean_flat(normal_kl(true_mean, true_logvar,
                             out["mean"], out["log_variance"])) / math.log(2.0)
    nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
    nll = mean_flat(nll) / math.log(2.0)
    return {"output": jnp.where(t == 0, nll, kl),
            "pred_xstart": out["pred_xstart"]}


def prior_bpd(sched: DiffusionSchedule, x_start):
    """KL(q(x_T|x_0) || N(0, 1)) in bits per batch element."""
    b = x_start.shape[0]
    t = jnp.full((b,), sched.num_timesteps - 1, jnp.int32)
    mean, _, logvar = q_mean_variance(sched, x_start, t)
    return mean_flat(normal_kl(mean, logvar, 0.0, 0.0)) / math.log(2.0)


def vlb_training_loss(sched: DiffusionSchedule, eps_fn, x_start, t, rng,
                      rescaled: bool = False):
    """LossType.KL / RESCALED_KL of reference training_losses
    (gaussian_diffusion.py:744-753). Returns a per-example [N] loss."""
    noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
    x_t = q_sample(sched, x_start, t, noise)
    loss = vb_terms_bpd(sched, eps_fn, x_start, x_t, t)["output"]
    if rescaled:
        loss = loss * sched.num_timesteps
    return loss


def calc_bpd_loop(sched: DiffusionSchedule, eps_fn, x_start, rng,
                  clip_denoised: bool = True):
    """Full VLB evaluation: scan t = T-1..0 (reference calc_bpd_loop,
    gaussian_diffusion.py:817-869 — a Python loop of device syncs there).

    Returns dict with total_bpd [N], prior_bpd [N], vb / xstart_mse /
    mse [N, T] (T ordered t = T-1 .. 0, matching the reference's append
    order)."""
    T = sched.num_timesteps
    b = x_start.shape[0]
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    rngs = jax.random.split(rng, T)

    def step(_, per):
        t_scalar, step_rng = per
        t = jnp.full((b,), t_scalar, jnp.int32)
        noise = jax.random.normal(step_rng, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        out = vb_terms_bpd(sched, eps_fn, x_start, x_t, t, clip_denoised)
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        # eps implied by pred_xstart (reference _predict_eps_from_xstart)
        c1 = _bcast(sched.sqrt_recip_alphas_cumprod, t, x_start.ndim)
        c2 = _bcast(sched.sqrt_recipm1_alphas_cumprod, t, x_start.ndim)
        eps = (c1 * x_t - out["pred_xstart"]) / c2
        mse = mean_flat((eps - noise) ** 2)
        return None, (out["output"], xstart_mse, mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, (ts, rngs))
    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": jnp.sum(vb, axis=0) + pb,
        "prior_bpd": pb,
        "vb": vb.T,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }


# -- importance timestep samplers (host-side state) -------------------------


class UniformSampler:
    """Uniform timestep sampling with unit weights
    (timestep_sampler.py:62-68)."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def weights(self) -> np.ndarray:
        return np.ones([self.num_timesteps])

    def sample(self, batch_size: int, rng: np.random.Generator):
        w = self.weights()
        p = w / w.sum()
        idx = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[idx])
        return idx.astype(np.int64), weights.astype(np.float32)


class LossSecondMomentResampler(UniformSampler):
    """Importance-sample timesteps by the second moment of recent losses
    (timestep_sampler.py:119-150). Uniform until every timestep has
    `history_per_term` recorded losses."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        super().__init__(num_timesteps)
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term],
                                      np.float64)
        self._loss_counts = np.zeros([num_timesteps], np.int64)

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def update_with_all_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())
