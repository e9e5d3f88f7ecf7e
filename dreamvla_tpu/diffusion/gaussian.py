"""Gaussian diffusion math, functional and scan-shaped for XLA.

Capability parity with reference `models/action_model/gaussian_diffusion.py`
(the OpenAI IDDPM port: beta schedules, q_sample, DDPM ancestral sampling,
DDIM sampling) and `respace.py` (DDIM timestep striding + respaced betas +
timestep remapping). Restricted to the configuration the action model
actually uses — epsilon prediction, FIXED_SMALL variance, MSE loss,
clip_denoised=False — but keeps DDPM + DDIM + respacing as separate
capabilities.

TPU design: schedules are precomputed numpy constants (trace-time baked);
sampling loops are `jax.lax.scan` over stacked per-step coefficient tables,
so the whole sampler jits into a single fused loop — no per-step host
dispatch like the reference's Python `for` over timesteps.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(num_steps: int) -> np.ndarray:
    """IDDPM 'linear': scaled so any num_steps matches the 1000-step shape."""
    scale = 1000.0 / num_steps
    return np.linspace(scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64)


def cosine_beta_schedule(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """IDDPM 'squaredcos_cap_v2' schedule."""

    def acp(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - acp(t2) / acp(t1), max_beta))
    return np.array(betas, dtype=np.float64)


_SCHEDULES = {"linear": linear_beta_schedule, "squaredcos_cap_v2": cosine_beta_schedule}


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed coefficient tables for a beta sequence."""

    betas: np.ndarray
    timestep_map: np.ndarray  # respaced index -> original timestep id

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)

    @property
    def alphas_cumprod_prev(self) -> np.ndarray:
        return np.append(1.0, self.alphas_cumprod[:-1])

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    @property
    def sqrt_recip_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod)

    @property
    def sqrt_recipm1_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod - 1.0)

    @property
    def posterior_variance(self) -> np.ndarray:
        acp, acp_prev = self.alphas_cumprod, self.alphas_cumprod_prev
        return self.betas * (1.0 - acp_prev) / (1.0 - acp)

    @property
    def posterior_mean_coef1(self) -> np.ndarray:
        acp, acp_prev = self.alphas_cumprod, self.alphas_cumprod_prev
        return self.betas * np.sqrt(acp_prev) / (1.0 - acp)

    @property
    def posterior_mean_coef2(self) -> np.ndarray:
        acp, acp_prev = self.alphas_cumprod, self.alphas_cumprod_prev
        return (1.0 - acp_prev) * np.sqrt(1.0 - self.betas) / (1.0 - acp)


def make_schedule(name: str = "squaredcos_cap_v2", num_steps: int = 100) -> DiffusionSchedule:
    betas = _SCHEDULES[name](num_steps)
    return DiffusionSchedule(betas=betas, timestep_map=np.arange(num_steps))


def ddim_timestep_map(num_timesteps: int, desired: int) -> np.ndarray:
    """DDIM-paper fixed striding (respace.py:31-41 semantics incl. the
    desired==1 -> {50} special case)."""
    if desired == 1:
        return np.array([50])
    for stride in range(1, num_timesteps):
        steps = list(range(0, num_timesteps, stride))
        if len(steps) == desired:
            return np.array(steps)
    raise ValueError(f"cannot stride {num_timesteps} into exactly {desired} steps")


def respace_schedule(base: DiffusionSchedule, use_timesteps: np.ndarray) -> DiffusionSchedule:
    """Subset a schedule: new_beta_i = 1 - acp[t_i]/acp[t_{i-1}]."""
    use = sorted(set(int(t) for t in use_timesteps))
    acp = base.alphas_cumprod
    last, new_betas, tmap = 1.0, [], []
    for i, a in enumerate(acp):
        if i in set(use):
            new_betas.append(1 - a / last)
            last = a
            tmap.append(i)
    return DiffusionSchedule(betas=np.array(new_betas), timestep_map=np.array(tmap))


def q_sample(sched: DiffusionSchedule, x0: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion: x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
    c1 = jnp.asarray(sched.sqrt_alphas_cumprod, x0.dtype)[t]
    c2 = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, x0.dtype)[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return c1.reshape(shape) * x0 + c2.reshape(shape) * noise


def _pred_xstart_from_eps(sched, x, t, eps):
    c1 = jnp.asarray(sched.sqrt_recip_alphas_cumprod, x.dtype)[t]
    c2 = jnp.asarray(sched.sqrt_recipm1_alphas_cumprod, x.dtype)[t]
    shape = (-1,) + (1,) * (x.ndim - 1)
    return c1.reshape(shape) * x - c2.reshape(shape) * eps


def ddim_sample_loop(model_fn, sched: DiffusionSchedule, noise: jnp.ndarray,
                     rng=None, eta: float = 0.0) -> jnp.ndarray:
    """DDIM sampling as one lax.scan, t = T-1 .. 0.

    model_fn(x, t_original_float) -> eps, where t_original applies the
    respacing timestep_map (the reference's `_WrappedModel`). With eta=0 the
    rng is unused.
    """
    T = sched.num_timesteps
    ts = np.arange(T - 1, -1, -1)
    tables = {
        "t_mapped": sched.timestep_map[ts].astype(np.float32),
        "acp": sched.alphas_cumprod[ts].astype(np.float32),
        "acp_prev": sched.alphas_cumprod_prev[ts].astype(np.float32),
        "t_idx": ts.astype(np.int32),
    }
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    rngs = (
        jax.random.split(rng, T)
        if rng is not None
        else jnp.zeros((T, 2), jnp.uint32)
    )
    b = noise.shape[0]

    def step(x, per):
        tab, step_rng = per
        t = jnp.full((b,), tab["t_idx"], jnp.int32)
        t_model = jnp.full((b,), tab["t_mapped"], jnp.float32)
        eps = model_fn(x, t_model)
        x0 = _pred_xstart_from_eps(sched, x, t, eps)
        ab, abp = tab["acp"], tab["acp_prev"]
        sigma = (
            eta
            * jnp.sqrt((1 - abp) / jnp.maximum(1 - ab, 1e-12))
            * jnp.sqrt(jnp.maximum(1 - ab / abp, 0.0))
        )
        mean = x0 * jnp.sqrt(abp) + jnp.sqrt(jnp.maximum(1 - abp - sigma**2, 0.0)) * eps
        if eta > 0.0:
            z = jax.random.normal(step_rng, x.shape, x.dtype)
            nonzero = (tab["t_idx"] != 0).astype(x.dtype)
            mean = mean + nonzero * sigma * z
        return mean.astype(x.dtype), None

    out, _ = jax.lax.scan(step, noise, (tables, rngs))
    return out


def p_sample_loop(model_fn, sched: DiffusionSchedule, noise: jnp.ndarray,
                  rng: jax.Array) -> jnp.ndarray:
    """DDPM ancestral sampling (FIXED_SMALL variance), t = T-1 .. 0."""
    T = sched.num_timesteps
    ts = np.arange(T - 1, -1, -1)
    tables = {
        "t_mapped": sched.timestep_map[ts].astype(np.float32),
        "t_idx": ts.astype(np.int32),
        "c1": sched.posterior_mean_coef1[ts].astype(np.float32),
        "c2": sched.posterior_mean_coef2[ts].astype(np.float32),
        "logvar": np.log(np.maximum(sched.posterior_variance[ts], 1e-20)).astype(np.float32),
    }
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    rngs = jax.random.split(rng, T)
    b = noise.shape[0]

    def step(x, per):
        tab, step_rng = per
        t = jnp.full((b,), tab["t_idx"], jnp.int32)
        t_model = jnp.full((b,), tab["t_mapped"], jnp.float32)
        eps = model_fn(x, t_model)
        x0 = _pred_xstart_from_eps(sched, x, t, eps)
        mean = tab["c1"] * x0 + tab["c2"] * x
        nonzero = (tab["t_idx"] != 0).astype(x.dtype)
        z = jax.random.normal(step_rng, x.shape, x.dtype)
        x_next = mean + nonzero * jnp.exp(0.5 * tab["logvar"]) * z
        return x_next.astype(x.dtype), None

    out, _ = jax.lax.scan(step, noise, (tables, rngs))
    return out
