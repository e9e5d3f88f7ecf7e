"""Flow-matching sampler (Euler integrator).

Capability parity with reference `models/action_model/respace.py:118-156`
(FMDiffusion.ddim_sample_loop): starting from fresh Gaussian noise, integrate
final += (1/T) * u_t with t = i/T over T steps; CFG is neutralised
(cfg_scale forced to 1.0) exactly as the reference does. Implemented as a
single lax.scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def flow_matching_sample_loop(model_fn, num_steps: int, shape, rng,
                              dtype=jnp.float32, x0=None):
    """model_fn(x, t_float_per_batch) -> u_t. Returns the integrated sample.
    `x0` overrides the initial noise draw (callers that need noise-row
    parity with a larger batch pass a pre-sliced draw)."""
    if x0 is None:
        x0 = jax.random.normal(rng, shape, dtype)
    ts = jnp.asarray(np.arange(num_steps, dtype=np.float32) / num_steps)
    delta = 1.0 / num_steps
    b = shape[0]

    def step(x, t):
        ut = model_fn(x, jnp.full((b,), t, jnp.float32))
        return (x + delta * ut).astype(dtype), None

    out, _ = jax.lax.scan(step, x0, ts)
    return out
