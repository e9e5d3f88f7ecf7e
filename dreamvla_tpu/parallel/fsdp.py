"""FSDP-style parameter sharding over a 2-D (dp, fsdp) mesh.

The reference scales with DDP only (SURVEY §2.5); at DreamVLA sizes that is
fine, but production fleets want the memory headroom. This module provides
the idiomatic JAX version: jit the *same* train step with NamedSharding
annotations — batch split over 'dp', large parameter matrices split over
'fsdp' along their last axis — and let GSPMD insert the all-gathers /
reduce-scatters (riding ICI). No NCCL-style hand-written collectives; the
single-device step function is reused verbatim.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dreamvla_tpu.config import TrainConfig
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.train_step import (TrainState, accumulate_grads,
                                              make_loss_fn)

import optax


def make_fsdp_mesh(n_dp: int, n_fsdp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[: n_dp * n_fsdp].reshape(n_dp, n_fsdp), ("dp", "fsdp"))


def leaf_spec(x, fsdp_size: int, min_size: int = 2**16) -> P:
    """Shard a leaf's last axis over 'fsdp' when it's big and divisible."""
    if (hasattr(x, "ndim") and x.ndim >= 2 and x.size >= min_size
            and x.shape[-1] % fsdp_size == 0):
        return P(*([None] * (x.ndim - 1) + ["fsdp"]))
    return P()


def state_shardings(state: TrainState, mesh: Mesh):
    fsdp = mesh.shape["fsdp"]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, leaf_spec(x, fsdp)), state)


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    sh = state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, sh)


def build_fsdp_train_step(model: DreamVLA, tcfg: TrainConfig, tx,
                          mesh: Mesh, donate: bool = True):
    """jitted step(state, batch, rng) -> (state, LossOutputs): batch
    (accum, B, ...) sharded over 'dp' at dim 1; state sharded per
    `state_shardings`; GSPMD handles all communication (gradient reduction
    over dp, weight gathers over fsdp)."""
    loss_fn = make_loss_fn(model, tcfg)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, losses = accumulate_grads(loss_fn, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, losses

    def compile_step(state):
        st_sh = state_shardings(state, mesh)
        rep = NamedSharding(mesh, P())
        # batch sharding is taken from the arrays themselves (device_put the
        # host batch with shard_batch(mesh, batch) -> P(None, 'dp') at dim 1)
        return jax.jit(
            step,
            in_shardings=(st_sh, None, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    return compile_step
