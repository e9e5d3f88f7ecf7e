"""FSDP (dp x fsdp mesh) train step on the 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.fsdp import (build_fsdp_train_step, make_fsdp_mesh,
                                        shard_state, state_shardings)
from dreamvla_tpu.parallel.mesh import shard_batch
from dreamvla_tpu.parallel.train_step import create_train_state
from dreamvla_tpu.utils.testing import (cached_train_state,
                                        add_accum_axis, make_synthetic_batch)


def test_fsdp_step_runs_and_shards_params():
    cfg, tcfg = tiny_test()
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=1)
    state, tx, _ = cached_train_state(model, tcfg, batch, 0, total_steps=10)
    mesh = make_fsdp_mesh(2, 4)
    sharded = shard_state(state, mesh)
    # at least one large kernel actually sharded over fsdp
    sh = state_shardings(state, mesh)
    specs = [s.spec for s in jax.tree.leaves(sh)]
    assert any("fsdp" in str(s) for s in specs)

    gbatch = {k: np.concatenate([v] * 2, axis=0) for k, v in batch.items()}
    gbatch = add_accum_axis(gbatch, accum=1)
    gbatch = shard_batch(mesh, jax.tree.map(jnp.asarray, gbatch))

    step = build_fsdp_train_step(model, tcfg, tx, mesh, donate=False)(sharded)
    st2, losses = step(sharded, gbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses.total))
    # two steps to get past warmup lr=0, then params must move
    st3, _ = step(st2, gbatch, jax.random.PRNGKey(2))
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         st2.params["transformer_backbone"],
                         st3.params["transformer_backbone"])
    assert max(jax.tree.leaves(moved)) > 0
