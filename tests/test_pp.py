"""Pipeline-parallel trunk (parallel/pp.py) on the 8-device CPU mesh.

The load-bearing test is grad parity: the GPipe pipeline (microbatch
ring over stage-sharded blocks) must produce the SAME loss and the same
gradients — for every parameter, trunk stages included — as the plain
sequential trunk, since it is the same math re-scheduled. jax.grad
differentiates through the ppermute ring, so this covers the reverse
pipeline too.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.mesh import shard_batch
from dreamvla_tpu.parallel.pp import (build_pp_train_step,
                                      build_trunk_pipeline, make_pp_mesh,
                                      pp_state_shardings, stack_trunk_stages,
                                      unstack_trunk_stages)
from dreamvla_tpu.parallel.train_step import TrainState, make_loss_fn
from dreamvla_tpu.train.optimizer import build_lr_schedule, build_optimizer
from dreamvla_tpu.utils.testing import (add_accum_axis, cached_train_state,
                                        make_synthetic_batch)


def _pp_cfg(dropout: float):
    cfg, tcfg = tiny_test()
    cfg = dataclasses.replace(cfg, transformer_layers=4, dropout=dropout)
    return cfg, tcfg


@pytest.fixture(scope="module")
def shared():
    """One params init for the whole module — init traces the full model
    (~30 s on this 1-core CPU) and dropout does not change param shapes,
    so every test reuses it."""
    cfg, tcfg = _pp_cfg(0.0)
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=4)
    state, _, _ = cached_train_state(model, tcfg, batch, 0, total_steps=10)
    return tcfg, jax.tree.map(jnp.asarray, batch), state.params


def test_stack_unstack_roundtrip(shared):
    tcfg, _, params = shared
    stacked = stack_trunk_stages(params, 2)
    tb = stacked["transformer_backbone"]
    assert "pp_stages" in tb and "h_0" not in tb and "ln_f" in tb
    lead = jax.tree.leaves(tb["pp_stages"])[0].shape[:2]
    assert lead == (2, 2)
    back = unstack_trunk_stages(stacked)
    jax.tree.map(np.testing.assert_array_equal, params, back)
    with pytest.raises(ValueError):
        stack_trunk_stages(params, 3)  # 4 layers % 3 != 0


def test_pipeline_loss_and_grads_match_sequential(shared):
    cfg, _ = _pp_cfg(0.0)  # dropout off: draws differ per schedule
    tcfg, batch, params = shared
    model = DreamVLA(cfg)
    rng = jax.random.PRNGKey(3)

    loss_plain = make_loss_fn(model, tcfg)
    (l1, _), g1 = jax.jit(jax.value_and_grad(loss_plain, has_aux=True))(
        params, batch, rng)

    mesh = make_pp_mesh(1, 4)
    pipeline = build_trunk_pipeline(cfg, mesh, n_micro=2)
    loss_pp = make_loss_fn(model, tcfg, trunk_pipeline=pipeline)
    params_pp = stack_trunk_stages(params, 4)
    (l2, _), g2 = jax.jit(jax.value_and_grad(loss_pp, has_aux=True))(
        params_pp, batch, rng)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g2u = unstack_trunk_stages(g2)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(g2u)[0])
    assert len(flat1) == len(flat2)
    for path, a in flat1:
        b = flat2[path]
        # f32 reassociation noise only: microbatching + the masked-psum
        # broadcast reorder reductions (observed max ~3e-5 abs on grads of
        # magnitude ~1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pp_train_step_runs_with_dropout_and_shards_stages(shared):
    cfg, _ = _pp_cfg(0.1)  # exercise the in-pipeline dropout rng path
    tcfg, batch, params = shared
    model = DreamVLA(cfg)
    mesh = make_pp_mesh(2, 4)
    # pp state from the shared init (create_pp_train_state re-inits the
    # whole model; the restack + optimizer build is all it adds)
    params_pp = stack_trunk_stages(params, 4)
    schedule = build_lr_schedule(tcfg.lr_scheduler, tcfg.learning_rate,
                                 10, 10)
    tx = build_optimizer(params_pp, schedule, tcfg.weight_decay,
                         tcfg.grad_clip_norm)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params_pp,
                       opt_state=tx.init(params_pp))
    sh = pp_state_shardings(state, mesh)
    specs = [s.spec for s in jax.tree.leaves(sh)]
    assert any("pp" in str(s) for s in specs)
    state = jax.tree.map(jax.device_put, state, sh)

    gbatch = add_accum_axis({k: np.asarray(v) for k, v in batch.items()},
                            accum=1)
    gbatch = shard_batch(mesh, jax.tree.map(jnp.asarray, gbatch))

    step = build_pp_train_step(model, tcfg, tx, mesh, n_micro=2,
                               donate=False)(state)
    st2, losses = step(state, gbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses.total))
    st3, losses3 = step(st2, gbatch, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses3.total))
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        st2.params["transformer_backbone"]["pp_stages"],
        st3.params["transformer_backbone"]["pp_stages"])
    assert max(jax.tree.leaves(moved)) > 0
