"""Sequence-parallel trunk (parallel/sp.py) on the CPU mesh.

Load-bearing test: ring attention + token-sharded block math must give
the SAME loss and per-parameter gradients as the sequential trunk — the
ring is exact dense attention reassociated, and the raw-param block
mirror must not drift from models/gpt2.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.sp import build_sp_trunk_apply, make_sp_mesh
from dreamvla_tpu.parallel.train_step import make_loss_fn
from dreamvla_tpu.utils.testing import (cached_train_state,
                                        make_synthetic_batch)


@pytest.fixture(scope="module")
def shared():
    """One params init for the whole module — init traces the full model
    (~30 s on this 1-core CPU) and dropout does not change param shapes,
    so both tests reuse it."""
    cfg, tcfg = tiny_test()
    cfg0 = dataclasses.replace(cfg, dropout=0.0)
    model = DreamVLA(cfg0)
    batch = make_synthetic_batch(cfg0, tcfg, batch=4)
    state, _, _ = cached_train_state(model, tcfg, batch, 0, total_steps=10)
    return cfg, tcfg, jax.tree.map(jnp.asarray, batch), state.params


def test_sp_loss_and_grads_match_sequential(shared):
    cfg, tcfg, batch, params = shared
    cfg = dataclasses.replace(cfg, dropout=0.0)
    model = DreamVLA(cfg)
    rng = jax.random.PRNGKey(3)

    loss_plain = make_loss_fn(model, tcfg)
    (l1, _), g1 = jax.jit(jax.value_and_grad(loss_plain, has_aux=True))(
        params, batch, rng)

    mesh = make_sp_mesh(2, 3)  # trunk L=90 tokens -> 30/shard
    sp_apply = build_sp_trunk_apply(cfg, mesh)
    loss_sp = make_loss_fn(model, tcfg, trunk_pipeline=sp_apply)
    (l2, _), g2 = jax.jit(jax.value_and_grad(loss_sp, has_aux=True))(
        params, batch, rng)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(g2)[0])
    assert len(flat1) == len(flat2)
    for path, a in flat1:
        # f32 reassociation noise only (online softmax + ring ordering)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat2[path]), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_sp_runs_with_dropout(shared):
    cfg, tcfg, batch, params = shared  # dropout 0.1 default in cfg
    assert cfg.dropout > 0
    model = DreamVLA(cfg)
    batch = jax.tree.map(lambda a: a[:2], batch)
    mesh = make_sp_mesh(1, 2)
    sp_apply = build_sp_trunk_apply(cfg, mesh)
    loss_sp = make_loss_fn(model, tcfg, trunk_pipeline=sp_apply)
    loss, _ = jax.jit(loss_sp)(params, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
