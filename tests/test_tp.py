"""Tensor-parallel inference sharding: GSPMD tp matches single-device.

Runs the full policy step under a 4-dp x 2-tp mesh on the virtual CPU
devices with Megatron-style parameter shardings (parallel/tp.py) and
requires the actions to match the unsharded single-device result —
verifying the sharding rules partition cleanly (GSPMD inserts the
block all-reduces) without changing the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.eval.policy import build_policy_core
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.tp import (make_tp_mesh, param_shardings_tp,
                                      shard_batch_dp, shard_params_tp)
from dreamvla_tpu.utils.testing import (make_synthetic_batch,
                                        cached_init)


def test_tp_policy_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    cfg, tcfg = tiny_test()
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 4, cfg.sequence_length
    ip = jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32)
    iw = jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32)
    tf = jnp.asarray(rng.normal(size=(b, 512)), jnp.float32)
    variables = cached_init(
        model, lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2), "mask": jax.random.PRNGKey(3)},
            image_primary=ip, image_wrist=iw, state=st, text_features=tf,
            action_label=jnp.zeros((b, s, cfg.action_pred_steps, 7)),
            mode="train", train=False),
        f"test_tp|b{b}")
    params = variables["params"]
    policy = build_policy_core(model)
    key = jax.random.PRNGKey(7)

    ref_arm, ref_grip = jax.jit(policy)(params, ip, iw, st, tf, key)

    mesh = make_tp_mesh(n_dp=4, n_tp=2)
    # at least one kernel must actually shard over tp
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, param_shardings_tp(params, mesh)))
    assert any("tp" in str(s) for s in specs)

    params_tp = shard_params_tp(params, mesh)
    inputs_tp = shard_batch_dp(mesh, (ip, iw, st, tf))
    arm, grip = jax.jit(policy)(params_tp, *inputs_tp, key)

    np.testing.assert_allclose(np.asarray(arm), np.asarray(ref_arm),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(grip), np.asarray(ref_grip),
                               atol=1e-5, rtol=0)