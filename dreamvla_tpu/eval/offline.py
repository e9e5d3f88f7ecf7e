"""Offline (open-loop) evaluation on recorded observations.

The reference's only quality signals are full simulator benchmarks and
wandb spot-checks (SURVEY §4); this harness adds the missing middle layer:
replay recorded windows through the policy and score predicted action
chunks against the recorded actions (arm L1, gripper accuracy) — no
PyBullet/MuJoCo needed, runs anywhere the data does, and catches wiring
regressions (token layout, selection rules, checkpoint import) cheaply.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.eval.policy import build_policy_fn
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.train_step import action_chunks, prepare_model_inputs


def evaluate_open_loop(model: DreamVLA, params, data_info,
                       num_batches: int = 20, seed: int = 0,
                       text_encoder_available: bool = True) -> Dict[str, float]:
    cfg = model.cfg
    policy = build_policy_fn(model)
    rng = jax.random.PRNGKey(seed)
    arm_l1, grip_acc, n = 0.0, 0.0, 0

    data_info.set_epoch(0)
    for i, batch in enumerate(data_info.dataloader):
        if i >= num_batches:
            break
        inputs = prepare_model_inputs(cfg, jax.tree.map(jnp.asarray, batch))
        rng, sub = jax.random.split(rng)
        arm, grip = policy(params, inputs["image_primary"],
                           inputs["image_wrist"], inputs["state"],
                           inputs.get("text_tokens",
                                      inputs.get("text_features")), sub)
        labels = inputs["action_label"]  # (B, S, steps, 7)
        s_eff = cfg.sequence_length - cfg.atten_goal
        arm_l1 += float(jnp.mean(jnp.abs(
            arm[:, :s_eff] - labels[:, :s_eff, :, :6])))
        pred_grip = (np.asarray(grip[:, :s_eff, :, 0]) > 0.5).astype(np.float32)
        grip_acc += float(
            (pred_grip == np.asarray(labels[:, :s_eff, :, 6])).mean())
        n += 1
    if n == 0:
        raise ValueError("no batches evaluated")
    return {"arm_action_l1": arm_l1 / n, "gripper_accuracy": grip_acc / n,
            "batches": n}
