"""Optimizer and LR schedules.

Capability parity with reference `train.py:174-210`: AdamW (torch defaults:
betas 0.9/0.999, eps 1e-8) over *trainable* params only (frozen
vision/text encoders excluded, train.py:122-172), HF-style constant /
linear / cosine schedules with `warmup_epochs * steps_per_epoch` warmup, and
global-norm gradient clipping at 0.1 (train_utils.py:600) — applied before
the optimizer update, matching torch clip_grad_norm_ semantics.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import optax

FROZEN_SUBTREES = ("vision_encoder", "text_encoder")


def build_lr_schedule(kind: str, base_lr: float, warmup_steps: int,
                      total_steps: int) -> optax.Schedule:
    warmup_steps = max(0, min(warmup_steps, total_steps - 1))
    if kind == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.constant_schedule(base_lr)], [max(warmup_steps, 1)])
    if kind == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
             optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1))],
            [max(warmup_steps, 1)])
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, max(warmup_steps, 1), max(total_steps, 2), end_value=0.0)
    if kind == "cosine_restart":
        # torch CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=1e-7),
        # stepped per optimizer step like the reference wires it
        # (train.py:205-206 + train_utils.py:605); no warmup.
        t0, t_mult, eta_min = 10.0, 2.0, 1e-7

        def sched(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 0.0)
            n = jnp.floor(jnp.log2(s / t0 * (t_mult - 1.0) + 1.0))
            start = t0 * (t_mult ** n - 1.0) / (t_mult - 1.0)
            t_i = t0 * t_mult ** n
            t_cur = s - start
            return eta_min + (base_lr - eta_min) * (
                1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

        return sched
    raise ValueError(f"unknown lr scheduler {kind!r}")


def trainable_mask(params, frozen: Sequence[str] = FROZEN_SUBTREES):
    """Pytree of bools: False for params under frozen top-level subtrees."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_trainable(path):
        top = path[0]
        key = getattr(top, "key", getattr(top, "idx", None))
        return key not in frozen

    mask = {path: is_trainable(path) for path, _ in flat}
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [mask[path] for path, _ in flat])


def build_optimizer(params, schedule: optax.Schedule, weight_decay: float,
                    grad_clip_norm: float = 0.1,
                    frozen: Sequence[str] = FROZEN_SUBTREES):
    mask = trainable_mask(params, frozen)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    return optax.multi_transform(
        {True: tx, False: optax.set_to_zero()}, mask)
