"""Synthetic batch fixtures (window contract) for tests, dry-runs, benches."""

from __future__ import annotations

from typing import Dict

import numpy as np

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig


def make_synthetic_batch(cfg: DreamVLAConfig, tcfg: TrainConfig, batch: int,
                         seed: int = 0, with_labels: bool = True) -> Dict:
    """One host micro-batch matching the collator's window contract."""
    rng = np.random.default_rng(seed)
    # collator contract: frames cover window_size + pred_num - 1 steps;
    # actions additionally cover the chunk tail (+act_step-1)
    w = tcfg.window_size + cfg.pred_num - 1
    wa = w + cfg.action_pred_steps - 1
    hw = cfg.image_size
    f32 = np.float32
    out = dict(
        images_primary=rng.normal(size=(batch, w, 3, hw, hw)).astype(f32),
        images_wrist=rng.normal(size=(batch, w, 3, hw, hw)).astype(f32),
        states=np.concatenate(
            [rng.normal(size=(batch, w, 6)).astype(f32),
             rng.integers(0, 2, size=(batch, w, 1)).astype(f32)], axis=-1),
        actions=np.concatenate(
            [rng.normal(size=(batch, wa, 6)).astype(f32),
             rng.integers(0, 2, size=(batch, wa, 1)).astype(f32)], axis=-1),
    )
    if cfg.include_text_encoder:
        out["text_tokens"] = rng.integers(0, 49408, size=(batch, 77)).astype(np.int32)
    else:
        out["text_features"] = rng.normal(size=(batch, 512)).astype(f32)
    if with_labels:
        if cfg.depth_pred:
            out["depth_primary"] = np.abs(rng.normal(size=(batch, w, 1, hw, hw))).astype(f32)
            out["depth_wrist"] = np.abs(rng.normal(size=(batch, w, 1, hw, hw))).astype(f32)
        if cfg.dino_feat_pred:
            out["dino_primary"] = rng.normal(size=(batch, w, 256, 768)).astype(f32)
            out["dino_wrist"] = rng.normal(size=(batch, w, 256, 768)).astype(f32)
        if cfg.sam_feat_pred:
            out["sam_primary"] = rng.normal(size=(batch, w, 256, 256)).astype(f32)
            out["sam_wrist"] = rng.normal(size=(batch, w, 256, 256)).astype(f32)
        if cfg.trajectory_pred or True:  # tracks also feed flow_as_mask
            g = cfg.traj_grid
            out["tracks"] = rng.normal(size=(batch, w, g * g, 2)).astype(f32)
            out["tracks_gripper"] = rng.normal(size=(batch, w, g * g, 2)).astype(f32)
    return out


def add_accum_axis(batch: Dict, accum: int = 1) -> Dict:
    """Tile a micro-batch into the (accum, B, ...) layout of the train step."""
    return {k: np.broadcast_to(v[None], (accum,) + v.shape).copy()
            for k, v in batch.items()}
