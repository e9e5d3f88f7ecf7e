"""Synthetic batch fixtures (window contract) for tests, dry-runs, benches."""

from __future__ import annotations

from typing import Dict

import numpy as np

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig


def _smooth_images(rng, batch, w, c, hw):
    """Low-frequency image stack (learnable targets: a tiny model can
    memorise these through MAE masking, unlike iid pixel noise)."""
    u = np.linspace(-1.0, 1.0, hw, dtype=np.float32)
    gx, gy = np.meshgrid(u, u, indexing="ij")
    coef = rng.normal(size=(batch, w, c, 3)).astype(np.float32)
    img = (coef[..., 0, None, None] * gx
           + coef[..., 1, None, None] * gy
           + coef[..., 2, None, None] * gx * gy)
    return img.astype(np.float32)


def make_synthetic_batch(cfg: DreamVLAConfig, tcfg: TrainConfig, batch: int,
                         seed: int = 0, with_labels: bool = True,
                         learnable: bool = False) -> Dict:
    """One host micro-batch matching the collator's window contract.

    learnable=True swaps iid-noise images/depth for smooth low-frequency
    fields so an overfit run can actually drive the reconstruction losses
    to ~0 (used by the learning-dynamics test)."""
    rng = np.random.default_rng(seed)
    # collator contract: frames cover window_size + pred_num - 1 steps;
    # actions additionally cover the chunk tail (+act_step-1)
    w = tcfg.window_size + cfg.pred_num - 1
    wa = w + cfg.action_pred_steps - 1
    hw = cfg.image_size
    f32 = np.float32
    if learnable:
        images_primary = _smooth_images(rng, batch, w, 3, hw)
        images_wrist = _smooth_images(rng, batch, w, 3, hw)
    else:
        images_primary = rng.normal(size=(batch, w, 3, hw, hw)).astype(f32)
        images_wrist = rng.normal(size=(batch, w, 3, hw, hw)).astype(f32)
    out = dict(
        images_primary=images_primary,
        images_wrist=images_wrist,
        states=np.concatenate(
            [rng.normal(size=(batch, w, 6)).astype(f32),
             rng.integers(0, 2, size=(batch, w, 1)).astype(f32)], axis=-1),
        actions=np.concatenate(
            # learnable: arm targets inside the tanh head's range (real
            # CALVIN rel_actions live in [-1, 1])
            [(rng.uniform(-0.9, 0.9, size=(batch, wa, 6)) if learnable
              else rng.normal(size=(batch, wa, 6))).astype(f32),
             rng.integers(0, 2, size=(batch, wa, 1)).astype(f32)], axis=-1),
    )
    if cfg.include_text_encoder:
        out["text_tokens"] = rng.integers(0, 49408, size=(batch, 77)).astype(np.int32)
    else:
        out["text_features"] = rng.normal(size=(batch, 512)).astype(f32)
    if with_labels:
        if cfg.depth_pred:
            if learnable:
                out["depth_primary"] = np.abs(
                    _smooth_images(rng, batch, w, 1, hw)) + 0.1
                out["depth_wrist"] = np.abs(
                    _smooth_images(rng, batch, w, 1, hw)) + 0.1
            else:
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


def make_disk_calvin(root, n: int = 24, seed: int = 0) -> None:
    """Write a tiny CALVIN-shape episode directory under `root` (a
    'training' split dir): per-frame npz files + language annotations +
    episode index, matching data/calvin.py's on-disk contract."""
    import os

    import numpy as np

    os.makedirs(os.path.join(root, "lang_annotations"), exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        np.savez(
            os.path.join(root, f"episode_{i:07d}.npz"),
            rgb_static=rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (48, 48, 3), dtype=np.uint8),
            depth_static=rng.random((64, 64)).astype(np.float32),
            depth_gripper=rng.random((48, 48)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6),
                 [1.0 if i % 2 else -1.0]]).astype(np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14), [1.0]]).astype(np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
    np.save(os.path.join(root, "lang_annotations", "auto_lang_ann.npy"),
            {"info": {"indx": [(0, n - 1)]},
             "language": {"ann": ["do the thing"], "task": ["thing"]}})
    np.save(os.path.join(root, "ep_start_end_ids.npy"),
            np.array([[0, n - 1]]))


def add_accum_axis(batch: Dict, accum: int = 1) -> Dict:
    """Tile a micro-batch into the (accum, B, ...) layout of the train step."""
    return {k: np.broadcast_to(v[None], (accum,) + v.shape).copy()
            for k, v in batch.items()}
