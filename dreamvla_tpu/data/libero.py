"""LIBERO per-step-directory dataset.

Capability parity with reference `DiskLiberoDataset`
(data_utils.py:2094-2798) over the tree produced by
`utils/convert_libero_per_step.py`:

  <root>/<name>/episodes/<episode_id>/steps/<%04d>/
      image_primary.jpg  image_wrist.jpg  other.h5
plus sibling feature trees dinov2_feats/ sam_feats/ cotracker_traj/ with the
same episode/step layout (data_utils.py:2517-2530).

Semantics preserved: primary image is vertically flipped (:2596); robot_obs
is [tcp_pose(6 — pos + xyz euler), 0, proprio(7), gripper_state] with the
last dim carrying the gripper open/close (:2626-2649); SAM features are
stored transposed (:2540-2542); windows shorter than the window length pad
by repetition with zero-padded relative actions (gripper dim repeated).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.loader import DataInfo, PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.tokenizer import get_tokenizer


def _pad_tail(stack: np.ndarray, want: int, zero_actions: bool = False) -> np.ndarray:
    """Repeat the last step (or zero-pad actions except gripper) to length."""
    have = len(stack)
    if have >= want:
        return stack[:want]
    reps = np.repeat(stack[-1:], want - have, axis=0)
    if zero_actions:
        reps = reps.copy()
        reps[..., :-1] = 0.0
    return np.concatenate([stack, reps], axis=0)


class LiberoDataset:
    def __init__(
        self,
        root: str,
        name: str,
        data_info_dir: str = "data_info",
        window_size: int = 10,
        act_step: int = 3,
        pred_num: int = 1,
        gripper_width: bool = False,
        primary_mode: str = "image_primary",
        load_dino_features: bool = False,
        load_sam_features: bool = False,
        load_track_labels: bool = False,
        small_size: int = 0,
    ):
        self.dataset_path = os.path.join(root, name)
        self.window = window_size + act_step - 1 + pred_num - 1
        self.gripper_width = gripper_width
        self.primary_mode = primary_mode
        self.load_dino = load_dino_features
        self.load_sam = load_sam_features
        self.load_tracks = load_track_labels
        index_file = os.path.join(data_info_dir, f"{name}.json")
        with open(index_file) as f:
            index: List[Tuple[str, int]] = json.load(f)
        self.episode_list = [e for e, _ in index]
        self.episode_steps = [int(n) for _, n in index]
        # one window start per step (short windows pad by repetition)
        self.lookup: List[Tuple[int, int]] = []
        for ep, steps in enumerate(self.episode_steps):
            for start in range(steps):
                self.lookup.append((ep, start))
        if small_size:
            self.lookup = self.lookup[:small_size]

    def __len__(self) -> int:
        return len(self.lookup)

    # ------------------------------------------------------------- loaders
    def _step_dir(self, episode_id: str, step: int) -> str:
        return f"{self.dataset_path}/episodes/{episode_id}/steps/{step:04d}"

    def _load_step(self, episode_id: str, step: int) -> Dict[str, np.ndarray]:
        import h5py

        d = self._step_dir(episode_id, step)
        out: Dict[str, np.ndarray] = {}
        img = np.asarray(Image.open(
            f"{d}/{self.primary_mode}.jpg").convert("RGB"))[::-1]
        out["rgb_static"] = np.ascontiguousarray(img, np.uint8)
        out["rgb_gripper"] = np.asarray(Image.open(
            f"{d}/image_wrist.jpg").convert("RGB"), np.uint8)
        with h5py.File(f"{d}/other.h5", "r") as h5:
            out["rel_actions"] = np.asarray(h5["action"][()], np.float32)
            obs = np.zeros(15, np.float32)
            obs[:6] = h5["observation"]["tcp_pose"][:6]
            obs[7:14] = h5["observation"]["proprio"][()]
            obs[-1] = h5["observation"]["gripper_state"][()]
            if self.gripper_width:
                obs[-2:] = h5["observation"]["gripper_position"][()]
            out["robot_obs"] = obs
            out["lang"] = h5["language_instruction"][()].decode("utf-8")
        step_id = f"{step:04d}"
        if self.load_dino:
            base = f"{self.dataset_path}/dinov2_feats/{episode_id}/steps/{step_id}"
            out["dino_primary"] = np.load(f"{base}/image_primary.npy")
            out["dino_wrist"] = np.load(f"{base}/image_wrist.npy")
        if self.load_sam:
            base = f"{self.dataset_path}/sam_feats/{episode_id}/steps/{step_id}"
            out["sam_primary"] = np.load(f"{base}/image_primary.npy").T
            out["sam_wrist"] = np.load(f"{base}/image_wrist.npy").T
        if self.load_tracks:
            base = f"{self.dataset_path}/cotracker_traj/{episode_id}/steps/{step_id}"
            with np.load(f"{base}/image_primary.npz") as z:
                out["tracks"], out["track_vis"] = z["tracks"], z["visibility"]
            with np.load(f"{base}/image_wrist.npz") as z:
                out["tracks_gripper"] = z["tracks"]
                out["track_vis_gripper"] = z["visibility"]
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ep, start = self.lookup[idx]
        episode_id = self.episode_list[ep]
        end = min(start + self.window, self.episode_steps[ep])
        steps = [self._load_step(episode_id, s) for s in range(start, end)]
        keys = [k for k in steps[0] if k != "lang"]
        sample = {k: np.stack([s[k] for s in steps]) for k in keys}
        for k in keys:
            sample[k] = _pad_tail(sample[k], self.window,
                                  zero_actions=(k == "rel_actions"))
        sample["lang"] = steps[0]["lang"]
        return sample


def get_libero_dataset(root: str, name: str = "libero_90_converted",
                       tokenizer=None, batch_size: int = 16,
                       window_size: int = 10, act_step: int = 3,
                       pred_num: int = 1, rank: int = 0, world_size: int = 1,
                       seed: int = 42, num_workers: int = 8,
                       gripper_width: bool = False, **dataset_kwargs) -> DataInfo:
    """Pretrain uses libero_90_converted; finetune passes the suite name
    (reference get_libero_pretrain/finetune_dataset, data_utils.py:2800-2938)."""
    ds = LiberoDataset(root, name, window_size=window_size, act_step=act_step,
                       pred_num=pred_num, gripper_width=gripper_width,
                       **dataset_kwargs)
    sampler = ShardedSampler(len(ds), batch_size, rank=rank,
                             world_size=world_size, seed=seed)
    collate = WindowCollator(tokenizer or get_tokenizer(), window_size,
                             act_step, pred_num, gripper_width=gripper_width)
    loader = PrefetchLoader(ds, sampler, collate, num_workers=num_workers)
    return DataInfo(dataloader=loader, sampler=sampler, dataset=ds)
