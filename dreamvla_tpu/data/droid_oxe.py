"""DROID and Open-X-Embodiment (RLDS-converted) per-step datasets.

Capability parity with reference `BaseDroidDataset` / `DistDroidDataset`
(data_utils.py:1544-2029) and `BaseOXEDataset` / `DistOXEDataset`
(:3007-3583):

  * per-step directory trees — DROID: <root>/<name>/episodes/<id>/steps/<%04d>/
    {image_primary.jpg, image_wrist.jpg, other.h5}; OXE drops the
    `episodes/` level (:3346-3356);
  * `[episode_id, num_steps]` indices from assets/data_info/<info>.json;
    per-episode valid window starts = num_steps - window (:1619);
  * actions from `action_delta_wrist_pose` normalised by
    max_rel_pos=0.02 / max_rel_orn=0.05 x magic scaling, with the 10x
    exception list for furniture_bench / berkeley_autolab_ur5 /
    berkeley_fanuc_manipulation (:3372-3385);
  * robot_obs from gripper_pose6d + gripper_open_state (+ joint_position
    except for the UR5/fanuc/jaco sets, :3387-3396);
  * optional wrist-image double flip (:3361-3363);
  * language from the h5 unless the "full" (unlanguaged) DROID split
    (:1898-1904);
  * a concat-with-bisect mixture over multiple dataset names.
"""

from __future__ import annotations

import bisect
import json
import os
from itertools import accumulate
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.loader import DataInfo, PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.tokenizer import get_tokenizer

OXE_10X_SCALED = {
    "furniture_bench_dataset_converted_externally_to_rlds",
    "berkeley_autolab_ur5",
    "berkeley_fanuc_manipulation",
}
OXE_NO_JOINTS = {"berkeley_autolab_ur5", "berkeley_fanuc_manipulation",
                 "jaco_play"}

# the reference's OXE mixture (data_utils.py:3508-3525)
OXE_DATASET_NAMES = (
    "berkeley_autolab_ur5",
    "jaco_play",
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds",
    "viola",
    "stanford_hydra_dataset_converted_externally_to_rlds",
    "berkeley_fanuc_manipulation",
    "austin_buds_dataset_converted_externally_to_rlds",
    "utaustin_mutex",
    "taco_play",
    "austin_sailor_dataset_converted_externally_to_rlds",
    "austin_sirius_dataset_converted_externally_to_rlds",
    "furniture_bench_dataset_converted_externally_to_rlds",
)


class PerStepDataset:
    """Shared episodes/<id>/steps/<%04d> reader for DROID + OXE."""

    def __init__(self, root: str, dataset_name: str, dataset_info: str,
                 data_info_dir: str = "assets/data_info",
                 window_size: int = 10, act_step: int = 3,
                 pred_num: int = 1,
                 layout: str = "droid",  # droid | oxe
                 primary_mode: str = "image_primary",
                 max_rel_pos: float = 0.02, max_rel_orn: float = 0.05,
                 magic_scaling_factor_pos: float = 1.0,
                 magic_scaling_factor_orn: float = 1.0,
                 flip_wrist: bool = False, small_size: int = 0):
        self.dataset_name = dataset_name
        self.dataset_path = os.path.join(root, dataset_name)
        self.layout = layout
        self.primary_mode = primary_mode
        self.window = window_size + act_step - 1 + pred_num - 1
        self.max_rel_pos, self.max_rel_orn = max_rel_pos, max_rel_orn
        self.magic_pos, self.magic_orn = (magic_scaling_factor_pos,
                                          magic_scaling_factor_orn)
        self.flip_wrist = flip_wrist
        self.unlanguaged = "full" in dataset_info
        with open(os.path.join(data_info_dir, f"{dataset_info}.json")) as f:
            info = json.load(f)
        self.episode_list = [e for e, _ in info]
        # valid window starts per episode (reference :1619)
        self.starts_per_episode = [max(int(n) - self.window, 0)
                                   for _, n in info]
        self.cum = list(accumulate(self.starts_per_episode))
        self.length = small_size or (self.cum[-1] if self.cum else 0)

    def __len__(self) -> int:
        return self.length

    def _step_dir(self, episode_id: str, step: int) -> str:
        mid = "episodes/" if self.layout == "droid" else ""
        return f"{self.dataset_path}/{mid}{episode_id}/steps/{step:04d}"

    def _scale_action(self, action: np.ndarray) -> np.ndarray:
        action = action.astype(np.float32).copy()
        if self.dataset_name in OXE_10X_SCALED:
            action[:3] /= self.max_rel_pos * 10.0
            action[3:6] /= self.max_rel_orn * 10.0
        else:
            action[:3] /= self.max_rel_pos * self.magic_pos
            action[3:6] /= self.max_rel_orn * self.magic_orn
        return action

    def _load_step(self, episode_id: str, step: int) -> Dict[str, np.ndarray]:
        import h5py

        d = self._step_dir(episode_id, step)
        out: Dict[str, np.ndarray] = {}
        out["rgb_static"] = np.asarray(
            Image.open(f"{d}/{self.primary_mode}.jpg").convert("RGB"), np.uint8)
        wrist = np.asarray(
            Image.open(f"{d}/image_wrist.jpg").convert("RGB"), np.uint8)
        if self.flip_wrist:
            wrist = wrist[::-1, ::-1]
        out["rgb_gripper"] = np.ascontiguousarray(wrist)
        with h5py.File(f"{d}/other.h5", "r") as h5:
            out["rel_actions"] = self._scale_action(
                h5["action_delta_wrist_pose"][()])
            obs = np.zeros(15, np.float32)
            obs[:6] = h5["observation"]["gripper_pose6d"][()]
            state = np.asarray(h5["observation"]["gripper_open_state"][()])
            obs[-1] = state.reshape(-1)[0]
            if self.dataset_name not in OXE_NO_JOINTS:
                try:
                    obs[7:14] = h5["observation"]["joint_position"][()]
                except KeyError:
                    pass
            out["robot_obs"] = obs
            if self.unlanguaged:
                out["lang"] = "No language instruction."
            else:
                out["lang"] = h5["language_instruction"][()].decode("utf-8")
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        ep = bisect.bisect_right(self.cum, idx)
        start = idx - (self.cum[ep - 1] if ep else 0)
        episode_id = self.episode_list[ep]
        steps = [self._load_step(episode_id, s)
                 for s in range(start, start + self.window)]
        keys = [k for k in steps[0] if k != "lang"]
        sample = {k: np.stack([s[k] for s in steps]) for k in keys}
        sample["lang"] = steps[0]["lang"]
        return sample


class MixtureDataset:
    """Concat of per-step datasets with bisect routing (DistDroid/DistOXE)."""

    def __init__(self, datasets: Sequence[PerStepDataset]):
        self.datasets = list(datasets)
        self.cum = list(accumulate(len(d) for d in self.datasets))

    def __len__(self) -> int:
        return self.cum[-1] if self.cum else 0

    def __getitem__(self, idx: int):
        d = bisect.bisect_right(self.cum, idx)
        local = idx - (self.cum[d - 1] if d else 0)
        return self.datasets[d][local]


def get_droid_dataset(root: str, dataset_names: Sequence[str],
                      dataset_info: str = "droid_success", tokenizer=None,
                      batch_size: int = 8, window_size: int = 10,
                      act_step: int = 3, rank: int = 0, world_size: int = 1,
                      seed: int = 42, num_workers: int = 8,
                      data_info_dir: str = "assets/data_info",
                      **kwargs) -> DataInfo:
    ds = MixtureDataset([
        PerStepDataset(root, name, dataset_info, data_info_dir=data_info_dir,
                       window_size=window_size, act_step=act_step,
                       layout="droid", **kwargs)
        for name in dataset_names])
    sampler = ShardedSampler(len(ds), batch_size, rank=rank,
                             world_size=world_size, seed=seed)
    collate = WindowCollator(tokenizer or get_tokenizer(), window_size, act_step)
    return DataInfo(PrefetchLoader(ds, sampler, collate, num_workers),
                    sampler, ds)


def get_real_dataset(root: str, dataset_names: Sequence[str],
                     dataset_info: str, **kwargs) -> DataInfo:
    """Real-robot finetuning data (the reference's `finetune_type=real` path
    references an undefined DiskRealDataset, data_utils.py:2948 — a known
    defect; real-robot dumps use the DROID per-step layout, so this is the
    working equivalent)."""
    return get_droid_dataset(root, dataset_names, dataset_info, **kwargs)


def get_oxe_dataset(root: str, dataset_names: Sequence[str], tokenizer=None,
                    batch_size: int = 8, window_size: int = 10,
                    act_step: int = 3, rank: int = 0, world_size: int = 1,
                    seed: int = 42, num_workers: int = 8,
                    data_info_dir: str = "assets/data_info",
                    flip_wrist_for: Sequence[str] = (), **kwargs) -> DataInfo:
    ds = MixtureDataset([
        PerStepDataset(root, name, name, data_info_dir=data_info_dir,
                       window_size=window_size, act_step=act_step,
                       layout="oxe", flip_wrist=(name in flip_wrist_for),
                       **kwargs)
        for name in dataset_names])
    sampler = ShardedSampler(len(ds), batch_size, rank=rank,
                             world_size=world_size, seed=seed)
    collate = WindowCollator(tokenizer or get_tokenizer(), window_size, act_step)
    return DataInfo(PrefetchLoader(ds, sampler, collate, num_workers),
                    sampler, ds)
