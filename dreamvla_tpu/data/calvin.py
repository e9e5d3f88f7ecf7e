"""CALVIN disk dataset: per-frame npz episodes + windowed sampling.

Capability parity with reference `DiskCalvinDataset` (data_utils.py:944-1413)
and its index builders (:1165-1306):

  * per-frame files `episode_XXXXXXX.npz` with keys rgb_static (200x200x3),
    rgb_gripper (84x84x3), depth_static, depth_gripper, rel_actions (7),
    robot_obs (15), scene_obs;
  * three index keys: 'lang' (auto_lang_ann.npy windows + instruction),
    'vis' (all ep_start_end_ids windows), 'except_lang' (ranges without
    language, except_lang_idx.npy);
  * windows of min_window = window_size + act_step - 1 + pred_num - 1
    frames starting at each valid index (data_utils.py:459-461);
  * optional per-frame DINO/SAM `.pt` features and CoTracker `.npz` track
    labels from sibling trees, or everything pre-merged into the episode
    npz (`merge_data`);
  * short tails pad by frame repetition; relative actions zero-pad all but
    the gripper dim (data_utils.py:835-853).

Design delta: the dataset returns plain numpy stacks; all tensor work
(normalisation, aug, chunking) happens in the collator / on device.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.loader import DataInfo, PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.tokenizer import get_tokenizer

FRAME_KEYS = ("rgb_static", "rgb_gripper", "depth_static", "depth_gripper",
              "rel_actions", "robot_obs")


def _naming_pattern(root: Path, suffix: str = ".npz"):
    for entry in os.scandir(root):
        if entry.name.endswith(suffix) and re.search(r"\d+", entry.name):
            stem = re.split(r"\d+", Path(entry.name).stem)[0]
            digits = len(re.findall(r"\d+", Path(entry.name).stem)[0])
            return stem, digits
    raise FileNotFoundError(f"no {suffix} episode files under {root}")


class CalvinDataset:
    def __init__(
        self,
        root: str,
        key: str = "lang",  # lang | vis | except_lang
        window_size: int = 13,
        act_step: int = 3,
        pred_num: int = 1,
        lang_folder: str = "lang_annotations",
        pretrain: bool = False,
        skip_frames: int = 1,
        load_dino_features: bool = False,
        dino_features_path: Optional[str] = None,
        load_sam_features: bool = False,
        sam_features_path: Optional[str] = None,
        load_track_labels: bool = False,
        track_label_path: Optional[str] = None,
        merge_data: bool = False,
        text_aug: bool = False,
        enrich_lang: Optional[Dict[str, List[str]]] = None,
        partial_data: bool = False,
        partial_ranges: Optional[List[List[int]]] = None,
        aux_lang_loss_window: int = 1,
        seed: int = 42,
    ):
        self.root = Path(root)
        self.key = key
        self.window = window_size + act_step - 1 + pred_num - 1
        self.lang_folder = lang_folder
        self.pretrain = pretrain
        self.skip_frames = skip_frames
        self.load_dino = load_dino_features
        self.dino_path = dino_features_path
        self.load_sam = load_sam_features
        self.sam_path = sam_features_path
        self.load_tracks = load_track_labels
        self.track_path = track_label_path
        self.merge_data = merge_data
        self.text_aug = text_aug
        self.enrich_lang = enrich_lang or {}
        # episode subset filter (reference --partial_data +
        # utils/partial_task_data.json, data_utils.py:1220-1224)
        self.partial_ranges = None
        if partial_data:
            if partial_ranges is None:
                import json as _json

                asset = (Path(__file__).resolve().parents[2] / "assets"
                         / "partial_task_data.json")
                with open(asset) as f:
                    partial_ranges = _json.load(f)
            self.partial_ranges = [list(r) for r in partial_ranges]
        self.aux_lang_loss_window = aux_lang_loss_window
        self.validation = "validation" in str(self.root)
        self.rng = np.random.default_rng(seed)

        self.stem, self.digits = _naming_pattern(self.root)
        if key == "lang":
            self._build_lang_index()
        elif key == "vis":
            self._build_vis_index(self._ep_ranges())
        elif key == "except_lang":
            self._build_vis_index(self._except_lang_ranges())
        else:
            raise ValueError(f"unknown dataset key {key!r}")

    # ------------------------------------------------------------- indices
    def _ep_ranges(self):
        return np.load(self.root / "ep_start_end_ids.npy")

    def _except_lang_ranges(self):
        return np.load(self.root / "except_lang_idx" / "except_lang_idx.npy")

    def _build_lang_index(self):
        ann = np.load(self.root / self.lang_folder / "auto_lang_ann.npy",
                      allow_pickle=True).item()
        self.lang_ann = ann["language"]["ann"]
        self.lang_task = ann["language"]["task"]
        lookup, lang_lookup = [], []
        for i, (start, end) in enumerate(ann["info"]["indx"]):
            if (self.partial_ranges is not None
                    and [int(start), int(end)] not in self.partial_ranges):
                continue
            if self.pretrain:
                start = max(start, end + 1 - self.window - self.aux_lang_loss_window)
            cnt = 0
            for idx in range(start, end + 1 - self.window):
                if cnt % self.skip_frames == 0:
                    lookup.append(idx)
                    lang_lookup.append(i)
                cnt += 1
        self.episode_lookup = np.asarray(lookup, np.int64)
        self.lang_lookup = lang_lookup

    def _build_vis_index(self, ranges):
        lookup = []
        for start, end in ranges:
            for idx in range(start, end + 1 - self.window):
                lookup.append(idx)
        self.episode_lookup = np.asarray(lookup, np.int64)
        self.lang_lookup = None

    # --------------------------------------------------------------- frames
    def _frame_path(self, file_idx: int) -> Path:
        return self.root / f"{self.stem}{file_idx:0{self.digits}d}.npz"

    def _load_frame(self, file_idx: int) -> Dict[str, np.ndarray]:
        with np.load(self._frame_path(file_idx), allow_pickle=True) as z:
            return {k: z[k] for k in z.files}

    def _load_pt_feature(self, base: str, file_idx: int, img_key: str) -> np.ndarray:
        import torch

        split = "validation" if self.validation else "training"
        t = torch.load(os.path.join(base, img_key, split, f"{file_idx}.pt"),
                       map_location="cpu")
        return t.to(torch.float32).numpy()

    def _load_track(self, file_idx: int, cam: str) -> Dict[str, np.ndarray]:
        split = "validation" if self.validation else "training"
        # reference layout: <save_path>/<image_key>/<split>/{idx}.npz
        # (cotrack_extractor.py:134, :309) — also what our extract CLI
        # writes; fall back to the flat {idx}_{cam}.npz layout.
        img_key = {"static": "rgb_static", "gripper": "rgb_gripper"}[cam]
        path = os.path.join(self.track_path, img_key, split,
                            f"{file_idx}.npz")
        if not os.path.exists(path):
            path = os.path.join(self.track_path, split,
                                f"{file_idx}_{cam}.npz")
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    def __len__(self) -> int:
        return len(self.episode_lookup)

    def _load_window_frames(self, start: int) -> Dict[str, np.ndarray]:
        """Load the window's per-frame npz files. Uses the native GIL-free
        batch reader (native/frameloader.cpp) when built; numpy otherwise."""
        from dreamvla_tpu.data import native_loader

        keys = FRAME_KEYS if not self.merge_data else None
        if keys is not None and native_loader.available():
            paths = [str(self._frame_path(start + o))
                     for o in range(self.window)]
            tasks = [(p, k) for p in paths for k in keys]
            arrays = native_loader.read_members_batch(tasks, n_threads=8)
            if all(a is not None for a in arrays):
                nk = len(keys)
                return {k: np.stack([arrays[f * nk + j]
                                     for f in range(self.window)])
                        for j, k in enumerate(keys)}
        frames = [self._load_frame(start + o) for o in range(self.window)]
        all_keys = frames[0].keys() if self.merge_data else FRAME_KEYS
        return {k: np.stack([f[k] for f in frames]) for k in all_keys}

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # corrupt-sample fallback: retry neighbouring windows (reference
        # wraps episode loads in try/except, data_utils.py:1180-1214)
        for attempt in range(3):
            try:
                return self._getitem_impl((idx + attempt) % len(self))
            except Exception as e:  # zip/pickle/IO corruption comes in many shapes
                if attempt == 2:
                    raise
                print(f"[calvin] sample {idx + attempt} unreadable ({e}); "
                      "retrying neighbour", flush=True)

    def _getitem_impl(self, idx: int) -> Dict[str, np.ndarray]:
        start = int(self.episode_lookup[idx])
        loaded = self._load_window_frames(start)
        sample: Dict[str, np.ndarray] = {k: loaded[k] for k in FRAME_KEYS}
        if self.merge_data:
            for src, dst in (("dino_static", "dino_primary"),
                             ("dino_gripper", "dino_wrist"),
                             ("sam_static", "sam_primary"),
                             ("sam_gripper", "sam_wrist")):
                if src in loaded:
                    sample[dst] = loaded[src]
            if "traj_static" in loaded:
                sample["tracks"] = loaded["traj_static"]
                sample["tracks_gripper"] = loaded["traj_gripper"]
        else:
            ids = range(start, start + self.window)
            if self.load_dino:
                sample["dino_primary"] = np.stack(
                    [self._load_pt_feature(self.dino_path, i, "rgb_static") for i in ids])
                sample["dino_wrist"] = np.stack(
                    [self._load_pt_feature(self.dino_path, i, "rgb_gripper") for i in ids])
            if self.load_sam:
                # SAM features are stored transposed (data_utils.py:1131)
                sample["sam_primary"] = np.stack(
                    [self._load_pt_feature(self.sam_path, i, "rgb_static").T for i in ids])
                sample["sam_wrist"] = np.stack(
                    [self._load_pt_feature(self.sam_path, i, "rgb_gripper").T for i in ids])
            if self.load_tracks:
                tr = [self._load_track(i, "static") for i in ids]
                trg = [self._load_track(i, "gripper") for i in ids]
                sample["tracks"] = np.stack([t["tracks"] for t in tr])
                sample["track_vis"] = np.stack([t["visibility"] for t in tr])
                sample["tracks_gripper"] = np.stack([t["tracks"] for t in trg])
                sample["track_vis_gripper"] = np.stack([t["visibility"] for t in trg])

        lang = ""
        if self.lang_lookup is not None:
            lang = self.lang_ann[self.lang_lookup[idx]]
            if self.text_aug:
                task = self.lang_task[self.lang_lookup[idx]]
                pool = self.enrich_lang.get(task)
                if pool:
                    lang = pool[int(self.rng.integers(len(pool)))]
        sample["lang"] = lang
        return sample


def get_calvin_dataset(args_root: str, tokenizer=None, batch_size: int = 2,
                       window_size: int = 13, act_step: int = 3,
                       pred_num: int = 1, key: str = "lang",
                       rank: int = 0, world_size: int = 1, seed: int = 42,
                       num_workers: int = 8, gripper_width: bool = False,
                       validation: bool = False, image_size: int = 224,
                       **dataset_kwargs) -> DataInfo:
    """Assemble dataset + sharded sampler + prefetch loader
    (reference get_calvin_dataset, data_utils.py:1415-1543)."""
    split = "validation" if validation else "training"
    ds = CalvinDataset(os.path.join(args_root, split), key=key,
                       window_size=window_size, act_step=act_step,
                       pred_num=pred_num, seed=seed, **dataset_kwargs)
    sampler = ShardedSampler(len(ds), batch_size, rank=rank,
                             world_size=world_size, seed=seed)
    collate = WindowCollator(tokenizer or get_tokenizer(), window_size,
                             act_step, pred_num, image_size=image_size,
                             gripper_width=gripper_width)
    loader = PrefetchLoader(ds, sampler, collate, num_workers=num_workers)
    return DataInfo(dataloader=loader, sampler=sampler, dataset=ds)
