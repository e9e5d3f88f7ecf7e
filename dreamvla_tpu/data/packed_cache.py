"""Packed frame-record cache: sequential-read CALVIN data at train speed.

The reference feeds training from one zip-compressed npz PER FRAME, hiding
the decode cost behind a 16-thread pool per dataloader worker
(reference utils/data_utils.py:1070-1072) — a design that needs many host
cores per GPU. On TPU hosts (often few cores per chip) the per-frame
decode is the bottleneck: the per-frame npz path measures ~9-11 samples/s
on a 1-core host while the fused bs-8 train step consumes ~19.7 samples/s
(CAPABILITIES.md). This module removes the decode entirely:

  * `build_packed_cache` runs ONCE per dataset (like the reference's
    offline merge_sam_dino/merge_track packing passes): every frame is
    CLIP-preprocessed (bicubic resize + center crop, stored as uint8),
    depth nearest-resized, optional DINO/SAM features (float16) and
    CoTracker labels folded in, and the fixed-stride records are written
    to a few large shard files in frame order.
  * `PackedCalvinDataset` mmaps the shards; loading a window is ONE
    strided copy per field out of the page cache — no zip walk, no
    inflate, no PIL. Image normalisation ((x/255 - mean)/std) moves
    ON-DEVICE (`parallel.train_step.decode_packed_batch`), where it is a
    trivial fused VPU op, so the host ships uint8.

Windows are contiguous frame-id ranges (data_utils.py:459-461), and
shards split only at episode-range discontinuities or the shard-size
boundary, so a window touches at most two shards.

Numerics contract: the images a model sees are bit-identical to the
per-frame path — the stored uint8 crop is exactly the PIL intermediate
inside `clip_image_transform`, and the on-device normalise applies the
same f32 constants (tests/test_packed_cache.py asserts batch equality).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dreamvla_tpu.data.calvin import FRAME_KEYS, CalvinDataset
from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.loader import DataInfo, PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.tokenizer import get_tokenizer

INDEX_NAME = "packed_index.json"

# field name -> (dtype, shape); images/depth stored at the model's input
# resolution, features at the extractor resolutions (SURVEY §2.4)
_BASE_FIELDS = (
    ("rgb_static", "uint8", (224, 224, 3)),
    ("rgb_gripper", "uint8", (224, 224, 3)),
    ("depth_static", "float32", (224, 224)),
    ("depth_gripper", "float32", (224, 224)),
    ("rel_actions", "float32", (7,)),
    ("robot_obs", "float32", (15,)),
)
_FEATURE_FIELDS = {
    "dino_static": ("float16", (256, 768)),
    "dino_gripper": ("float16", (256, 768)),
    "sam_static": ("float16", (256, 256)),
    "sam_gripper": ("float16", (256, 256)),
    "tracks_static": ("float32", (784, 2)),
    "track_vis_static": ("uint8", (784,)),
    "tracks_gripper": ("float32", (784, 2)),
    "track_vis_gripper": ("uint8", (784,)),
}


def _preprocess_rgb_u8(frame: np.ndarray, size: int) -> np.ndarray:
    """The PIL stage of `clip_image_transform`, stopping BEFORE the float
    conversion: bicubic shorter-side resize + center crop, uint8 HWC."""
    from PIL import Image

    img = Image.fromarray(frame)
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)


def _resize_depth(frame: np.ndarray, size: int) -> np.ndarray:
    """The nearest resample of `depth_to_tensor`, per frame."""
    h, w = frame.shape
    yy = (np.arange(size) * h // size).clip(0, h - 1)
    xx = (np.arange(size) * w // size).clip(0, w - 1)
    return frame[yy[:, None], xx[None, :]].astype(np.float32)


class _RecordLayout:
    def __init__(self, fields: Sequence[Tuple[str, str, Tuple[int, ...]]]):
        self.fields: List[Tuple[str, str, Tuple[int, ...]]] = [
            (n, d, tuple(s)) for n, d, s in fields]
        self.offsets: Dict[str, int] = {}
        off = 0
        for name, dtype, shape in self.fields:
            self.offsets[name] = off
            off += int(np.dtype(dtype).itemsize * np.prod(shape, dtype=int))
        self.record_bytes = off

    def to_json(self) -> List[List]:
        return [[n, d, list(s)] for n, d, s in self.fields]


def build_packed_cache(
    split_dir: str,
    out_dir: str,
    image_size: int = 224,
    frames_per_shard: int = 4096,
    dino_features_path: Optional[str] = None,
    sam_features_path: Optional[str] = None,
    track_label_path: Optional[str] = None,
    limit_frames: Optional[int] = None,
    progress_every: int = 2000,
) -> dict:
    """Pack one CALVIN split (training/ or validation/) into shard files.

    Returns the written index dict. Feature/track trees follow the same
    layouts `CalvinDataset` reads (reference data_utils.py:1033-1037,
    cotrack_extractor.py:309).
    """
    split = Path(split_dir)
    ds = CalvinDataset(str(split), key="vis", window_size=1, act_step=1,
                       pred_num=1,
                       load_dino_features=dino_features_path is not None,
                       dino_features_path=dino_features_path,
                       load_sam_features=sam_features_path is not None,
                       sam_features_path=sam_features_path,
                       load_track_labels=track_label_path is not None,
                       track_label_path=track_label_path)

    ranges = np.asarray(ds._ep_ranges(), np.int64)
    ids: List[int] = []
    for start, end in ranges:
        ids.extend(range(int(start), int(end) + 1))
    ids = sorted(set(ids))
    if limit_frames is not None:
        ids = ids[:limit_frames]

    fields = list(_BASE_FIELDS)
    if image_size != 224:
        fields = [(n, d, ((image_size, image_size, 3) if n.startswith("rgb")
                          else (image_size, image_size) if n.startswith("depth")
                          else s))
                  for n, d, s in fields]
    if dino_features_path is not None:
        fields += [("dino_static", *_FEATURE_FIELDS["dino_static"]),
                   ("dino_gripper", *_FEATURE_FIELDS["dino_gripper"])]
    if sam_features_path is not None:
        fields += [("sam_static", *_FEATURE_FIELDS["sam_static"]),
                   ("sam_gripper", *_FEATURE_FIELDS["sam_gripper"])]
    if track_label_path is not None:
        fields += [(k, *_FEATURE_FIELDS[k])
                   for k in ("tracks_static", "track_vis_static",
                             "tracks_gripper", "track_vis_gripper")]
    layout = _RecordLayout(fields)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    shards: List[dict] = []
    shard_f = None
    shard_start = shard_count = 0

    def close_shard():
        nonlocal shard_f, shard_count
        if shard_f is not None:
            shard_f.flush()
            os.fsync(shard_f.fileno())
            shard_f.close()
            shards[-1]["count"] = shard_count
            shard_f = None
            shard_count = 0

    prev_id = None
    for n_done, fid in enumerate(ids):
        new_shard = (shard_f is None or shard_count >= frames_per_shard
                     or (prev_id is not None and fid != prev_id + 1))
        if new_shard:
            close_shard()
            name = f"shard_{len(shards):05d}.bin"
            shards.append({"file": name, "start": int(fid), "count": 0})
            shard_f = open(out / name, "wb")
            shard_start, shard_count = fid, 0
        prev_id = fid

        frame = ds._load_frame(fid)
        rec = bytearray(layout.record_bytes)
        for name, dtype, shape in layout.fields:
            if name == "rgb_static":
                arr = _preprocess_rgb_u8(frame["rgb_static"], image_size)
            elif name == "rgb_gripper":
                arr = _preprocess_rgb_u8(frame["rgb_gripper"], image_size)
            elif name == "depth_static":
                arr = _resize_depth(frame["depth_static"], image_size)
            elif name == "depth_gripper":
                arr = _resize_depth(frame["depth_gripper"], image_size)
            elif name in ("rel_actions", "robot_obs"):
                arr = frame[name]
            elif name.startswith("dino_"):
                cam = "rgb_static" if name.endswith("static") else "rgb_gripper"
                arr = ds._load_pt_feature(dino_features_path, fid, cam)
            elif name.startswith("sam_"):
                cam = "rgb_static" if name.endswith("static") else "rgb_gripper"
                # stored transposed on disk (data_utils.py:1131); pack the
                # consumption orientation so reads are copy-only
                arr = ds._load_pt_feature(sam_features_path, fid, cam).T
            elif name.startswith("tracks_"):
                cam = name.split("_")[-1]
                arr = ds._load_track(fid, cam)["tracks"]
            elif name.startswith("track_vis_"):
                cam = name.split("_")[-1]
                arr = ds._load_track(fid, cam)["visibility"]
            else:  # pragma: no cover - layout and loop enumerate same names
                raise KeyError(name)
            a = np.ascontiguousarray(arr, dtype=np.dtype(dtype)).reshape(shape)
            off = layout.offsets[name]
            rec[off:off + a.nbytes] = a.tobytes()
        shard_f.write(rec)
        shard_count += 1
        if progress_every and (n_done + 1) % progress_every == 0:
            print(f"[pack] {n_done + 1}/{len(ids)} frames", flush=True)
    close_shard()

    index = {
        "version": 1,
        "image_size": image_size,
        "record_bytes": layout.record_bytes,
        "fields": layout.to_json(),
        "shards": shards,
        "num_frames": len(ids),
        "source_split": str(split),
    }
    with open(out / INDEX_NAME, "w") as f:
        json.dump(index, f)
    return index


class _PackedReader:
    """mmap-backed random access to packed frame records."""

    def __init__(self, packed_dir: str):
        self.dir = Path(packed_dir)
        with open(self.dir / INDEX_NAME) as f:
            self.index = json.load(f)
        self.layout = _RecordLayout(
            [(n, d, tuple(s)) for n, d, s in self.index["fields"]])
        # shard lookup table sorted by start id
        self.starts = np.array([s["start"] for s in self.index["shards"]],
                               np.int64)
        self.counts = np.array([s["count"] for s in self.index["shards"]],
                               np.int64)
        self._maps: Dict[int, np.memmap] = {}

    @property
    def field_names(self) -> List[str]:
        return [n for n, _, _ in self.layout.fields]

    def _mmap(self, shard_i: int) -> np.memmap:
        mm = self._maps.get(shard_i)
        if mm is None:
            path = self.dir / self.index["shards"][shard_i]["file"]
            mm = np.memmap(path, dtype=np.uint8, mode="r")
            self._maps[shard_i] = mm
        return mm

    def _locate(self, fid: int) -> Tuple[int, int]:
        i = int(np.searchsorted(self.starts, fid, side="right")) - 1
        if i < 0 or fid >= self.starts[i] + self.counts[i]:
            raise KeyError(f"frame {fid} not in packed cache")
        return i, fid - int(self.starts[i])

    def read_window(self, start_id: int, n: int,
                    fields: Optional[Sequence[str]] = None
                    ) -> Dict[str, np.ndarray]:
        """Read frames [start_id, start_id+n) as stacked contiguous arrays."""
        names = list(fields) if fields is not None else self.field_names
        out = {name: [] for name in names}
        fid = start_id
        while fid < start_id + n:
            shard_i, row = self._locate(fid)
            take = min(start_id + n - fid,
                       int(self.counts[shard_i]) - row)
            mm = self._mmap(shard_i)
            R = self.layout.record_bytes
            base = row * R
            for name in names:
                dtype, shape = next((d, s) for nm, d, s in self.layout.fields
                                    if nm == name)
                block = np.ndarray(
                    buffer=mm, dtype=np.dtype(dtype),
                    offset=base + self.layout.offsets[name],
                    shape=(take,) + shape,
                    strides=(R,) + tuple(
                        np.empty(shape, np.dtype(dtype)).strides))
                out[name].append(block)
            fid += take
        return {k: (np.ascontiguousarray(v[0]) if len(v) == 1
                    else np.concatenate(v, axis=0)) for k, v in out.items()}


class PackedCalvinDataset(CalvinDataset):
    """CalvinDataset whose frames come from a packed cache.

    Indices (lang/vis/except_lang windows, instructions) still come from
    the original split dir; only per-frame payload reads are redirected.
    Samples carry `_preprocessed=True`: images are the uint8 CLIP crop and
    depth is already at model resolution, so `WindowCollator` skips the
    PIL stage and (in 'u8' image mode) ships uint8 for on-device decode.
    """

    def __init__(self, root: str, packed_dir: str, **kwargs):
        self.reader = _PackedReader(packed_dir)
        names = set(self.reader.field_names)
        kwargs.setdefault("load_dino_features", "dino_static" in names)
        kwargs.setdefault("load_sam_features", "sam_static" in names)
        kwargs.setdefault("load_track_labels", "tracks_static" in names)
        super().__init__(root, **kwargs)

    def _getitem_impl(self, idx: int) -> Dict[str, np.ndarray]:
        start = int(self.episode_lookup[idx])
        rec = self.reader.read_window(start, self.window)
        sample: Dict[str, np.ndarray] = {k: rec[k] for k in FRAME_KEYS
                                         if k in rec}
        if self.load_dino and "dino_static" in rec:
            sample["dino_primary"] = rec["dino_static"]
            sample["dino_wrist"] = rec["dino_gripper"]
        if self.load_sam and "sam_static" in rec:
            sample["sam_primary"] = rec["sam_static"]
            sample["sam_wrist"] = rec["sam_gripper"]
        if self.load_tracks and "tracks_static" in rec:
            sample["tracks"] = rec["tracks_static"]
            sample["track_vis"] = rec["track_vis_static"]
            sample["tracks_gripper"] = rec["tracks_gripper"]
            sample["track_vis_gripper"] = rec["track_vis_gripper"]
        lang = ""
        if self.lang_lookup is not None:
            lang = self.lang_ann[self.lang_lookup[idx]]
            if self.text_aug:
                task = self.lang_task[self.lang_lookup[idx]]
                pool = self.enrich_lang.get(task)
                if pool:
                    lang = pool[int(self.rng.integers(len(pool)))]
        sample["lang"] = lang
        sample["_preprocessed"] = True
        return sample


def get_packed_calvin_dataset(
    args_root: str, packed_dir: str, tokenizer=None, batch_size: int = 2,
    window_size: int = 13, act_step: int = 3, pred_num: int = 1,
    key: str = "lang", rank: int = 0, world_size: int = 1, seed: int = 42,
    num_workers: int = 8, gripper_width: bool = False,
    validation: bool = False, image_size: int = 224,
    image_mode: str = "u8", **dataset_kwargs,
) -> DataInfo:
    """`get_calvin_dataset` over a packed cache. image_mode='u8' ships
    uint8 images for on-device normalisation (train path);
    image_mode='f32' normalises on host (drop-in for eval tooling)."""
    for k in ("load_dino_features", "dino_features_path",
              "load_sam_features", "sam_features_path",
              "load_track_labels", "track_label_path", "merge_data"):
        dataset_kwargs.pop(k, None)  # payload source is the packed cache
    split = "validation" if validation else "training"
    ds = PackedCalvinDataset(os.path.join(args_root, split), packed_dir,
                             key=key, window_size=window_size,
                             act_step=act_step, pred_num=pred_num, seed=seed,
                             **dataset_kwargs)
    sampler = ShardedSampler(len(ds), batch_size, rank=rank,
                             world_size=world_size, seed=seed)
    collate = WindowCollator(tokenizer or get_tokenizer(), window_size,
                             act_step, pred_num, image_size=image_size,
                             gripper_width=gripper_width,
                             image_mode=image_mode)
    loader = PrefetchLoader(ds, sampler, collate, num_workers=num_workers)
    return DataInfo(dataloader=loader, sampler=sampler, dataset=ds)
