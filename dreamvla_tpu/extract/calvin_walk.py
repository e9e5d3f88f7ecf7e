"""CALVIN episode-tree walkers for the offline extraction pipeline.

Mirrors the reference extractor scripts' data walk + artifact layout so a
user of the reference can re-point the same directories here:

  * frames come from `<data_root>/<split>/episode_XXXXXXX.npz[<image_key>]`,
    restricted to the union of language-annotated ranges
    (`lang_annotations/auto_lang_ann.npy`) or the except-lang ranges
    (reference data_process/sam_extractor.py:43-77,
    cotrack_extractor.py:69-133);
  * SAM/DINO features are written as bf16 torch `.pt` per frame under
    `<save_path>/<image_key>/<split>/{idx}.pt` (sam_extractor.py:134,:191)
    — exactly what DiskCalvinDataset reads back;
  * CoTracker labels as `{idx}.npz` {tracks (G^2, 2) deltas, visibility}
    under `<save_path>/<image_key>/<split>/` with zero-filled tails
    (cotrack_extractor.py:309-330);
  * work stripes over processes like the reference's DistributedSampler
    sharding; existing outputs are skipped (resume behaviour).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from dreamvla_tpu.extract.pipeline import atomic_save_npy


def lang_episode_ranges(data_root: str, split: str = "training",
                        except_lang: bool = False
                        ) -> List[Tuple[int, int]]:
    """[(start, end)] inclusive episode ranges (reference
    cotrack_extractor.py:73-83)."""
    root = Path(data_root) / split
    if except_lang:
        idx = np.load(root / "except_lang_idx" / "except_lang_idx.npy")
        return [(int(a), int(b)) for a, b in idx.tolist()]
    ann = np.load(root / "lang_annotations" / "auto_lang_ann.npy",
                  allow_pickle=True).item()
    return [(int(a), int(b)) for a, b in ann["info"]["indx"]]


def calvin_frame_indices(data_root: str, split: str = "training",
                         except_lang: bool = False) -> List[int]:
    """Union of annotated frame ids (reference sam_extractor.py:58-62)."""
    ids = set()
    for a, b in lang_episode_ranges(data_root, split, except_lang):
        ids.update(range(a, b + 1))
    return sorted(ids)


def load_calvin_frame(data_root: str, split: str, idx: int,
                      image_key: str = "rgb_static", size: int = 224,
                      digits: int = 7) -> np.ndarray:
    """episode_XXXXXXX.npz[<image_key>] resized to (size, size) uint8
    (reference cotrack_extractor.py:36-40)."""
    from PIL import Image

    path = Path(data_root) / split / f"episode_{idx:0{digits}d}.npz"
    with np.load(path) as z:
        img = z[image_key]
    return np.asarray(Image.fromarray(img).resize((size, size)), np.uint8)


def _save_pt_bf16(path: str, arr: np.ndarray) -> None:
    """bf16 torch tensor artifact (reference sam_extractor.py:191) with an
    atomic replace."""
    import torch

    tmp = path + ".tmp"
    torch.save(torch.from_numpy(np.asarray(arr)).to(torch.bfloat16), tmp)
    os.replace(tmp, path)


def extract_calvin_features(data_root: str, extractor: Callable,
                            save_path: str, image_key: str = "rgb_static",
                            split: str = "training", batch_size: int = 32,
                            skip_existing: bool = True, size: int = 224,
                            except_lang: bool = False,
                            process_index: int = 0, process_count: int = 1,
                            save_format: str = "pt") -> int:
    """Run a batched feature extractor over every annotated frame; write
    per-frame artifacts under <save_path>/<image_key>/<split>/."""
    out_dir = Path(save_path) / image_key / split
    out_dir.mkdir(parents=True, exist_ok=True)
    ext = ".pt" if save_format == "pt" else ".npy"
    ids = [i for n, i in enumerate(
        calvin_frame_indices(data_root, split, except_lang))
        if n % process_count == process_index]
    if skip_existing:
        ids = [i for i in ids if not (out_dir / f"{i}{ext}").exists()]
    written = 0
    for s in range(0, len(ids), batch_size):
        chunk = ids[s:s + batch_size]
        frames = np.stack([load_calvin_frame(data_root, split, i, image_key,
                                             size) for i in chunk])
        feats = extractor(frames)
        for i, feat in zip(chunk, feats):
            path = str(out_dir / f"{i}{ext}")
            if save_format == "pt":
                _save_pt_bf16(path, feat)
            else:
                atomic_save_npy(path, np.asarray(feat))
            written += 1
    return written


def extract_calvin_tracks(data_root: str, track_fn: Callable,
                          save_path: str, image_key: str = "rgb_static",
                          split: str = "training", grid: int = 28,
                          frame_gap: int = 5, skip_existing: bool = True,
                          size: int = 224, except_lang: bool = False,
                          process_index: int = 0,
                          process_count: int = 1) -> int:
    """Per language episode: track the query grid between frame pairs and
    write `{idx}.npz` {tracks, visibility} per frame. Tail frames (no
    t+frame_gap partner) get zero tracks and all-ones visibility — the
    reference's exact tail artifact (cotrack_extractor.py:309-330).
    Episodes stripe over processes (the reference shards episodes, not
    frames)."""
    out_dir = Path(save_path) / image_key / split
    out_dir.mkdir(parents=True, exist_ok=True)
    ranges = [r for n, r in enumerate(
        lang_episode_ranges(data_root, split, except_lang))
        if n % process_count == process_index]
    written = 0
    for start, end in ranges:
        ids = list(range(start, end + 1))
        if skip_existing and all((out_dir / f"{i}.npz").exists()
                                 for i in ids):
            continue
        frames = np.stack([load_calvin_frame(data_root, split, i, image_key,
                                             size) for i in ids])
        tracks, vis = track_fn(frames, grid)
        n_lead = max(len(ids) - frame_gap, 0)
        for off, i in enumerate(ids):
            path = out_dir / f"{i}.npz"
            if skip_existing and path.exists():
                continue
            if off < n_lead:
                trk = tracks[off].astype(np.float32)
                vb = np.asarray(vis[off] > 0.5)
            else:  # tail: zero deltas, all-visible (reference convention)
                trk = np.zeros((grid * grid, 2), np.float32)
                vb = np.ones((grid * grid,), bool)
            tmp = str(path) + ".tmp"
            with open(tmp, "wb") as f:
                np.savez_compressed(f, tracks=trk, visibility=vb)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            written += 1
    return written
