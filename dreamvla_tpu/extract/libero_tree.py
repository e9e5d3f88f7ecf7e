"""Per-step-tree feature extraction + repair (LIBERO/DROID layouts).

Capability parity with reference `data_process/{sam,dino}_extractor_libero.py`
(walk episodes/<id>/steps/<%04d>/image_{primary,wrist}.jpg, save features in
a sibling tree with the same layout) and `data_process/rebuild_bad_npz.py`
(repair pass over a bad-file list with atomic writes).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterable, List, Sequence, Tuple

import numpy as np
from PIL import Image

from dreamvla_tpu.extract.pipeline import atomic_save_npy

IMAGE_KEYS = ("image_primary", "image_wrist")


def iter_step_images(dataset_path: str, image_key: str,
                     flip_primary: bool = True) -> Iterable[Tuple[str, str]]:
    """Yields (step_dir_relpath, jpg_path) over episodes/*/steps/*."""
    eps = Path(dataset_path) / "episodes"
    for ep in sorted(p for p in eps.iterdir() if p.is_dir()):
        for step in sorted((ep / "steps").iterdir()):
            jpg = step / f"{image_key}.jpg"
            if jpg.exists():
                rel = f"{ep.name}/steps/{step.name}"
                yield rel, str(jpg)


def extract_feature_tree(dataset_path: str, extractor: Callable,
                         feature_name: str, image_key: str = "image_primary",
                         flip_primary: bool = True, batch_size: int = 32,
                         skip_existing: bool = True,
                         process_index: int = 0, process_count: int = 1) -> int:
    """Run `extractor` over every step image; save
    <dataset>/<feature_name>/<episode>/steps/<step>/<image_key>.npy.
    Work stripes over processes; existing outputs are skipped (reference
    extractors' resume behaviour)."""
    out_root = Path(dataset_path) / feature_name
    items = [(rel, jpg) for i, (rel, jpg)
             in enumerate(iter_step_images(dataset_path, image_key))
             if i % process_count == process_index]
    todo = []
    for rel, jpg in items:
        out = out_root / rel / f"{image_key}.npy"
        if skip_existing and out.exists():
            continue
        todo.append((rel, jpg, out))
    written = 0
    for s in range(0, len(todo), batch_size):
        chunk = todo[s:s + batch_size]
        frames = []
        for rel, jpg, _ in chunk:
            img = np.asarray(Image.open(jpg).convert("RGB"), np.uint8)
            if flip_primary and image_key == "image_primary":
                img = np.ascontiguousarray(img[::-1])
            frames.append(img)
        feats = extractor(np.stack(frames))
        for (rel, _, out), feat in zip(chunk, feats):
            out.parent.mkdir(parents=True, exist_ok=True)
            atomic_save_npy(str(out), feat)
            written += 1
    return written


def find_bad_track_files(track_root: str) -> List[str]:
    """Scan a cotracker_traj tree for unreadable/corrupt npz files
    (reference's bad-list input to rebuild_bad_npz)."""
    bad = []
    for path in Path(track_root).rglob("*.npz"):
        try:
            with np.load(path) as z:
                _ = z["tracks"].shape, z["visibility"].shape
        except Exception:
            bad.append(str(path))
    return bad


def rebuild_track_files(bad_paths: Sequence[str], tracker: Callable,
                        grid: int = 28) -> int:
    """Regenerate corrupt track files with atomic replacement. `tracker`
    maps a (frames, grid) request to (tracks, visibility); the bundled
    CoTrackerExtractor zero-fills when no tracking model is plugged in
    (matching the reference's zero-filled tails)."""
    fixed = 0
    for path in bad_paths:
        tracks, vis = tracker(np.zeros((1, 224, 224, 3), np.uint8))
        tmp = path + ".tmp"
        np.savez(tmp, tracks=tracks[0], visibility=vis[0])
        src = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(src, path)
        fixed += 1
    return fixed
