"""Batched TPU feature-extraction pipeline (offline, before training).

Replaces the reference's per-episode torchrun extractor scripts
(`data_process/{sam,dino}_extractor*.py`): one jitted batched forward per
model, frames streamed through a thread pool, per-frame artifacts written
with the same shapes the training datasets consume:

  dino: (256, 768) f32/bf16 per frame   (dino_extractor.py:166-173)
  sam:  (256, 256) channel-major per frame (sam_extractor.py:181-188:
        encoder -> 4x avg-pool -> flatten)

Artifacts are .npy (this framework's loaders read both .npy and torch .pt).
Multi-host sharding: frames are striped over jax.process_index().

The CoTracker flow labels are behind `CoTrackerExtractor` — an interface
with a zero-fill fallback (tail frames are zero-filled in the reference
too, cotrack_extractor.py:309-330); the full tracking model port is staged
for a later revision and precomputed labels remain loadable either way.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.extract.dinov2 import (DinoV2ViT, IMAGENET_MEAN,
                                         IMAGENET_STD, import_dinov2)
from dreamvla_tpu.extract.sam_encoder import (SAMImageEncoder,
                                              import_sam_encoder,
                                              sam_preprocess)


def dino_preprocess(frames_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """(N, H, W, 3) uint8 -> imagenet-normalised (N, 3, size, size)."""
    from PIL import Image

    out = np.empty((len(frames_uint8), size, size, 3), np.float32)
    for i, f in enumerate(frames_uint8):
        out[i] = np.asarray(Image.fromarray(f).resize((size, size),
                                                      Image.BICUBIC),
                            np.float32) / 255.0
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2)


class DinoFeatureExtractor:
    def __init__(self, checkpoint_path: Optional[str] = None,
                 dtype=jnp.bfloat16):
        self.model = DinoV2ViT(dtype=dtype)
        if checkpoint_path:
            from dreamvla_tpu.utils.torch_import import load_torch_state_dict

            sd = load_torch_state_dict(checkpoint_path)
            params, missing, _ = import_dinov2(sd)
            if missing:
                raise ValueError(f"dinov2 import missing keys: {missing[:5]}")
        else:  # random weights (pipeline smoke tests)
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224)))["params"]
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply({"params": p}, x)[0])

    def __call__(self, frames_uint8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(dino_preprocess(frames_uint8))
        return np.asarray(self._fn(self.params, x), np.float32)


class SamFeatureExtractor:
    def __init__(self, checkpoint_path: Optional[str] = None,
                 dtype=jnp.bfloat16, pool: int = 4):
        self.model = SAMImageEncoder(dtype=dtype)
        if checkpoint_path:
            from dreamvla_tpu.utils.torch_import import load_torch_state_dict

            sd = load_torch_state_dict(checkpoint_path)
            params, missing, _ = import_sam_encoder(sd)
            if missing:
                raise ValueError(f"sam import missing keys: {missing[:5]}")
        else:
            params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 1024, 1024)))["params"]
        self.params = params
        self.pool = pool

        def fn(p, x):
            feats = self.model.apply({"params": p}, x)  # (N, C, 64, 64)
            n, c, h, w = feats.shape
            k = self.pool
            pooled = feats.reshape(n, c, h // k, k, w // k, k).mean(axis=(3, 5))
            return pooled.reshape(n, c, -1)  # (N, 256, 256) channel-major

        self._fn = jax.jit(fn)

    def __call__(self, frames_uint8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(sam_preprocess(frames_uint8))
        return np.asarray(self._fn(self.params, x), np.float32)


class CoTrackerExtractor:
    """Interface for the optical-track label extractor.

    The reference tracks a 28x28 point grid between frame t and t+frame_gap
    with CoTracker3 and stores per-frame {tracks (784, 2) deltas,
    visibility (784,)} with zero-filled tails
    (data_process/cotrack_extractor.py:296-330). Backends, by `track_fn`:

      * "cotracker3" — the full CoTracker3-offline port
        (extract/cotracker3.py); pass `checkpoint_path` for the released
        `scaled_offline.pth` weights (exact reference parity);
      * "lk" — the weights-free pyramidal Lucas-Kanade fallback;
      * any callable `track_fn(frames (T,H,W,3), grid) ->
        (tracks (T,G,2), vis (T,G))`;
      * None — zero labels (flow losses vanish, matching tail behaviour)
        so the pipeline stays runnable end-to-end.
    """

    def __init__(self, grid: int = 28, frame_gap: int = 5,
                 track_fn: Optional[Callable] = None,
                 checkpoint_path: Optional[str] = None):
        self.grid = grid
        self.frame_gap = frame_gap
        if track_fn == "lk":
            from dreamvla_tpu.extract.flow_tracker import lk_grid_track_fn

            track_fn = lambda f, g: lk_grid_track_fn(f, g, frame_gap)  # noqa: E731
        elif track_fn == "cotracker3" or (track_fn is None
                                          and checkpoint_path):
            from dreamvla_tpu.extract.cotracker3 import CoTracker3GridTracker

            track_fn = CoTracker3GridTracker(checkpoint_path,
                                             frame_gap=frame_gap)
        self.track_fn = track_fn

    def __call__(self, frames_uint8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        t = len(frames_uint8)
        g = self.grid * self.grid
        if self.track_fn is not None:
            return self.track_fn(frames_uint8, self.grid)
        return (np.zeros((t, g, 2), np.float32),
                np.zeros((t, g), np.float32))


def extract_episode_features(frames_by_key, extractor, save_dir: str,
                             batch_size: int = 32,
                             skip_existing: bool = True) -> int:
    """frames_by_key: {frame_id: (H, W, 3) uint8}. Writes <id>.npy files.
    Returns the number of frames written (skip-existing like the reference
    extractors)."""
    os.makedirs(save_dir, exist_ok=True)
    ids = [i for i in sorted(frames_by_key)
           if not (skip_existing
                   and os.path.exists(os.path.join(save_dir, f"{i}.npy")))]
    written = 0
    for s in range(0, len(ids), batch_size):
        chunk = ids[s:s + batch_size]
        frames = np.stack([frames_by_key[i] for i in chunk])
        feats = extractor(frames)
        for fid, feat in zip(chunk, feats):
            atomic_save_npy(os.path.join(save_dir, f"{fid}.npy"), feat)
            written += 1
    return written


def atomic_save_npy(path: str, arr: np.ndarray) -> None:
    """tmpfile + fsync + rename (reference rebuild_bad_npz.py:16-24 pattern)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _load_sidecar(base_dir: str, idx: int):
    """Per-frame sidecar artifact in any of the pipeline's formats:
    .npy, torch-bf16 .pt (reference sam/dino extractors), or track .npz
    {tracks, visibility}. Returns (array, visibility-or-None) or None."""
    npy = os.path.join(base_dir, f"{idx}.npy")
    if os.path.exists(npy):
        return np.load(npy), None
    pt = os.path.join(base_dir, f"{idx}.pt")
    if os.path.exists(pt):
        import torch

        return torch.load(pt, map_location="cpu").to(
            torch.float32).numpy(), None
    npz = os.path.join(base_dir, f"{idx}.npz")
    if os.path.exists(npz):
        with np.load(npz) as z:
            return z["tracks"], z["visibility"]
    return None


def merge_features_into_episodes(episode_dir: str, feature_dirs, out_dir: str,
                                 key_map) -> int:
    """Repack sidecar per-frame features into the episode npz files
    (reference merge_sam_dino.py:15-31 / merge_track.py:14-28): for each
    episode_XXXXXXX.npz, add {new_key: sidecar artifact} and atomically
    rewrite. key_map: {npz_key: feature_dir_key}. Track sidecars (.npz)
    also emit the paired `visibility_*` key as the reference does."""
    import re
    from pathlib import Path

    count = 0
    for f in sorted(Path(episode_dir).glob("episode_*.npz")):
        idx = int(re.findall(r"\d+", f.stem)[0])
        with np.load(f, allow_pickle=True) as z:
            data = {k: z[k] for k in z.files}
        for npz_key, src in key_map.items():
            loaded = _load_sidecar(feature_dirs[src], idx)
            if loaded is None:
                continue
            feat, vis = loaded
            data[npz_key] = feat
            if vis is not None:
                data[npz_key.replace("traj", "visibility")] = vis
        out = Path(out_dir) / f.name
        os.makedirs(out_dir, exist_ok=True)
        tmp = str(out) + ".tmp"
        np.savez(tmp, **data)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, out)
        count += 1
    return count
