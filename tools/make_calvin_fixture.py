"""Generate a CALVIN-shaped on-disk fixture for loader benchmarking.

Reproduces the reference dataset layout (per-frame episode_XXXXXXX.npz,
auto_lang_ann.npy, ep_start_end_ids.npy — reference data_utils.py:944-1306)
with synthetic content, plus optional DINO/SAM `.pt` and CoTracker `.npz`
sidecar trees at the real shapes, so `dreamvla_tpu.data.bench_loader` and
`pack_calvin` measurements are reproducible without the real dataset.

    python tools/make_calvin_fixture.py /tmp/dv_calvin --episodes 40 \
        --frames_per_episode 50 --features
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out_root", help="fixture root (training/ created inside)")
    p.add_argument("--episodes", type=int, default=40)
    p.add_argument("--frames_per_episode", type=int, default=50)
    p.add_argument("--features", action="store_true",
                   help="also write DINO/SAM .pt + track .npz sidecars "
                        "(dino/, sam/, tracks/ next to training/)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    root = Path(args.out_root)
    split = root / "training"
    split.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_frames = args.episodes * args.frames_per_episode
    ranges, ann_idx = [], []
    for e in range(args.episodes):
        lo = e * args.frames_per_episode
        hi = lo + args.frames_per_episode - 1
        ranges.append([lo, hi])
        ann_idx.append((lo, hi))

    if args.features:
        import torch

        dirs = {}
        for name in ("dino", "sam", "tracks"):
            for cam in ("rgb_static", "rgb_gripper"):
                d = root / name / cam / "training"
                d.mkdir(parents=True, exist_ok=True)
                dirs[(name, cam)] = d

    # one synthetic frame re-noised per step keeps generation fast while
    # defeating trivial page-dedup
    base_static = rng.integers(0, 255, (200, 200, 3)).astype(np.uint8)
    base_grip = rng.integers(0, 255, (84, 84, 3)).astype(np.uint8)
    for fid in range(n_frames):
        np.savez(
            split / f"episode_{fid:07d}.npz",
            rgb_static=np.roll(base_static, fid % 97, axis=0),
            rgb_gripper=np.roll(base_grip, fid % 41, axis=1),
            depth_static=rng.random((200, 200)).astype(np.float32),
            depth_gripper=rng.random((84, 84)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6),
                 [1.0 if fid % 2 else -1.0]]).astype(np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14),
                 [1.0 if fid % 3 else -1.0]]).astype(np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
        if args.features:
            for cam in ("rgb_static", "rgb_gripper"):
                torch.save(torch.tensor(
                    rng.normal(size=(256, 768)), dtype=torch.bfloat16),
                    dirs[("dino", cam)] / f"{fid}.pt")
                torch.save(torch.tensor(
                    rng.normal(size=(256, 256)), dtype=torch.bfloat16),
                    dirs[("sam", cam)] / f"{fid}.pt")
                np.savez(dirs[("tracks", cam)] / f"{fid}.npz",
                         tracks=rng.normal(size=(784, 2)).astype(np.float32),
                         visibility=rng.integers(0, 2, 784).astype(np.uint8))
        if (fid + 1) % 500 == 0:
            print(f"[fixture] {fid + 1}/{n_frames} frames", flush=True)

    ann = {
        "info": {"indx": ann_idx},
        "language": {
            "ann": [f"task variant {e}" for e in range(args.episodes)],
            "task": [f"task_{e % 10}" for e in range(args.episodes)],
        },
    }
    lang = split / "lang_annotations"
    lang.mkdir(exist_ok=True)
    np.save(lang / "auto_lang_ann.npy", ann)
    np.save(split / "ep_start_end_ids.npy", np.asarray(ranges, np.int64))
    size_mb = sum(f.stat().st_size for f in root.rglob("*") if f.is_file()) / 1e6
    print(f"fixture: {n_frames} frames, {size_mb:.0f} MB under {root}")


if __name__ == "__main__":
    main()
