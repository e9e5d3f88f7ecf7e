"""Per-step-tree extractor + repair tooling tests."""

import numpy as np
from PIL import Image

from dreamvla_tpu.extract.libero_tree import (extract_feature_tree,
                                              find_bad_track_files,
                                              rebuild_track_files)
from dreamvla_tpu.extract.pipeline import CoTrackerExtractor


def make_tree(tmp_path, episodes=2, steps=3):
    rng = np.random.default_rng(0)
    for e in range(episodes):
        for s in range(steps):
            d = tmp_path / "episodes" / f"{e:06d}" / "steps" / f"{s:04d}"
            d.mkdir(parents=True)
            for key in ("image_primary", "image_wrist"):
                Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                             dtype=np.uint8)).save(d / f"{key}.jpg")
    return tmp_path


def test_extract_feature_tree(tmp_path):
    root = make_tree(tmp_path)

    def fake_extractor(frames):
        return frames.mean(axis=(1, 2))  # (N, 3)

    n = extract_feature_tree(str(root), fake_extractor, "dinov2_feats",
                             "image_primary", batch_size=2)
    assert n == 6
    out = root / "dinov2_feats" / "000000" / "steps" / "0001" / "image_primary.npy"
    assert np.load(out).shape == (3,)
    # resume: nothing left to do
    assert extract_feature_tree(str(root), fake_extractor, "dinov2_feats",
                                "image_primary") == 0
    # striping across 2 processes covers disjoint work
    n0 = extract_feature_tree(str(root), fake_extractor, "feats2",
                              "image_wrist", process_index=0, process_count=2)
    n1 = extract_feature_tree(str(root), fake_extractor, "feats2",
                              "image_wrist", process_index=1, process_count=2)
    assert n0 + n1 == 6


def test_bad_track_repair(tmp_path):
    d = tmp_path / "cotracker_traj" / "000000" / "steps" / "0000"
    d.mkdir(parents=True)
    good = d / "image_primary.npz"
    np.savez(good, tracks=np.zeros((784, 2)), visibility=np.zeros(784))
    bad = d / "image_wrist.npz"
    bad.write_bytes(b"corrupt")
    found = find_bad_track_files(str(tmp_path / "cotracker_traj"))
    assert found == [str(bad)]
    fixed = rebuild_track_files(found, CoTrackerExtractor(grid=28))
    assert fixed == 1
    with np.load(bad) as z:
        assert z["tracks"].shape == (784, 2)
