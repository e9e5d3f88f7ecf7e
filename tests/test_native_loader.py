"""Native (C++) frame loader vs numpy parity + integration with CalvinDataset."""

import time

import numpy as np
import pytest

from dreamvla_tpu.data import native_loader


@pytest.fixture(scope="module")
def npz_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = d / f"episode_{i:07d}.npz"
        arrays = dict(
            rgb_static=rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rel_actions=rng.normal(size=7).astype(np.float32),
            robot_obs=rng.normal(size=15).astype(np.float64),
        )
        if i % 2:
            np.savez_compressed(p, **arrays)  # deflate members
        else:
            np.savez(p, **arrays)  # stored members
        paths.append(str(p))
    return paths


@pytest.mark.skipif(not native_loader.available(),
                    reason="native lib not built (make -C native)")
def test_native_matches_numpy(npz_files):
    tasks = [(p, k) for p in npz_files
             for k in ("rgb_static", "rel_actions", "robot_obs")]
    got = native_loader.read_members_batch(tasks, n_threads=4)
    for (path, key), arr in zip(tasks, got):
        with np.load(path) as z:
            np.testing.assert_array_equal(arr, z[key])


@pytest.mark.skipif(not native_loader.available(),
                    reason="native lib not built (make -C native)")
def test_native_missing_member_returns_none(npz_files):
    out = native_loader.read_members_batch([(npz_files[0], "nope")])
    assert out == [None]
    out = native_loader.read_members_batch([("/does/not/exist.npz", "x")])
    assert out == [None]


def test_fallback_path_without_lib(npz_files, monkeypatch):
    monkeypatch.setattr(native_loader, "_LIB", None)
    out = native_loader.read_members_batch([(npz_files[0], "rel_actions")])
    with np.load(npz_files[0]) as z:
        np.testing.assert_array_equal(out[0], z["rel_actions"])
