"""Pyramidal LK tracker: recovers known translations; extractor contract."""

import numpy as np
import jax.numpy as jnp

from dreamvla_tpu.extract.flow_tracker import (grid_points, lk_grid_track_fn,
                                               lk_track_pair)
from dreamvla_tpu.extract.pipeline import CoTrackerExtractor


def textured_frame(rng, h=112, w=112):
    base = rng.random((h // 8, w // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    img += 0.1 * rng.random((h, w, 3))
    return (img / img.max() * 255).astype(np.uint8)


def test_lk_recovers_translation():
    rng = np.random.default_rng(0)
    f0 = textured_frame(rng)
    dx, dy = 3, -2
    f1 = np.roll(np.roll(f0, dy, axis=0), dx, axis=1)
    pts = jnp.asarray(grid_points(8, 112))
    deltas, vis = lk_track_pair(jnp.asarray(f0), jnp.asarray(f1), pts)
    deltas, vis = np.asarray(deltas), np.asarray(vis)
    good = vis > 0
    assert good.mean() > 0.8
    err = np.abs(deltas[good] - np.array([dx, dy]))
    assert np.median(err) < 0.5, np.median(err)


def test_grid_track_fn_contract():
    rng = np.random.default_rng(1)
    frames = np.stack([textured_frame(rng) for _ in range(6)])
    tracks, vis = lk_grid_track_fn(frames, grid=7, frame_gap=3)
    assert tracks.shape == (6, 49, 2) and vis.shape == (6, 49)
    # zero-filled tails (last frame_gap frames)
    assert np.all(tracks[3:] == 0) and np.all(vis[3:] == 0)


def test_cotracker_extractor_with_lk_backend():
    rng = np.random.default_rng(2)
    frames = np.stack([textured_frame(rng, 112, 112) for _ in range(4)])
    ex = CoTrackerExtractor(grid=7, frame_gap=1,
                            track_fn=lambda f, g: lk_grid_track_fn(f, g, 1))
    tracks, vis = ex(frames)
    assert tracks.shape == (4, 49, 2)
    assert vis[:3].mean() > 0.5
