"""Grid-point optical flow tracking in pure JAX (pyramidal Lucas-Kanade).

The reference's flow labels come from CoTracker3 tracking a 28x28 grid
between frame t and t+frame_gap (data_process/cotrack_extractor.py:51,
:109-115, :296-330; deltas + visibility per frame, zero-filled tails). A
full CoTracker port (correlation pyramids + iterative transformer) is
staged; this module provides a *working, fully on-device* flow extractor
with the same artifact contract using classic coarse-to-fine Lucas-Kanade:

  * grayscale pyramid (box-blur + 2x decimation);
  * per level, iterative LK on each grid point: solve the 2x2 normal
    equations over a window of spatial gradients, bilinear sampling;
  * visibility = point stays in frame and the system is well-conditioned.

Quality is below CoTracker on long-range/occluded motion but faithful on
the short-gap, mostly-rigid robot scenes these labels cover — and it needs
no external weights. Plug a ported CoTracker through the same
`track_fn` interface for exact parity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_gray(frame: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8/float -> (H, W) float32 luminance."""
    f = frame.astype(jnp.float32)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def _blur_down(img: jnp.ndarray) -> jnp.ndarray:
    """5-tap binomial blur + 2x decimation."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(k[i] * pad[i : i + img.shape[0]] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * pad[:, i : i + img.shape[1]] for i in range(5))
    return img[::2, ::2]


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at xy (..., 2) [x, y] with border clamping."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0, y0 = jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _lk_refine(img0, img1, pts, flow, window: int, iters: int):
    """One pyramid level of iterative LK for all points (N, 2)."""
    r = window // 2
    offs = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1.0),
                                  jnp.arange(-r, r + 1.0)), axis=-1)
    offs = offs.reshape(-1, 2)  # (W2, 2) [x, y]

    gx0 = (jnp.roll(img0, -1, 1) - jnp.roll(img0, 1, 1)) * 0.5
    gy0 = (jnp.roll(img0, -1, 0) - jnp.roll(img0, 1, 0)) * 0.5

    def one_point(p, f):
        grid0 = p[None, :] + offs  # (W2, 2)
        ix = _bilinear(gx0, grid0)
        iy = _bilinear(gy0, grid0)
        i0 = _bilinear(img0, grid0)
        g11 = jnp.sum(ix * ix)
        g12 = jnp.sum(ix * iy)
        g22 = jnp.sum(iy * iy)
        det = g11 * g22 - g12 * g12
        ok = det > 1e-4
        inv = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-4), 0.0)

        def body(_, f):
            i1 = _bilinear(img1, grid0 + f[None, :])
            it = i1 - i0
            b1 = jnp.sum(ix * it)
            b2 = jnp.sum(iy * it)
            dx = -(g22 * b1 - g12 * b2) * inv
            dy = -(-g12 * b1 + g11 * b2) * inv
            return f + jnp.stack([dx, dy])

        f = jax.lax.fori_loop(0, iters, body, f)
        return f, ok

    return jax.vmap(one_point)(pts, flow)


@functools.partial(jax.jit, static_argnames=("levels", "window", "iters"))
def lk_track_pair(frame0: jnp.ndarray, frame1: jnp.ndarray,
                  points: jnp.ndarray, levels: int = 3, window: int = 11,
                  iters: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track points (N, 2) [x, y] from frame0 to frame1.

    Returns (deltas (N, 2), visibility (N,)) — deltas in pixels at full
    resolution, matching the reference's per-frame track contract.
    """
    g0, g1 = _to_gray(frame0), _to_gray(frame1)
    pyr0, pyr1 = [g0], [g1]
    for _ in range(levels - 1):
        pyr0.append(_blur_down(pyr0[-1]))
        pyr1.append(_blur_down(pyr1[-1]))

    flow = jnp.zeros_like(points)
    ok_all = jnp.ones(points.shape[0], bool)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        flow, ok = _lk_refine(pyr0[lvl], pyr1[lvl], points / scale,
                              flow / scale, window, iters)
        flow = flow * scale
        ok_all = ok_all & ok

    h, w = g0.shape
    target = points + flow
    inside = ((target[:, 0] >= 0) & (target[:, 0] <= w - 1)
              & (target[:, 1] >= 0) & (target[:, 1] <= h - 1))
    return flow, (ok_all & inside).astype(jnp.float32)


def grid_points(grid: int, image_size: int) -> np.ndarray:
    """The reference's 28x28 grid over a 224^2 frame: cell centers of an
    image_size/grid lattice (cotrack_extractor.py get_points_on_a_grid)."""
    step = image_size / grid
    coords = (np.arange(grid) + 0.5) * step
    xx, yy = np.meshgrid(coords, coords)
    return np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1).astype(np.float32)


def lk_grid_track_fn(frames: np.ndarray, grid: int,
                     frame_gap: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """CoTrackerExtractor-compatible track_fn: per frame t, the grid deltas
    to frame t+frame_gap; tail frames zero-filled (reference
    cotrack_extractor.py:309-330)."""
    t, h, w = frames.shape[:3]
    pts = jnp.asarray(grid_points(grid, h))
    n = grid * grid
    tracks = np.zeros((t, n, 2), np.float32)
    vis = np.zeros((t, n), np.float32)
    pair = jax.vmap(lambda a, b: lk_track_pair(a, b, pts))
    if t > frame_gap:
        f0 = jnp.asarray(frames[: t - frame_gap])
        f1 = jnp.asarray(frames[frame_gap:])
        d, v = pair(f0, f1)
        tracks[: t - frame_gap] = np.asarray(d)
        vis[: t - frame_gap] = np.asarray(v)
    return tracks, vis
