"""Visualisation helpers (flow fields, prediction panels).

Capability parity with reference `utils/visualize_utils.py` (HSV optical-flow
rendering) and the wandb image panels assembled in train_utils.py:640-708
(pred-vs-label image/depth/flow grids).
"""

from __future__ import annotations


import numpy as np


def visualize_optical_flow(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 HSV rendering (hue=direction,
    value=magnitude, normalised by the field's max)."""
    h, w, _ = flow.shape
    mag = np.linalg.norm(flow, axis=-1)
    ang = (np.arctan2(flow[..., 1], flow[..., 0]) + np.pi) / (2 * np.pi)
    val = mag / (mag.max() + 1e-8)
    hsv = np.stack([ang, np.ones_like(ang), val], axis=-1)
    rgb = np.zeros((h, w, 3), np.float32)
    # vectorised hsv->rgb
    i = np.floor(hsv[..., 0] * 6).astype(int) % 6
    f = hsv[..., 0] * 6 - np.floor(hsv[..., 0] * 6)
    v = hsv[..., 2]
    p = np.zeros_like(v)
    q = v * (1 - f)
    t = v * f
    lut = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    for k, (r, g, b) in enumerate(lut):
        m = i == k
        rgb[m] = np.stack([r[m], g[m], b[m]], axis=-1)
    return (rgb * 255).astype(np.uint8)


def side_by_side(pred: np.ndarray, label: np.ndarray) -> np.ndarray:
    """Normalise both to [0,1] and stack horizontally for logging panels."""

    def norm(x):
        x = np.asarray(x, np.float32)
        return (x - x.min()) / (x.max() - x.min() + 1e-8)

    return np.concatenate([norm(pred), norm(label)], axis=1)
