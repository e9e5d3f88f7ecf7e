"""Fixed sinusoidal position embeddings.

Parity targets (semantics, not code): reference
`models/dreamvla_model.py:71-120` and `models/vit_mae.py:8-53` — the standard
MAE 1-D/2-D sin-cos embeddings with base 10000 and w-before-h meshgrid order.

These are host-side numpy: embeddings are computed once at module init and
baked into (non-trainable) constants, so there is nothing to jit here.
"""

from __future__ import annotations

import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[sin(pos*w) | cos(pos*w)] over a geometric frequency ladder.

    pos: any shape, flattened to (M,). Returns (M, embed_dim) float64.
    """
    if embed_dim % 2 != 0:
        raise ValueError(f"embed_dim must be even, got {embed_dim}")
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """2-D factorized sin-cos embedding over a (grid_size, grid_size) grid.

    Matches the MAE convention: first half of channels encodes the h-grid,
    second half the w-grid, with `np.meshgrid(w, h)` ordering.
    Returns (grid_size**2 [+1], embed_dim).
    """
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def get_1d_sincos_pos_embed(embed_dim: int, length: int, scale: float = 1.0) -> np.ndarray:
    """1-D embedding of positions 0..length-1 (optionally scaled)."""
    pos = np.arange(0, length)[..., None] / scale
    return get_1d_sincos_pos_embed_from_grid(embed_dim, pos)
