"""Patch <-> image reshapes and label normalisation.

Parity targets: reference `utils/train_utils.py:37-57` (patchify /
normalize_patchfied_image), `models/vit_mae.py:129-155`
(patchify/unpatchify), and the `F.pixel_unshuffle` flow-label packing at
`utils/train_utils.py:473-480`.

All functions take NCHW images (the framework's external batch contract, kept
identical to the reference so labels are bit-comparable); internally they are
pure reshapes/transposes which XLA fuses away.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, (H/p)*(W/p), p*p*C), row-major patch order.

    Within a patch the layout is (p_h, p_w, channel) flattened — identical to
    torch.einsum('nchpwq->nhwpqc') in the reference.
    """
    n, c, h, w = imgs.shape
    if h % patch_size or w % patch_size:
        raise ValueError(f"image size {(h, w)} not divisible by patch {patch_size}")
    gh, gw = h // patch_size, w // patch_size
    x = imgs.reshape(n, c, gh, patch_size, gw, patch_size)
    x = jnp.einsum("nchpwq->nhwpqc", x)
    return x.reshape(n, gh * gw, patch_size * patch_size * c)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(N, L, p*p*C) -> (N, C, H, W); inverse of `patchify` for square grids."""
    n, l, _ = x.shape
    gh = int(round(l**0.5))
    if gh * gh != l:
        raise ValueError(f"token count {l} is not a square")
    x = x.reshape(n, gh, gh, patch_size, patch_size, channels)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(n, channels, gh * patch_size, gh * patch_size)


def normalize_patchified(x: jnp.ndarray, eps: float = 1.0e-6) -> jnp.ndarray:
    """Per-patch mean/var normalisation of patchified pixels.

    Matches `normalize_patchfied_image` (train_utils.py:52-57): unbiased
    variance (torch's default `var`), eps added to var before sqrt.
    """
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True, ddof=1)
    return (x - mean) / jnp.sqrt(var + eps)


def pixel_unshuffle_tracks(tracks: jnp.ndarray, grid: int, out_grid: int) -> jnp.ndarray:
    """Pack a (B, P, grid*grid, 2) flow-track field into coarse tokens.

    Reference packs 28x28 2-channel tracks to 14x14 tokens of 8 channels via
    `F.pixel_unshuffle(downscale_factor=grid//out_grid)` on a (B,P,2,H,W)
    layout (train_utils.py:473-480), then flattens back to (B, P, out*out, C').

    torch pixel_unshuffle channel order: out channel index =
    c * r^2 + dy * r + dx  (input channel major, then offset row-major).
    """
    b, p, hw, c = tracks.shape
    if hw != grid * grid:
        raise ValueError(f"track grid mismatch: {hw} vs {grid}**2")
    r = grid // out_grid
    x = tracks.reshape(b, p, out_grid, r, out_grid, r, c)  # (b,p,H',dy,W',dx,c)
    # -> (b, p, c, dy, dx, H', W') so that flattening (c,dy,dx) matches torch
    x = jnp.einsum("bphywxc->bpcyxhw", x)
    x = x.reshape(b, p, c * r * r, out_grid, out_grid)
    x = jnp.moveaxis(x, 2, -1)  # (b, p, H', W', C')
    return x.reshape(b, p, out_grid * out_grid, c * r * r)
