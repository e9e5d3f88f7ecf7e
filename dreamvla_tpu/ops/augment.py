"""DrQ-style random-shift augmentation, on-device.

Parity target: `utils/data_utils.py:326-383` (RandomShiftsAug). The reference
builds an integer-pixel-shift sampling grid and calls `F.grid_sample` with
bilinear interpolation — but because the shifts are exact pixel multiples the
whole op reduces to: replicate-pad by `pad`, then crop an (H, W) window at an
integer offset in [0, 2*pad] (or [1, 2*pad] in the `forward_traj` variant —
that off-by-one is preserved deliberately). We implement it as a vmapped
dynamic-slice: no gather, no grid, VPU-only, and it runs inside jit on device
instead of in dataloader worker processes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_one(img: jnp.ndarray, shift: jnp.ndarray, pad: int) -> jnp.ndarray:
    """img: (C, H, W); shift: (2,) int32 (x, y) offsets into the padded image."""
    c, h, w = img.shape
    padded = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return jax.lax.dynamic_slice(padded, (0, shift[1], shift[0]), (c, h, w))


def random_shifts_aug(
    rng: jax.Array,
    x: jnp.ndarray,
    pad: int,
    traj_variant: bool = False,
) -> jnp.ndarray:
    """Randomly shift images by integer offsets with replicate padding.

    x: (N, C, H, W) or (N, T, C, H, W). Every frame draws its own shift in
    both layouts — the reference's `forward_traj` also draws per-frame shifts
    (data_utils.py:373-377) despite its name, but from [1, 2*pad] instead of
    [0, 2*pad]; `traj_variant=True` reproduces that range.
    """
    if pad <= 0:
        return x
    squeeze = x.ndim == 4
    if squeeze:
        x = x[:, None]
    n, t = x.shape[:2]
    lo = 1 if traj_variant else 0
    shifts = jax.random.randint(rng, (n, t, 2), lo, 2 * pad + 1)
    out = jax.vmap(jax.vmap(lambda im, s: _shift_one(im, s, pad)))(x, shifts)
    return out[:, 0] if squeeze else out
