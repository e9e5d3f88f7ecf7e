"""Point-tracking building blocks (CoTracker-port groundwork).

The reference's flow labels come from CoTracker3; round 1 ships a working
pyramidal-LK extractor (`flow_tracker.py`) behind the same artifact
contract. This module provides the CoTracker-style computational core —
a stride-4 convolutional feature encoder, multi-channel bilinear sampling,
and per-point local correlation pyramids — as tested, jit-friendly ops so
the round-2 port is wiring + weight import rather than numerics work.

Shapes follow the public CoTracker design: features at stride 4 with
latent_dim channels; correlation between a query's feature vector and a
(2r+1)^2 neighbourhood at each pyramid level, normalised by sqrt(C).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Per-channel spatial instance norm (CoTracker's encoder norm)."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return x * scale + bias


class ResidualUnit(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", name="conv1")(x)
        h = InstanceNorm(name="norm1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(h)
        h = InstanceNorm(name="norm2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        name="downsample")(x)
        return nn.relu(x + h)


class BasicEncoder(nn.Module):
    """Stride-4 conv feature encoder: (B, 3, H, W) -> (B, H/4, W/4, dim)."""

    latent_dim: int = 128

    @nn.compact
    def __call__(self, imgs):
        x = jnp.moveaxis(imgs, 1, -1)  # NCHW -> NHWC
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", name="conv1")(x)
        x = nn.relu(InstanceNorm(name="norm1")(x))
        x = ResidualUnit(64, name="layer1")(x)
        x = ResidualUnit(96, stride=2, name="layer2")(x)
        x = ResidualUnit(128, name="layer3")(x)
        x = nn.Conv(self.latent_dim, (1, 1), name="conv_out")(x)
        return x


def bilinear_sample(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C), coords (..., 2) [x, y] in fmap pixels -> (..., C)."""
    h, w, _ = fmap.shape
    x = jnp.clip(coords[..., 0], 0.0, w - 1.001)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x0 + 1]
    v10 = fmap[y0 + 1, x0]
    v11 = fmap[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def feature_pyramid(fmap: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """(H, W, C) -> [level0, 2x-pooled, 4x-pooled, ...] via 2x avg-pool."""
    pyr = [fmap]
    for _ in range(levels - 1):
        f = pyr[-1]
        h2, w2 = f.shape[0] // 2, f.shape[1] // 2
        pyr.append(f[: h2 * 2, : w2 * 2]
                   .reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3)))
    return pyr


def corr_window(query_feats: jnp.ndarray, fmap: jnp.ndarray,
                coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Local correlation: query_feats (N, C), fmap (H, W, C), coords (N, 2)
    -> (N, (2r+1)^2) of <f_q, fmap(coords + delta)> / sqrt(C)."""
    n, c = query_feats.shape
    r = radius
    dx, dy = jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0))
    offsets = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # (W2, 2)
    grid = coords[:, None, :] + offsets[None]  # (N, W2, 2)
    sampled = bilinear_sample(fmap, grid)  # (N, W2, C)
    return jnp.einsum("nc,nwc->nw", query_feats, sampled) / jnp.sqrt(c)


def corr_pyramid_features(query_feats: jnp.ndarray,
                          pyramid: Sequence[jnp.ndarray],
                          coords: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Stacked local correlations across pyramid levels (coords scaled per
    level): (N, levels * (2r+1)^2) — the per-iteration correlation features
    a CoTracker-style updater consumes."""
    outs = []
    for lvl, fmap in enumerate(pyramid):
        outs.append(corr_window(query_feats, fmap, coords / (2.0**lvl), radius))
    return jnp.concatenate(outs, axis=-1)
