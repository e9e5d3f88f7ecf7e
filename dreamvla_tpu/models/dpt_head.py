"""DPT depth-refinement head (Depth-Anything-V2 style).

Capability parity with the reference's optional `--use_dpt_head` path
(dreamvla_model.py:516-537, :830-836): the depth decoder's 256 tokens per
prediction slot feed a DPT head — four 1x1 projections + multi-scale
resize, RefineNet-style feature fusion, and a conv output stack producing a
dense (1, 14*ph, 14*pw) depth map. The reference loads this head from an
external Depth-Anything-V2 checkpoint that its repo does not ship; here the
architecture is native and `import_dpt_head` maps the released
`depth_anything_v2_*.pth` depth_head weights when available.

Implemented NHWC (TPU conv layout); the reference calls it with the same
token block repeated for all four stages (dreamvla_model.py:834) and
patch_h = patch_w = 16.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch `align_corners=True` semantics (corner
    pixels map to corners; sample grid spacing (in-1)/(out-1)). DA-V2's DPT
    uses this for every fusion upsample and the final head resize —
    `jax.image.resize`'s half-pixel convention diverges from it (caught by
    the HF-oracle test, tests/test_dpt_oracle.py). NHWC."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(size, out_size):
        if out_size == 1 or size == 1:
            pos = jnp.zeros((out_size,), jnp.float32)
        else:
            pos = jnp.linspace(0.0, size - 1.0, out_size)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size - 1)
        hi = jnp.minimum(lo + 1, size - 1)
        frac = (pos - lo).astype(x.dtype)
        return lo, hi, frac

    y0, y1, fy = axis_weights(h, out_h)
    x0, x1, fx = axis_weights(w, out_w)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top + (bot - top) * fy[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left + (right - left) * fx[None, None, :, None]


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw: Optional[Tuple[int, int]] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             name="resConfUnit2")(x)
        n, h, w, c = x.shape
        out_hw = out_hw or (2 * h, 2 * w)
        x = resize_bilinear_align_corners(x, out_hw[0], out_hw[1])
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTHead(nn.Module):
    in_channels: int  # decoder hidden width feeding the head
    features: int = 64  # 'vits' config (reference dreamvla_model.py:519)
    out_channels: Sequence[int] = (48, 96, 192, 384)
    metric: bool = True  # metric-depth variant ends in sigmoid
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stage_tokens, patch_h: int, patch_w: int):
        """stage_tokens: 4 x (N, patch_h*patch_w, in_channels) token blocks
        (the reference feeds the same block four times) -> (N, 1, H, W)
        with H = 14 * patch_h."""
        feats = []
        for i, tokens in enumerate(stage_tokens):
            n = tokens.shape[0]
            x = tokens.reshape(n, patch_h, patch_w, self.in_channels)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        name=f"projects_{i}")(x.astype(self.dtype))
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[0], (4, 4),
                                     strides=(4, 4), dtype=self.dtype,
                                     name="resize_0")(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[1], (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding="SAME", dtype=self.dtype,
                            name="resize_3")(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"layer_rn_{i}")(x)
            feats.append(x)
        l1, l2, l3, l4 = feats

        p4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet4")(l4, out_hw=l3.shape[1:3])
        p3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet3")(p4, l3, out_hw=l2.shape[1:3])
        p2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet2")(p3, l2, out_hw=l1.shape[1:3])
        p1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                name="refinenet1")(p2, l1)

        x = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                    dtype=self.dtype, name="output_conv1")(p1)
        x = resize_bilinear_align_corners(x, 14 * patch_h, 14 * patch_w)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                    name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        x = nn.sigmoid(x) if self.metric else nn.relu(x)
        return jnp.moveaxis(x, -1, 1)  # (N, 1, H, W)


def import_dpt_head(sd, stages: int = 4):
    """Depth-Anything-V2 `depth_head.*` weights -> DPTHead params.
    torch convs are OIHW -> flax HWIO; ConvTranspose similarly."""
    from dreamvla_tpu.utils.torch_import import _Importer

    if any(k.startswith("depth_head.") for k in sd):
        sd = {k[len("depth_head."):]: v for k, v in sd.items()
              if k.startswith("depth_head.")}
    im = _Importer(sd)

    def conv(src, path, transpose=False):
        w = im.take(f"{src}.weight")
        if w is not None:
            if transpose:  # torch ConvTranspose2d: (in, out, kh, kw)
                im.assign(path + ("kernel",), w.transpose(2, 3, 0, 1))
            else:  # torch Conv2d: (out, in, kh, kw)
                im.assign(path + ("kernel",), w.transpose(2, 3, 1, 0))
        if im.has(f"{src}.bias"):
            im.assign(path + ("bias",), im.take(f"{src}.bias"))

    for i in range(stages):
        conv(f"projects.{i}", (f"projects_{i}",))
        conv(f"scratch.layer{i+1}_rn", (f"layer_rn_{i}",))
    conv("resize_layers.0", ("resize_0",), transpose=True)
    conv("resize_layers.1", ("resize_1",), transpose=True)
    conv("resize_layers.3", ("resize_3",))
    for i in range(1, 5):
        base = f"scratch.refinenet{i}"
        path = (f"refinenet{i}",)
        for unit in ("resConfUnit1", "resConfUnit2"):
            if i == 4 and unit == "resConfUnit1":
                # refinenet4 takes no skip input, so its first unit never
                # runs (in DA-V2 too); consume the dead weights
                im.used.update(k for k in sd if k.startswith(f"{base}.{unit}."))
                continue
            conv(f"{base}.{unit}.conv1", path + (unit, "conv1"))
            conv(f"{base}.{unit}.conv2", path + (unit, "conv2"))
        conv(f"{base}.out_conv", path + ("out_conv",))
    conv("scratch.output_conv1", ("output_conv1",))
    conv("scratch.output_conv2.0", ("output_conv2_0",))
    conv("scratch.output_conv2.2", ("output_conv2_2",))
    return im.out, im.missing, im.unexpected()
