"""SAM (ViTDet) ViT-B image encoder for the offline SAM-feature pipeline.

Capability parity with the reference's SAM label extractor
(`data_process/sam_extractor.py:181-188`): sam.preprocess (1024^2 pad +
pixel normalisation) -> image_encoder -> (B, 256, 64, 64) feature map ->
4x avg-pool -> (B, 256, 256) tokens saved per frame.

Architecture (public segment-anything ImageEncoderViT, ViT-B):
patch-16 conv embed over 1024^2 -> (64, 64, 768) + absolute pos embed;
12 pre-LN blocks with 14x14 windowed attention (global at layers 2/5/8/11),
decomposed relative position bias (rel_pos_h/rel_pos_w tables); 1x1 + 3x3
conv neck with channel LayerNorms down to 256 channels.

All attention here uses explicit einsums (the decomposed bias is per-window
content-dependent, so the shared-bias flash kernel doesn't apply); XLA fuses
these shapes well.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def sam_preprocess(imgs_uint8: np.ndarray, target: int = 1024) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, 3, 1024, 1024) float32 (resize long side +
    zero-pad, SAM's preprocess semantics)."""
    from PIL import Image

    out = np.zeros((len(imgs_uint8), target, target, 3), np.float32)
    for i, im in enumerate(imgs_uint8):
        h, w = im.shape[:2]
        scale = target / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        re = np.asarray(Image.fromarray(im).resize((nw, nh), Image.BILINEAR),
                        np.float32)
        out[i, :nh, :nw] = (re - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    return out.transpose(0, 3, 1, 2)


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select (and if needed interpolate) relative position embeddings."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SAMAttention(nn.Module):
    num_heads: int
    input_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, D) -> (B, H, W, D), decomposed rel-pos attention."""
        b, h, w, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2).reshape(
            b * self.num_heads, h * w, hd) for i in range(3))
        attn = (q * hd**-0.5) @ jnp.swapaxes(k, -1, -2)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size[0] - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size[1] - 1, hd))
        Rh = _get_rel_pos(h, h, rel_h.astype(x.dtype))
        Rw = _get_rel_pos(w, w, rel_w.astype(x.dtype))
        r_q = q.reshape(b * self.num_heads, h, w, hd)
        rel_h_term = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w_term = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = (attn.reshape(b * self.num_heads, h, w, h, w)
                + rel_h_term[:, :, :, :, None]
                + rel_w_term[:, :, :, None, :]
                ).reshape(b * self.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).reshape(b, self.num_heads, h * w, hd)
        out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


def window_partition(x: jnp.ndarray, win: int):
    b, h, w, c = x.shape
    ph, pw = (-h) % win, (-w) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return wins, (hp, wp)


def window_unpartition(wins: jnp.ndarray, win: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // win // win)
    x = wins.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class SAMBlock(nn.Module):
    num_heads: int
    window_size: int  # 0 = global attention
    base_size: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, d = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
            size = (self.window_size, self.window_size)
        else:
            size = (h, w)
        x = SAMAttention(self.num_heads, size, dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        hh = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hh = nn.Dense(4 * d, dtype=self.dtype, name="mlp_lin1")(hh)
        hh = nn.gelu(hh, approximate=False)
        hh = nn.Dense(d, dtype=self.dtype, name="mlp_lin2")(hh)
        return x + hh


class LayerNorm2d(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C), normalise over C
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        x = (x - mu) / jnp.sqrt(var + 1e-6)
        return x * weight.astype(x.dtype) + bias.astype(x.dtype)


class SAMImageEncoder(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """imgs (N, 3, 1024, 1024) -> features (N, out_chans, 64, 64)."""
        from dreamvla_tpu.ops.patchify import patchify

        g = self.img_size // self.patch_size
        n = imgs.shape[0]
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")(
            patchify(imgs.astype(self.dtype), self.patch_size))
        x = x.reshape(n, g, g, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.embed_dim))
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            win = 0 if i in self.global_attn_indexes else self.window_size
            x = SAMBlock(self.num_heads, win, (g, g), dtype=self.dtype,
                         name=f"blocks_{i}")(x)
        x = nn.Dense(self.out_chans, use_bias=False, dtype=self.dtype,
                     name="neck_conv1")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(dtype=self.dtype, name="neck_ln2")(x)
        return jnp.moveaxis(x, -1, 1)  # (N, C, H, W)


def import_sam_encoder(sd, depth: int = 12):
    """segment-anything `sam_vit_b` checkpoint (image_encoder.* keys or
    already-stripped) -> SAMImageEncoder params."""
    from dreamvla_tpu.utils.torch_import import _Importer

    if any(k.startswith("image_encoder.") for k in sd):
        sd = {k[len("image_encoder."):]: v for k, v in sd.items()
              if k.startswith("image_encoder.")}
    im = _Importer(sd)
    w = im.take("patch_embed.proj.weight")
    if w is not None:
        im.assign(("patch_embed", "kernel"),
                  w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    im.assign(("patch_embed", "bias"), im.take("patch_embed.proj.bias"))
    im.raw("pos_embed", ("pos_embed",))
    for i in range(depth):
        tp, p = f"blocks.{i}", (f"blocks_{i}",)
        im.layernorm(f"{tp}.norm1", p + ("norm1",))
        im.dense(f"{tp}.attn.qkv", p + ("attn", "qkv"))
        im.dense(f"{tp}.attn.proj", p + ("attn", "proj"))
        im.raw(f"{tp}.attn.rel_pos_h", p + ("attn", "rel_pos_h"))
        im.raw(f"{tp}.attn.rel_pos_w", p + ("attn", "rel_pos_w"))
        im.layernorm(f"{tp}.norm2", p + ("norm2",))
        im.dense(f"{tp}.mlp.lin1", p + ("mlp_lin1",))
        im.dense(f"{tp}.mlp.lin2", p + ("mlp_lin2",))
    w = im.take("neck.0.weight")  # (256, 768, 1, 1)
    if w is not None:
        im.assign(("neck_conv1", "kernel"), w[:, :, 0, 0].T)
    im.assign(("neck_ln1", "weight"), im.take("neck.1.weight"))
    im.assign(("neck_ln1", "bias"), im.take("neck.1.bias"))
    w = im.take("neck.2.weight")  # (256, 256, 3, 3) torch OIHW -> HWIO
    if w is not None:
        im.assign(("neck_conv2", "kernel"), w.transpose(2, 3, 1, 0))
    im.assign(("neck_ln2", "weight"), im.take("neck.3.weight"))
    im.assign(("neck_ln2", "bias"), im.take("neck.3.bias"))
    return im.out, im.missing, im.unexpected()
