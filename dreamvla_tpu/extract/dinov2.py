"""DINOv2 ViT-B/14 feature extractor (Flax).

Capability parity with the reference's offline DINO label pipeline
(`data_process/dino_extractor.py`: dinov2_vitb14 on 224^2 frames ->
x_norm_patchtokens (256, 768) per frame, saved per frame). Architecture per
the public DINOv2 ViT: patch-14 conv embed, cls token, learned pos embed
(interpolated when needed), pre-LN blocks with LayerScale, final LN.

Weights import from `dinov2_vitb14_pretrain.pth` via `import_dinov2`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dreamvla_tpu.models.layers import MultiHeadSelfAttention, MlpBlock
from dreamvla_tpu.ops.patchify import patchify


class LayerScaledBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5), (d,))
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5), (d,))
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                   use_pallas=self.use_pallas, name="attn")(h)
        x = x + ls1.astype(x.dtype) * h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = MlpBlock(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        return x + ls2.astype(x.dtype) * h


class DinoV2ViT(nn.Module):
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    pretrain_grid: int = 37  # 518/14: the released pos-embed grid
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """imgs (N, 3, H, W) -> (patch tokens (N, L, D), cls (N, D))."""
        n = imgs.shape[0]
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")(
            patchify(imgs.astype(self.dtype), self.patch_size))
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pretrain_grid**2 + 1, self.embed_dim))
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        if self.grid != self.pretrain_grid:
            pos_grid = _interp_pos(pos_grid, self.pretrain_grid, self.grid)
        x = x + pos_grid.astype(x.dtype)
        cls_tok = jnp.broadcast_to((cls + pos_cls).astype(x.dtype),
                                   (n, 1, self.embed_dim))
        x = jnp.concatenate([cls_tok, x], axis=1)
        for i in range(self.depth):
            x = LayerScaledBlock(self.num_heads, dtype=self.dtype,
                                 use_pallas=self.use_pallas,
                                 name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 1:], x[:, 0]


def _interp_pos(pos_grid: jnp.ndarray, src: int, dst: int) -> jnp.ndarray:
    """Bicubic-ish (bilinear) pos-embed interpolation to the target grid."""
    import jax

    d = pos_grid.shape[-1]
    img = pos_grid.reshape(1, src, src, d)
    out = jax.image.resize(img, (1, dst, dst, d), method="bicubic")
    return out.reshape(1, dst * dst, d)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def import_dinov2(sd, depth: int = 12):
    """dinov2_vitb14_pretrain.pth state dict -> DinoV2ViT params."""
    from dreamvla_tpu.utils.torch_import import _Importer

    im = _Importer(sd)
    w = im.take("patch_embed.proj.weight")
    if w is not None:
        im.assign(("patch_embed", "kernel"),
                  w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    im.assign(("patch_embed", "bias"), im.take("patch_embed.proj.bias"))
    im.raw("cls_token", ("cls_token",))
    im.raw("pos_embed", ("pos_embed",))
    for i in range(depth):
        tp, p = f"blocks.{i}", (f"blocks_{i}",)
        im.layernorm(f"{tp}.norm1", p + ("norm1",))
        im.dense(f"{tp}.attn.qkv", p + ("attn", "qkv"))
        im.dense(f"{tp}.attn.proj", p + ("attn", "proj"))
        im.layernorm(f"{tp}.norm2", p + ("norm2",))
        im.dense(f"{tp}.mlp.fc1", p + ("mlp", "fc1"))
        im.dense(f"{tp}.mlp.fc2", p + ("mlp", "fc2"))
        im.raw(f"{tp}.ls1.gamma", p + ("ls1_gamma",))
        im.raw(f"{tp}.ls2.gamma", p + ("ls2_gamma",))
    im.layernorm("norm", ("norm",))
    im.used.update(k for k in sd if k == "mask_token")
    return im.out, im.missing, im.unexpected()
