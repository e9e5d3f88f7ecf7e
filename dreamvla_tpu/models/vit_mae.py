"""MAE Vision Transformer (frozen image encoder), TPU-first.

Capability parity with reference `models/vit_mae.py` (MaskedAutoencoderViT):
ViT-B/16 encoder producing [cls + 196 patch] tokens per 224x224 frame, plus
the full MAE decoder and random-masking path for pretraining-style use.

TPU design deltas:
  * patch embedding is `patchify -> Dense` (one big MXU matmul) instead of a
    stride-16 conv — identical math, no conv lowering;
  * the fixed sin-cos position table is a numpy constant baked at trace time,
    not a parameter;
  * random masking uses jax.random argsort, jit-safe static keep-length.

The encoder is wrapped in stop_gradient by the caller (DreamVLA) — weights
come from the released `mae_pretrain_vit_base.pth` via
`dreamvla_tpu.utils.torch_import`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.models.layers import ViTBlock
from dreamvla_tpu.ops.patchify import patchify, unpatchify
from dreamvla_tpu.ops.posemb import get_2d_sincos_pos_embed


class MaskedAutoencoderViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    # scan unroll for the layer-stacked serving apply (bit-equal; see
    # ops/vit_fused.py::fused_vit_layers_scanned)
    scan_unroll: int = 1

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**2

    def setup(self):
        self.patch_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        self.blocks = [
            ViTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                     use_pallas=self.use_pallas, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        # decoder
        self.decoder_embed = nn.Dense(self.decoder_embed_dim, dtype=self.dtype,
                                      name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_embed_dim)
        )
        self.decoder_blocks = [
            ViTBlock(self.decoder_num_heads, self.mlp_ratio, dtype=self.dtype,
                     use_pallas=self.use_pallas, name=f"decoder_blocks_{i}")
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                         name="decoder_norm")
        self.decoder_pred = nn.Dense(self.patch_size**2 * self.in_chans,
                                     dtype=self.dtype, name="decoder_pred")

    def _pos_embed(self, dim: int) -> jnp.ndarray:
        table = get_2d_sincos_pos_embed(dim, self.grid_size, cls_token=True)
        return jnp.asarray(table[None], dtype=self.dtype)

    def random_masking(self, x, mask_ratio: float, rng):
        n, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (n, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        mask = jnp.ones((n, l), x.dtype).at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def forward_encoder(self, imgs, mask_ratio: float = 0.0, rng=None):
        """imgs (N, 3, H, W) -> tokens (N, 1+L_keep, D), mask, ids_restore."""
        x = self.patch_proj(patchify(imgs.astype(self.dtype), self.patch_size))
        pos = self._pos_embed(self.embed_dim)
        x = x + pos[:, 1:, :]
        if mask_ratio > 0.0:
            x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        else:
            mask = jnp.zeros(x.shape[:2], x.dtype)
            ids_restore = jnp.broadcast_to(jnp.arange(x.shape[1]), x.shape[:2])
        cls = (self.cls_token + pos[:, :1, :]).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1])), x], axis=1)
        if self._use_fused(x):
            from dreamvla_tpu.ops.vit_fused import (fused_vit_layers,
                                                    fused_vit_layers_int8,
                                                    fused_vit_layers_scanned)

            bp = self.variables["params"]
            if "blocks_stacked" in bp:
                # stack_encoder_params serving layout: one scanned kernel
                x = fused_vit_layers_scanned(x, bp["blocks_stacked"],
                                             self.num_heads,
                                             unroll=self.scan_unroll)
            else:
                blocks = [bp[f"blocks_{i}"] for i in range(self.depth)]
                # quantize_encoder_params replaces dense kernels with
                # (int8, scale) pairs — dispatch on that shape
                if isinstance(blocks[0]["attn"]["qkv"]["kernel"],
                              (tuple, list)):
                    x = fused_vit_layers_int8(x, blocks, self.num_heads)
                else:
                    x = fused_vit_layers(x, blocks, self.num_heads)
        else:
            if not self.is_initializing():
                bp = self.variables["params"]
                if "blocks_stacked" in bp:
                    raise RuntimeError(
                        "encoder params are layer-stacked "
                        "(stack_encoder_params) but the fused TPU path is "
                        "not engaged; stacked params only run on the "
                        "scanned fused kernel")
                if isinstance(bp["blocks_0"]["attn"]["qkv"]["kernel"],
                              (tuple, list)):
                    raise RuntimeError(
                        "encoder params are int8-quantized but the fused "
                        "TPU path is not engaged; int8 params only run on "
                        "the fused kernel")
            for blk in self.blocks:
                x = blk(x)
        return self.norm(x), mask, ids_restore

    def _use_fused(self, x) -> bool:
        """Fused-block kernel gate: inference apply on TPU at lane-aligned
        shapes (the unmasked frozen-encoder path; init and CPU runs keep
        the plain block loop). use_pallas=False opts out."""
        if self.is_initializing() or self.use_pallas is False:
            return False
        from dreamvla_tpu.ops.attention import is_tpu_backend
        from dreamvla_tpu.ops.vit_fused import supports_fused

        return (is_tpu_backend()
                and supports_fused(x.shape[0], x.shape[1], x.shape[2],
                                   self.num_heads))

    def forward_decoder(self, x, ids_restore):
        x = self.decoder_embed(x)
        n = x.shape[0]
        l_full = ids_restore.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype),
            (n, l_full + 1 - x.shape[1], self.decoder_embed_dim),
        )
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        x = x + self._pos_embed(self.decoder_embed_dim)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_pred(self.decoder_norm(x))
        return x[:, 1:, :]

    def reconstruction_loss(self, imgs, pred, mask, norm_pix: bool = False):
        target = patchify(imgs, self.patch_size)
        if norm_pix:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def __call__(self, imgs, mask_ratio: float = 0.75, rng=None):
        latent, mask, ids_restore = self.forward_encoder(imgs, mask_ratio, rng)
        pred = self.forward_decoder(latent, ids_restore)
        loss = self.reconstruction_loss(imgs, pred, mask)
        return loss, pred, mask

    def unpatchify(self, x):
        return unpatchify(x, self.patch_size, self.in_chans)
