"""DINOv2(+registers) + SigLIP dual vision encoder (the --use_dinosiglip
alternative).

Capability parity with the reference's timm pair (dreamvla_model.py:479-509,
:675-698): `vit_large_patch14_reg4_dinov2.lvd142m` and
`vit_so400m_patch14_siglip_224`, each tapped at
`get_intermediate_layers(n={len(blocks)-2})` (the second-to-last block's
output, un-normed), patch features concatenated to 2176-d over 256 tokens,
with the DINO cls token as the global descriptor.

Both towers are plain ViTs in Flax:
  * DINOv2-L/14-reg4: 1024-d, 24 blocks, 16 heads, LayerScale, cls + 4
    register tokens (registers get no position embedding);
  * SigLIP-so400m/14: 1152-d, 27 blocks, 16 heads, MLP hidden 4304, no cls
    token, learned position embedding.

Weights import from the released timm checkpoints via `import_timm_vit`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.extract.dinov2 import _interp_pos
from dreamvla_tpu.models.layers import (MlpBlock, MultiHeadSelfAttention,
                                        gelu_exact)


class TimmViTBlock(nn.Module):
    num_heads: int
    mlp_hidden: int
    layerscale: bool = False
    act: object = gelu_exact
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                   use_pallas=self.use_pallas, name="attn")(h)
        if self.layerscale:
            h = h * self.param("ls1_gamma", nn.initializers.constant(1e-5),
                               (d,)).astype(x.dtype)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = MlpBlock(self.mlp_hidden, act=self.act, dtype=self.dtype,
                     name="mlp")(h)
        if self.layerscale:
            h = h * self.param("ls2_gamma", nn.initializers.constant(1e-5),
                               (d,)).astype(x.dtype)
        return x + h


class TimmViT(nn.Module):
    """Generic timm-style ViT tapped at an intermediate block (un-normed)."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_hidden: Optional[int] = None  # default 4*embed_dim
    num_registers: int = 0
    class_token: bool = True
    layerscale: bool = False
    act: object = gelu_exact
    pos_grid: Optional[int] = None  # pretraining pos-emb grid (if different)
    out_block: Optional[int] = None  # default depth-2 (reference tap point)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """imgs (N, 3, H, W) -> (patch tokens (N, L, D), prefix (N, P, D))."""
        from dreamvla_tpu.ops.patchify import patchify

        n = imgs.shape[0]
        grid = self.img_size // self.patch_size
        src_grid = self.pos_grid or grid
        mlp_hidden = self.mlp_hidden or 4 * self.embed_dim
        out_block = self.out_block if self.out_block is not None else self.depth - 2

        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")(
            patchify(imgs.astype(self.dtype), self.patch_size))
        n_prefix_pos = 1 if self.class_token else 0
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, src_grid**2 + n_prefix_pos, self.embed_dim))
        pos_grid_part = pos[:, n_prefix_pos:]
        if src_grid != grid:
            pos_grid_part = _interp_pos(pos_grid_part, src_grid, grid)
        x = x + pos_grid_part.astype(x.dtype)

        prefix = []
        if self.class_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.embed_dim))
            prefix.append(jnp.broadcast_to(
                (cls + pos[:, :1]).astype(x.dtype), (n, 1, self.embed_dim)))
        if self.num_registers:
            regs = self.param("reg_token", nn.initializers.zeros,
                              (1, self.num_registers, self.embed_dim))
            prefix.append(jnp.broadcast_to(
                regs.astype(x.dtype), (n, self.num_registers, self.embed_dim)))
        n_prefix = sum(p.shape[1] for p in prefix)
        x = jnp.concatenate(prefix + [x], axis=1) if prefix else x

        for i in range(out_block + 1):
            x = TimmViTBlock(self.num_heads, mlp_hidden,
                             layerscale=self.layerscale, act=self.act,
                             dtype=self.dtype,
                             use_pallas=self.use_pallas, name=f"blocks_{i}")(x)
        return x[:, n_prefix:], x[:, :n_prefix]


def dinov2_vit_l_reg4(**kw) -> TimmViT:
    base = dict(embed_dim=1024, depth=24, num_heads=16, num_registers=4,
                class_token=True, layerscale=True, pos_grid=37)
    base.update(kw)
    return TimmViT(**base)


def siglip_so400m(**kw) -> TimmViT:
    # SigLIP towers use tanh-approximated gelu everywhere (original big_vision
    # JAX impl and the HF SiglipVisionModel port, hidden_act
    # "gelu_pytorch_tanh"); exact-erf gelu here was a parity bug caught by
    # the HF-oracle test (tests/test_dinosiglip_oracle.py).
    from dreamvla_tpu.models.layers import gelu_tanh

    base = dict(embed_dim=1152, depth=27, num_heads=16, mlp_hidden=4304,
                class_token=False, layerscale=False, act=gelu_tanh)
    base.update(kw)
    return TimmViT(**base)


class DinoSigLIPEncoder(nn.Module):
    """Concat DINOv2-L + SigLIP patch features (2176-d over 256 tokens)."""

    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    dino_kw: dict = None
    siglip_kw: dict = None

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dino = dinov2_vit_l_reg4(dtype=self.dtype, use_pallas=self.use_pallas,
                                 **(self.dino_kw or {}))
        siglip = siglip_so400m(dtype=self.dtype, use_pallas=self.use_pallas,
                               **(self.siglip_kw or {}))
        d_patches, d_prefix = dino.copy(name="dino")(imgs)
        s_patches, _ = siglip.copy(name="siglip")(imgs)
        feats = jnp.concatenate([d_patches, s_patches], axis=-1)
        return feats, d_prefix[:, 0]  # dino cls token


def import_timm_vit(sd, depth: int, layerscale: bool = False,
                    out_block: Optional[int] = None):
    """timm ViT state dict -> TimmViT params (only blocks up to the tap)."""
    from dreamvla_tpu.utils.torch_import import _Importer

    im = _Importer(sd)
    w = im.take("patch_embed.proj.weight")
    if w is not None:
        im.assign(("patch_embed", "kernel"),
                  w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]))
    im.assign(("patch_embed", "bias"), im.take("patch_embed.proj.bias"))
    if "cls_token" in sd:
        im.raw("cls_token", ("cls_token",))
    if "reg_token" in sd:
        im.raw("reg_token", ("reg_token",))
    pe = im.take("pos_embed")
    if pe is not None:
        import numpy as np

        # timm's reg4-dinov2 configs use no_embed_class: pos_embed covers
        # the patch grid only (a perfect-square row count) and the cls
        # row's position is pre-folded into cls_token by the checkpoint
        # conversion. TimmViT computes cls + pos[:, :1], so prepend a zero
        # row — mathematically identical. HF-style dicts (grid**2 + 1 rows,
        # never a perfect square) pass through unchanged.
        n_tok = pe.shape[1]
        r = int(round(n_tok ** 0.5))
        if "cls_token" in sd and r * r == n_tok:
            pe = np.concatenate([np.zeros_like(pe[:, :1]), pe], axis=1)
        im.assign(("pos_embed",), pe)
    last = (out_block if out_block is not None else depth - 2)
    for i in range(last + 1):
        tp, p = f"blocks.{i}", (f"blocks_{i}",)
        im.layernorm(f"{tp}.norm1", p + ("norm1",))
        im.dense(f"{tp}.attn.qkv", p + ("attn", "qkv"))
        im.dense(f"{tp}.attn.proj", p + ("attn", "proj"))
        im.layernorm(f"{tp}.norm2", p + ("norm2",))
        im.dense(f"{tp}.mlp.fc1", p + ("mlp", "fc1"))
        im.dense(f"{tp}.mlp.fc2", p + ("mlp", "fc2"))
        if layerscale:
            im.raw(f"{tp}.ls1.gamma", p + ("ls1_gamma",))
            im.raw(f"{tp}.ls2.gamma", p + ("ls2_gamma",))
    # tail blocks + head/norm are beyond the tap point: mark consumed
    im.used.update(k for k in sd if k.startswith(
        tuple(f"blocks.{j}." for j in range(last + 1, depth))))
    im.used.update(k for k in sd if k.startswith(("norm.", "head", "attn_pool")))
    return im.out, im.missing, im.unexpected()
