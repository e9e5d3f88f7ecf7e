"""Shared transformer building blocks (Flax).

One block implementation serves the MAE ViT encoder, the per-modality
decoders, and the DiT action head — they are all pre-LN ViT blocks in the
reference (timm `Block`, used at models/vit_mae.py:73-75,
dreamvla_model.py:348-439, action_model/models.py:123-139). Attention
dispatches to the Pallas flash kernel on TPU via
`dreamvla_tpu.ops.attention.multi_head_attention`.

Parameter naming mirrors the torch module tree (qkv / proj / fc1 / fc2 /
norm1 / norm2) so the checkpoint importer is a mechanical key map.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.ops.attention import multi_head_attention


def gelu_exact(x):
    return nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return nn.gelu(x, approximate=True)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class MlpBlock(nn.Module):
    """fc1 -> act -> fc2 (timm Mlp / GPT2MLP / CLIP mlp)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu_exact
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc1")(x)
        x = self.act(x)
        return nn.Dense(out_dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="fc2")(x)


class MultiHeadSelfAttention(nn.Module):
    """Fused-QKV self-attention with optional shared additive bias."""

    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, bias=None):
        b, l, d = x.shape
        if d % self.num_heads:
            raise ValueError(f"dim {d} not divisible by heads {self.num_heads}")
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))  # (b,h,l,hd)
        o = multi_head_attention(q, k, v, bias=bias, use_pallas=self.use_pallas)
        o = jnp.moveaxis(o, 1, 2).reshape(b, l, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(o)


class ViTBlock(nn.Module):
    """Pre-LN transformer block (timm `Block` semantics, LN eps=1e-6)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, bias=None):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadSelfAttention(
            self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn")(h, bias=bias)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        x = x + MlpBlock(int(d * self.mlp_ratio), act=self.act,
                         dtype=self.dtype, name="mlp")(h)
        return x
