"""CLIP ViT-B/32 text tower (frozen instruction encoder).

Capability parity with the reference's use of the external `clip` package
(`clip.load("ViT-B/32")`, dreamvla_model.py:511-514; `encode_text` at
:643-652): token embedding (49408 x 512), learned positional embedding (77),
12 pre-LN blocks (width 512, 8 heads, QuickGELU MLP), causal mask, final LN,
EOT-token pooling (argmax over token ids) and a 512->512 text projection.

The trunk consumes the 512-d sentence embedding through a linear projector,
so this module is the full text path. Weights import from the released CLIP
checkpoint via `dreamvla_tpu.utils.torch_import`. Tokenisation lives in
`dreamvla_tpu.data.tokenizer` (host-side, not jitted).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dreamvla_tpu.models.layers import quick_gelu
from dreamvla_tpu.ops.attention import multi_head_attention


class CLIPTextBlock(nn.Module):
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, bias):
        b, l, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return jnp.moveaxis(t.reshape(b, l, self.heads, d // self.heads), 1, 2)

        o = multi_head_attention(
            heads_first(q), heads_first(k), heads_first(v), bias=bias,
            use_pallas=self.use_pallas,
        )
        o = jnp.moveaxis(o, 1, 2).reshape(b, l, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        m = nn.Dense(4 * d, dtype=self.dtype, name="mlp_c_fc")(h)
        m = quick_gelu(m)
        return x + nn.Dense(d, dtype=self.dtype, name="mlp_c_proj")(m)


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, 77) int32 -> (B, embed_dim) EOT-pooled features."""
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb.astype(self.dtype)

        causal = np.triu(np.full((self.context_length, self.context_length), -1e9), k=1)
        bias = jnp.asarray(causal, dtype=jnp.float32)
        for i in range(self.layers):
            x = CLIPTextBlock(
                self.heads, dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"resblocks_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj.astype(pooled.dtype)
