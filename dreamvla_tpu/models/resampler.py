"""Perceiver resampler: N image tokens -> num_latents query tokens.

Capability parity with reference `models/perceiver_resampler.py`
(PerceiverResampler / PerceiverAttention / FeedForward): cross-attention from
learned latents to [media tokens ; latents], pre-LN, no-bias projections,
residual latents, final LN.

TPU design: the reference carries (b, T, F, v) media axes through einops; in
this stack the caller always flattens batch*time before resampling (the model
runs one resample per frame), so the module is simply (B, N, D) -> (B, L, D)
and vmap/batching handles the rest — fewer reshapes, one attention kernel
call per layer over the full batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.ops.attention import multi_head_attention


class PerceiverAttentionLayer(nn.Module):
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, latents):
        """x: (B, N, D) media tokens; latents: (B, L, D)."""
        b, n, d = x.shape
        l = latents.shape[1]
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(dtype=self.dtype, name="norm_media")(x)
        latents = nn.LayerNorm(dtype=self.dtype, name="norm_latents")(latents)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return jnp.moveaxis(t.reshape(b, -1, self.heads, self.dim_head), 1, 2)

        o = multi_head_attention(
            heads_first(q), heads_first(k), heads_first(v),
            use_pallas=self.use_pallas,
        )
        o = jnp.moveaxis(o, 1, 2).reshape(b, l, inner)
        return nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_out")(o)


class PerceiverFeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(int(d * self.mult), use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, use_bias=False, dtype=self.dtype, name="fc2")(x)


class PerceiverResampler(nn.Module):
    dim: int
    depth: int = 3
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 16
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, N, dim) -> (B, num_latents, dim)."""
        latents = self.param(
            "latents", nn.initializers.normal(1.0), (self.num_latents, self.dim)
        )
        lat = jnp.broadcast_to(
            latents.astype(x.dtype), (x.shape[0], self.num_latents, self.dim)
        )
        for i in range(self.depth):
            lat = PerceiverAttentionLayer(
                self.dim_head, self.heads, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"layers_{i}_attn")(x, lat) + lat
            lat = PerceiverFeedForward(
                self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(lat) + lat
        return nn.LayerNorm(dtype=self.dtype, name="norm")(lat)
