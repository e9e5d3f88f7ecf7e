"""Per-modality "dream" decoders: query tokens -> dense predictions.

Capability parity with the reference's five decoder stacks
(dreamvla_model.py:336-439 construction, :793-911 forward): project the
trunk's dream-query outputs, append learned mask tokens, add a fixed 2-D
sin-cos position table ([query grid ; mask grid], dreamvla_model.py:543-576;
the SAM decoder's table intentionally stays zero, :558-564), run 2 ViT
blocks (16 heads), LayerNorm the mask-token outputs and linearly predict the
modality (RGB patches / depth patches [+ReLU] / DINO 768-d / SAM 256-d /
flow 2-d-or-packed).

TPU design: one shared module class for all modalities; the caller batches
(B*S*views) leading dims so both ViT blocks are single large MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dreamvla_tpu.models.layers import ViTBlock
from dreamvla_tpu.ops.posemb import get_2d_sincos_pos_embed


def _square_grid_pos(dim: int, count: int) -> np.ndarray:
    grid = int(count**0.5)
    table = get_2d_sincos_pos_embed(dim, grid, cls_token=False)
    if table.shape[0] != count:
        raise ValueError(f"token count {count} is not a square grid")
    return table


class ModalityDecoder(nn.Module):
    num_query_tokens: int  # query tokens fed per decode (per image/view)
    num_mask_tokens: int  # mask tokens = prediction slots
    out_dim: int
    hidden_dim: int = 1024
    in_dim: Optional[int] = None  # defaults to hidden_dim (share_query slices differ)
    num_heads: int = 16
    depth: int = 2
    relu_out: bool = False
    sincos_pos: bool = True  # False: zero pos table (reference SAM decoder)
    return_features: bool = False  # True: raw block outputs (DPT head input)
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    # TPU-side: run the 2-block stack through the differentiable fused
    # whole-block kernels (ops.vit_fused_train — the decoders TRAIN, unlike
    # the frozen encoder). cfg.fused_decoder_train is the escape hatch.
    fused: bool = True

    @nn.compact
    def __call__(self, queries: jnp.ndarray) -> jnp.ndarray:
        """queries: (N, num_query_tokens, in_dim) -> (N, num_mask_tokens, out_dim)."""
        n = queries.shape[0]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="projector")(
            queries.astype(self.dtype)
        )
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.hidden_dim)
        )
        masks = jnp.broadcast_to(
            mask_token.astype(x.dtype), (n, self.num_mask_tokens, self.hidden_dim)
        )
        x = jnp.concatenate([x, masks], axis=1)
        if self.sincos_pos:
            table = np.concatenate(
                [
                    _square_grid_pos(self.hidden_dim, self.num_query_tokens),
                    _square_grid_pos(self.hidden_dim, self.num_mask_tokens),
                ],
                axis=0,
            )
            x = x + jnp.asarray(table, x.dtype)[None]
        if self._use_fused(x):
            from dreamvla_tpu.ops.vit_fused_train import fused_vit_train_layers

            bp = self.variables["params"]
            blocks = tuple(bp[f"blocks_{i}"] for i in range(self.depth))
            x = fused_vit_train_layers(x, blocks, self.num_heads, 1e-5)
        else:
            for i in range(self.depth):
                # reference decoders build timm Blocks with default LN eps
                # (1e-5)
                x = ViTBlock(self.num_heads, ln_eps=1e-5, dtype=self.dtype,
                             use_pallas=self.use_pallas, name=f"blocks_{i}")(x)
        if self.return_features:
            return x  # (N, num_query+num_mask, hidden) for the DPT head
        x = x[:, -self.num_mask_tokens:, :]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="pred")(x)
        if self.relu_out:
            x = nn.relu(x)
        return x

    def _use_fused(self, x) -> bool:
        """Fused-block gate: TPU applies at supported shapes (differentiable
        — train AND inference applies qualify, unlike the frozen-encoder
        forward-only kernel). Init and CPU runs keep the plain block loop;
        `fused=False` opts out (`use_pallas` only steers the unfused
        blocks' attention, mirroring GPT2Trunk's gate)."""
        if self.is_initializing() or not self.fused:
            return False
        from dreamvla_tpu.ops.attention import is_tpu_backend
        from dreamvla_tpu.ops.vit_fused_train import supports_fused_train

        return (is_tpu_backend()
                and supports_fused_train(x.shape[0], x.shape[1], x.shape[2],
                                         self.num_heads))
