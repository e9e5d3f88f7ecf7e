"""GPT-2 style causal trunk (embeddings-in, hidden-states-out).

Capability parity with reference `models/gpt2.py` (a trimmed HF GPT-2 that
only consumes `inputs_embeds` plus a custom additive float mask; no token /
position embedding tables, no KV cache): pre-LN blocks of
[LN -> fused-QKV attention -> residual -> LN -> MLP(gelu_new) -> residual],
final LN, dropout p=0.1 on embeddings / attention / residuals when training
(HF GPT2Config defaults, active in the reference because the model trains in
`.train()` mode).

TPU design deltas:
  * the (L, L) additive mask is passed once and consumed inside the Pallas
    flash-attention kernel — never expanded to (B, 1, L, L) in HBM
    (reference expands per batch at dreamvla_model.py:768-775);
  * weights live as (in, out) Dense kernels; the importer transposes HF
    Conv1D weights (which are already (in, out)) as needed;
  * optional `remat` wraps each block in jax.checkpoint — the reference
    plumbs gradient checkpointing but never enables it (gpt2.py:439).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.models.layers import gelu_tanh
from dreamvla_tpu.ops.attention import (BlockSplit, multi_head_attention,
                                        reordered_attention)


class GPT2Attention(nn.Module):
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    split: Optional[BlockSplit] = None

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        b, l, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return jnp.moveaxis(t.reshape(b, l, self.num_heads, hd), 1, 2)

        if self.split is not None and bias is not None:
            # inputs arrive TOKEN-REORDERED ([A | query | action], see
            # ops.attention.token_permutation): the exact role-split
            # decomposition then uses contiguous slices only
            o = reordered_attention(
                heads_first(q), heads_first(k), heads_first(v), bias,
                self.split, use_pallas=self.use_pallas,
            )
        else:
            o = multi_head_attention(
                heads_first(q), heads_first(k), heads_first(v), bias=bias,
                use_pallas=self.use_pallas,
            )
        o = jnp.moveaxis(o, 1, 2).reshape(b, l, d)
        o = nn.Dense(d, dtype=self.dtype, name="c_proj")(o)
        return nn.Dropout(self.dropout, deterministic=deterministic)(o)


class GPT2Block(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    dropout: float = 0.1
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    split: Optional[BlockSplit] = None

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_1")(x)
        x = x + GPT2Attention(
            self.num_heads, self.dropout, dtype=self.dtype,
            use_pallas=self.use_pallas, split=self.split, name="attn",
        )(h, bias=bias, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_2")(x)
        m = nn.Dense(self.mlp_ratio * d, dtype=self.dtype, name="mlp_c_fc")(h)
        m = gelu_tanh(m)
        m = nn.Dense(d, dtype=self.dtype, name="mlp_c_proj")(m)
        m = nn.Dropout(self.dropout, deterministic=deterministic)(m)
        return x + m


class GPT2Trunk(nn.Module):
    num_layers: int = 24
    num_heads: int = 16
    dropout: float = 0.1
    ln_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    split: Optional[BlockSplit] = None
    # scan unroll for the layer-stacked serving apply (bit-equal; see
    # ops/gpt2_fused.py::fused_gpt2_layers_scanned)
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, inputs_embeds, bias=None, deterministic: bool = True,
                 fused: bool = False, pipeline=None):
        """inputs_embeds: (B, L, D); bias: optional (L, L) additive mask.

        fused=True requests the whole-block Pallas kernels on TPU applies
        of a role-split (token-reordered) trunk: deterministic applies use
        the forward-only inference kernel (ops.gpt2_fused, optionally
        int8); non-deterministic (training) applies use the differentiable
        train kernels (ops.gpt2_fused_train — in-kernel dropout + fused
        backward under custom_vjp). Off-TPU or on unsupported shapes the
        unfused path runs instead.

        pipeline, when set, replaces the sequential block loop with a
        parallel apply over the raw trunk param subtree — pipeline-parallel
        (parallel.pp.build_trunk_pipeline, reads the stage-stacked
        'pp_stages' subtree) or sequence-parallel
        (parallel.sp.build_sp_trunk_apply, reads the per-layer h_i keys).
        """
        x = nn.Dropout(self.dropout, deterministic=deterministic, name="drop")(
            inputs_embeds
        )
        if pipeline is not None and not self.is_initializing():
            rng = (self.make_rng("dropout")
                   if (not deterministic and self.dropout > 0.0) else None)
            x = pipeline(self.variables["params"], x, bias,
                         deterministic, rng)
            return nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                name="ln_f")(x)
        if (fused and not self.is_initializing()
                and bias is not None and self.split is not None):
            from dreamvla_tpu.ops.attention import is_tpu_backend
            from dreamvla_tpu.ops.gpt2_fused import (fused_gpt2_layers,
                                                     supports_fused_trunk)

            sp = self.split
            n_a, n_q = sp.k * sp.na, sp.k * (sp.na + sp.nobs)
            bp = self.variables["params"]
            # stack_trunk_params serving layout: one kernel under lax.scan
            stacked = "h_stacked" in bp
            probe = (bp["h_stacked"] if stacked else bp["h_0"])
            quantized = isinstance(probe["attn"]["c_attn"]["kernel"],
                                   (tuple, list))
            if (is_tpu_backend() and supports_fused_trunk(
                    x.shape[1], x.shape[2], self.num_heads, n_a, n_q)
                    and (deterministic or not (quantized or stacked))):
                from dreamvla_tpu.ops.gpt2_fused import (
                    fused_gpt2_layers_int8, fused_gpt2_layers_scanned)
                from dreamvla_tpu.ops.gpt2_fused_train import (
                    fused_gpt2_train_layers)

                if stacked:
                    x = fused_gpt2_layers_scanned(
                        x, bp["h_stacked"], bias, n_a, n_q,
                        self.num_heads, eps=self.ln_eps,
                        unroll=self.scan_unroll)
                    return nn.LayerNorm(epsilon=self.ln_eps,
                                        dtype=self.dtype, name="ln_f")(x)
                blocks = [bp[f"h_{i}"] for i in range(self.num_layers)]
                if not deterministic:
                    # training apply: differentiable train kernels with
                    # in-kernel hash-mask dropout (one fresh (2,) seed per
                    # step via the module's dropout rng stream)
                    if self.dropout > 0.0:
                        seeds = jax.random.randint(
                            self.make_rng("dropout"), (2,),
                            jnp.iinfo(jnp.int32).min,
                            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                    else:
                        seeds = jnp.zeros((2,), jnp.int32)
                    x = fused_gpt2_train_layers(
                        x, tuple(blocks), bias, seeds, n_a, n_q,
                        self.num_heads, self.ln_eps, self.dropout)
                # quantize_trunk_params replaces each dense kernel with an
                # (int8, scale) pair — dispatch on that shape
                elif quantized:
                    x = fused_gpt2_layers_int8(x, blocks, bias, n_a, n_q,
                                               self.num_heads,
                                               eps=self.ln_eps)
                else:
                    x = fused_gpt2_layers(x, blocks, bias, n_a, n_q,
                                          self.num_heads, eps=self.ln_eps)
                return nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                    name="ln_f")(x)
        if not self.is_initializing():
            bp = self.variables["params"]
            if "h_stacked" in bp:
                raise RuntimeError(
                    "trunk params are layer-stacked (stack_trunk_params) "
                    "but the fused TPU inference path is not engaged "
                    f"(fused={fused}, deterministic={deterministic}); "
                    "stacked params only run on the scanned fused kernel — "
                    "pass the per-layer tree for training/CPU/unfused "
                    "applies")
            if "h_0" in bp and isinstance(
                    bp["h_0"]["attn"]["c_attn"]["kernel"], (tuple, list)):
                raise RuntimeError(
                    "trunk params are int8-quantized (quantize_trunk_params) "
                    "but the fused TPU inference path is not engaged "
                    f"(fused={fused}, deterministic={deterministic}); int8 "
                    "params only run on the fused kernel — pass unquantized "
                    "params for training/CPU/unfused applies")
        block_cls = GPT2Block
        if self.remat:
            block_cls = nn.remat(GPT2Block, static_argnums=(3,))
        for i in range(self.num_layers):
            x = block_cls(
                self.num_heads, dropout=self.dropout, ln_eps=self.ln_eps,
                dtype=self.dtype, use_pallas=self.use_pallas,
                split=self.split, name=f"h_{i}",
            )(x, bias, deterministic)
        return nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln_f")(x)
