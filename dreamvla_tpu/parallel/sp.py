"""Sequence-parallel trunk (ring attention) on a (dp, sp) device mesh.

Fourth scaling regime next to dp (`parallel/train_step.py`), dp x fsdp
(`parallel/fsdp.py`), dp x tp (`parallel/tp.py`) and dp x pp
(`parallel/pp.py`): the trunk's TOKEN axis is sharded over 'sp'. Every
per-token op (LN, QKV/proj/MLP matmuls, residuals, dropout) runs
unchanged on the local token shard; only attention needs cross-shard
data, and it gets it TPU-natively as ring attention — K/V shards rotate
one hop per step via `ppermute` (riding ICI) while each device folds
the visiting block into an online-softmax accumulator (running max,
normaliser, weighted value sum). The result is EXACT dense attention
under the model's additive (L, L) mask, reassociated — no approximation
— so the backward (derived by AD through the scan + ppermute ring) is
the exact gradient too.

At the flagship L=930 this is optional headroom; it is the regime that
keeps long-horizon variants (window 12+ -> L~3.7k, quadratic score
memory) scalable without touching model code: the same GPT2Trunk
`pipeline=` hook used by pp.py injects it.

The block math below intentionally mirrors models/gpt2.py's GPT2Block
(pre-LN -> fused-QKV attn -> residual -> pre-LN -> gelu_tanh MLP ->
residual, fp32 softmax and LN stats) on raw param leaves;
tests/test_sp.py pins per-parameter grad parity against the sequential
trunk so the two cannot drift apart silently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dreamvla_tpu.config import DreamVLAConfig
from dreamvla_tpu.models.layers import gelu_tanh


def make_sp_mesh(n_dp: int, n_sp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[: n_dp * n_sp].reshape(n_dp, n_sp), ("dp", "sp"))


def build_sp_train_step(model, tcfg, tx, mesh: Mesh, donate: bool = True):
    """jitted step(state, batch, rng) -> (state, LossOutputs) with the
    trunk running sequence-parallel: batch (accum, B, ...) sharded over
    'dp' at dim 1 (parallel.mesh.shard_batch), state replicated — only the
    trunk region re-shards its token axis over 'sp'. Same contract as
    parallel/fsdp.py's step."""
    import optax

    from dreamvla_tpu.parallel.train_step import (TrainState,
                                                  accumulate_grads,
                                                  make_loss_fn)

    sp_apply = build_sp_trunk_apply(model.cfg, mesh)
    loss_fn = make_loss_fn(model, tcfg, trunk_pipeline=sp_apply)

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, losses = accumulate_grads(loss_fn, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state), losses)

    # shardings come from the arrays (caller: state replicated, batch via
    # shard_batch); GSPMD propagates around the trunk's shard_map region
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _layer_norm(p, x, eps: float, dt):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dt)


def _dense(p, x, dt):
    return (x @ p["kernel"].astype(dt) + p["bias"].astype(dt))


def _dropout(x, rate: float, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def ring_attention(q, k, v, bias_rows, sp_axis: str, n_sp: int, sid,
                   ring) -> jnp.ndarray:
    """Exact attention over a token-sharded sequence.

    q, k, v: (B, H, Lc, hd) local shards (Lc = L / n_sp); bias_rows:
    (Lc, L) — this rank's query rows of the global additive mask. K/V
    rotate the ring; scores/normalisers accumulate in fp32 exactly like
    ops.attention.mha_reference.
    """
    scale = q.shape[-1] ** -0.5
    lc = q.shape[2]
    qf = q.astype(jnp.float32)

    def step(carry, t):
        m, l, acc, kc, vc = carry
        kv_rank = (sid - t) % n_sp  # owner of the currently held shard
        b = jax.lax.dynamic_slice(bias_rows, (0, kv_rank * lc),
                                  (lc, lc)).astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32)) * scale
        s = s + b
        m_new = jnp.maximum(m, s.max(-1))
        # m starts at -inf; after the first block it is finite (the mask
        # uses finite NEG_INF), so exp(m - m_new) is well-defined
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * corr + p.sum(-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
        kc = jax.lax.ppermute(kc, sp_axis, ring)
        vc = jax.lax.ppermute(vc, sp_axis, ring)
        return (m_new, l, acc, kc, vc), None

    b_, h_, _, d_ = q.shape
    carry = (jnp.full((b_, h_, lc), -jnp.inf, jnp.float32),
             jnp.zeros((b_, h_, lc), jnp.float32),
             jnp.zeros((b_, h_, lc, d_), jnp.float32), k, v)
    (_, l, acc, _, _), _ = jax.lax.scan(step, carry, jnp.arange(n_sp))
    return (acc / l[..., None]).astype(q.dtype)


def build_sp_trunk_apply(cfg: DreamVLAConfig, mesh: Mesh,
                         sp_axis: str = "sp", dp_axis: str = "dp"):
    """Returns apply(trunk_params, x, bias, deterministic, rng) for
    GPT2Trunk's `pipeline=` hook: x (B, L, D) with B sharded over 'dp'
    and L over 'sp'; trunk params replicated (compose with fsdp for
    weight sharding); bias (L, L) row-sharded over 'sp'."""
    n_sp = mesh.shape[sp_axis]
    dt = jnp.dtype(cfg.compute_dtype)
    nh = cfg.transformer_heads
    n_layers = cfg.transformer_layers
    eps = 1e-5
    rate = cfg.dropout
    ring = [(i, (i + 1) % n_sp) for i in range(n_sp)]

    def block_fwd(p, x, bias_rows, sid, li, rng, det: bool):
        b, lc, d = x.shape
        hd = d // nh

        def heads_first(t):
            return jnp.moveaxis(t.reshape(b, lc, nh, hd), 1, 2)

        h = _layer_norm(p["ln_1"], x, eps, dt)
        qkv = _dense(p["attn"]["c_attn"], h, dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = ring_attention(heads_first(q), heads_first(k), heads_first(v),
                           bias_rows, sp_axis, n_sp, sid, ring)
        o = jnp.moveaxis(o, 1, 2).reshape(b, lc, d)
        o = _dense(p["attn"]["c_proj"], o, dt)
        if not det and rate > 0.0:
            o = _dropout(o, rate, jax.random.fold_in(rng, 2 * li))
        x = x + o
        h = _layer_norm(p["ln_2"], x, eps, dt)
        m = gelu_tanh(_dense(p["mlp_c_fc"], h, dt))
        m = _dense(p["mlp_c_proj"], m, dt)
        if not det and rate > 0.0:
            m = _dropout(m, rate, jax.random.fold_in(rng, 2 * li + 1))
        return x + m

    def apply_fn(trunk_params, x, bias, deterministic: bool, rng):
        det = bool(deterministic)
        if rng is None:
            rng = jax.random.PRNGKey(0)  # unused when det / rate 0
        if bias is None:
            bias = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
        if x.shape[1] % n_sp:
            raise ValueError(f"sequence length {x.shape[1]} not divisible "
                             f"by sp={n_sp}")
        layers = [trunk_params[f"h_{i}"] for i in range(n_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

        def spmd(stacked_l, x_l, bias_l, rng_l):
            sid = jax.lax.axis_index(sp_axis)
            # fold the shard id so dropout draws differ per token shard
            rloc = jax.random.fold_in(rng_l, sid)

            def layer(h, xs):
                p, li = xs
                return block_fwd(p, h, bias_l, sid, li, rloc, det), None

            h, _ = jax.lax.scan(layer, x_l,
                                (stacked_l, jnp.arange(n_layers)))
            return h

        return shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), P(dp_axis, sp_axis), P(sp_axis), P()),
            out_specs=P(dp_axis, sp_axis),
            check_vma=False,
        )(stacked, x, bias, rng)

    return apply_fn
