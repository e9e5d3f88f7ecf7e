"""Pipeline-parallel trunk training (GPipe) on a (dp, pp) device mesh.

The reference scales with DDP only (SURVEY §2.5 / reference `train.py`
NCCL init); everything fits one A100 at DreamVLA sizes. For fleets of
smaller chips this module adds the third classic regime next to
`parallel/train_step.py` (dp) and `parallel/fsdp.py` (dp x fsdp):
pipeline parallelism over the GPT-2 trunk — the parameter-dominant
component (24 x 12.6 M) and the only deep sequential chain in the model.

TPU-native design (no hand-scheduled 1F1B, no NCCL send/recv threads):

  * trunk block params are re-stacked to one `pp_stages` subtree with
    leaves (n_stages, layers_per_stage, ...) and sharded over the mesh's
    'pp' axis at dim 0 — device column i holds stage i's blocks only;
  * the pipeline itself is ~40 lines inside ONE `shard_map`: a
    `lax.scan` over M + S - 1 ticks where every tick applies the local
    stage to the circulating activation and `ppermute` rotates
    activations one stage down the ring (riding ICI);
  * stage 0 injects microbatch t at tick t, stage S-1 collects
    microbatch t-(S-1); a final masked `psum` broadcasts the collected
    outputs back to every pp rank so the (small) heads + losses run
    replicated over 'pp' — no separate schedule for them;
  * the BACKWARD pipeline is not written at all: `jax.grad` of this
    forward IS the reverse-order pipeline (the transpose of `ppermute`
    is the inverted permutation, the transpose of `scan` is the
    reversed scan), so fwd and bwd stay automatically consistent.

Everything outside the trunk (frozen encoders, resampler, decoders,
losses, AdamW) is untouched: the step is jitted with GSPMD shardings
exactly like `parallel/fsdp.py`, and the global-norm grad clip inside
the optimizer is computed on the GLOBAL (stage-sharded) gradient tree —
XLA inserts the cross-stage reduction.

GPipe bubble: S-1 of M+S-1 ticks per stage run on fill/drain garbage
(zeros); choose n_micro >= ~4x n_stages to keep the bubble small.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.models.gpt2 import GPT2Block
from dreamvla_tpu.parallel.train_step import (TrainState, accumulate_grads,
                                              create_train_state,
                                              make_loss_fn)
from dreamvla_tpu.train.optimizer import build_optimizer


def make_pp_mesh(n_dp: int, n_pp: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices[: n_dp * n_pp].reshape(n_dp, n_pp), ("dp", "pp"))


# --------------------------------------------------------------- params
def stack_trunk_stages(params, n_stages: int):
    """h_0..h_{L-1} -> one 'pp_stages' subtree with leaves
    (n_stages, L/n_stages, ...). Everything else (ln_f, embedding dropout)
    is left in place; flax ignores the now-unused h_i key absence because
    the pipelined apply never visits the block submodules."""
    tb = dict(params["transformer_backbone"])
    n_layers = len([k for k in tb if k.startswith("h_")])
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} trunk layers not divisible into "
                         f"{n_stages} stages")
    lps = n_layers // n_stages
    layers = [tb.pop(f"h_{i}") for i in range(n_layers)]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(
            [jnp.stack(xs[s * lps:(s + 1) * lps]) for s in range(n_stages)]),
        *layers)
    tb["pp_stages"] = stacked
    out = dict(params)
    out["transformer_backbone"] = tb
    return out


def unstack_trunk_stages(params):
    """Inverse of stack_trunk_stages (checkpoint interop: orbax trees and
    the torch exporter expect per-layer h_i keys)."""
    tb = dict(params["transformer_backbone"])
    stacked = tb.pop("pp_stages")
    n_stages, lps = jax.tree.leaves(stacked)[0].shape[:2]
    for s in range(n_stages):
        for j in range(lps):
            tb[f"h_{s * lps + j}"] = jax.tree.map(
                lambda t, s=s, j=j: t[s, j], stacked)
    out = dict(params)
    out["transformer_backbone"] = tb
    return out


def _trunk_block(cfg: DreamVLAConfig) -> GPT2Block:
    """One trunk block module, configured exactly as DreamVLA.setup builds
    its GPT2Trunk (models/dreamvla.py:148-157)."""
    from dreamvla_tpu.ops.attention import BlockSplit

    split = None
    if cfg.trunk_token_reorder and cfg.total_query_tokens > 0:
        split = BlockSplit(k=cfg.sequence_length, na=cfg.num_a,
                           nobs=cfg.total_query_tokens,
                           aps=cfg.action_pred_steps)
    return GPT2Block(num_heads=cfg.transformer_heads, dropout=cfg.dropout,
                     dtype=jnp.dtype(cfg.compute_dtype), split=split)


# ------------------------------------------------------------- pipeline
def build_trunk_pipeline(cfg: DreamVLAConfig, mesh: Mesh, n_micro: int,
                         pp_axis: str = "pp", dp_axis: str = "dp"):
    """Returns pipeline(trunk_params, x, bias, deterministic, rng) for
    GPT2Trunk's `pipeline=` hook: x (B, L, D) with B sharded over dp,
    trunk_params carrying the 'pp_stages' subtree (stack_trunk_stages)
    sharded over pp at dim 0."""
    block = _trunk_block(cfg)
    n_stages = mesh.shape[pp_axis]
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pipeline(trunk_params, x, bias, deterministic: bool, rng):
        stages = trunk_params["pp_stages"]
        det = bool(deterministic)
        if rng is None:
            rng = jax.random.PRNGKey(0)  # unused when det
        if bias is None:
            bias = jnp.zeros((x.shape[1], x.shape[1]), x.dtype)

        def spmd(stages_l, x_l, bias_l, rng_l):
            sid = jax.lax.axis_index(pp_axis)
            stages_l = jax.tree.map(lambda t: t[0], stages_l)  # (lps, ...)
            lps = jax.tree.leaves(stages_l)[0].shape[0]
            bl = x_l.shape[0]
            if bl % n_micro:
                raise ValueError(
                    f"local batch {bl} not divisible by n_micro={n_micro}")
            mb = x_l.reshape(n_micro, bl // n_micro, *x_l.shape[1:])

            def stage_apply(h, t):
                def body(h, xs):
                    p, i = xs
                    if det:
                        return block.apply({"params": p}, h, bias_l,
                                           True), None
                    r = jax.random.fold_in(
                        jax.random.fold_in(rng_l, sid * 4099 + i), t)
                    return block.apply({"params": p}, h, bias_l, False,
                                       rngs={"dropout": r}), None

                h, _ = jax.lax.scan(body, h, (stages_l, jnp.arange(lps)))
                return h

            def tick(carry, t):
                buf, out = carry
                # stage 0 injects microbatch t (clamped re-reads past M are
                # never collected: their outputs would land at j >= M)
                inj = mb[jnp.clip(t, 0, n_micro - 1)]
                cur = jnp.where(sid == 0, inj, buf)
                y = stage_apply(cur, t)
                # stage S-1 collects microbatch j = t - (S-1)
                j = t - (n_stages - 1)
                jc = jnp.clip(j, 0, n_micro - 1)
                prev = jax.lax.dynamic_index_in_dim(out, jc, 0,
                                                    keepdims=False)
                keep = jnp.where((sid == n_stages - 1) & (j >= 0), y, prev)
                out = jax.lax.dynamic_update_index_in_dim(out, keep, jc, 0)
                buf = jax.lax.ppermute(y, pp_axis, ring)
                return (buf, out), None

            carry = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
            (_, out), _ = jax.lax.scan(tick, carry,
                                       jnp.arange(n_micro + n_stages - 1))
            # broadcast last stage's collected outputs to every pp rank
            # (the heads + losses then run replicated over pp)
            out = jax.lax.psum(
                jnp.where(sid == n_stages - 1, out, jnp.zeros_like(out)),
                pp_axis)
            return out.reshape(bl, *x_l.shape[1:])

        return shard_map(
            spmd, mesh=mesh,
            in_specs=(P(pp_axis), P(dp_axis), P(), P()),
            out_specs=P(dp_axis),
            check_vma=False,  # Pallas attention inside doesn't annotate
        )(stages, x, bias, rng)

    return pipeline


# ------------------------------------------------------------ train step
def create_pp_train_state(model: DreamVLA, tcfg: TrainConfig, sample_batch,
                          rng: jax.Array, total_steps: int, n_stages: int,
                          steps_per_epoch: int = 1000):
    """create_train_state + stage restack; the optimizer is built over the
    STACKED tree (trainable-mask top-level keys are unchanged by the
    restack, so masking behaves identically)."""
    state, _, schedule = create_train_state(model, tcfg, sample_batch, rng,
                                            total_steps, steps_per_epoch)
    params = stack_trunk_stages(state.params, n_stages)
    tx = build_optimizer(params, schedule, tcfg.weight_decay,
                         tcfg.grad_clip_norm)
    return (TrainState(step=state.step, params=params,
                       opt_state=tx.init(params)), tx, schedule)


def pp_state_shardings(state: TrainState, mesh: Mesh, pp_axis: str = "pp"):
    """NamedShardings: pp_stages leaves split over 'pp' at dim 0 (params AND
    their AdamW moments — the path test sees 'pp_stages' in both), all else
    replicated."""
    n_pp = mesh.shape[pp_axis]

    def spec(path, x):
        staged = any(getattr(p, "key", None) == "pp_stages" for p in path)
        if (staged and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == n_pp):
            return P(pp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec(p, x)), state)


def build_pp_train_step(model: DreamVLA, tcfg: TrainConfig, tx, mesh: Mesh,
                        n_micro: int, donate: bool = True):
    """Returns compile_step(state) -> jitted step(state, batch, rng) ->
    (state, LossOutputs).

    batch leaves are (accum, B, ...) with B sharded over 'dp' at dim 1
    (device_put via parallel.mesh.shard_batch); state sharded per
    pp_state_shardings. Same contract as parallel/fsdp.py."""
    pipeline = build_trunk_pipeline(model.cfg, mesh, n_micro)
    loss_fn = make_loss_fn(model, tcfg, trunk_pipeline=pipeline)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, losses = accumulate_grads(loss_fn, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state), losses)

    def compile_step(state):
        st_sh = pp_state_shardings(state, mesh)
        rep = NamedSharding(mesh, P())
        return jax.jit(
            step,
            in_shardings=(st_sh, None, rep),
            out_shardings=(st_sh, rep),
            donate_argnums=(0,) if donate else (),
        )

    return compile_step
