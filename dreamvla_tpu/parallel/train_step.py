"""The jitted SPMD train step: forward, losses, grad psum, AdamW update.

Replaces the reference's epoch inner loop body
(`utils/train_utils.py:94-608`: host-side batch unpack -> forward -> loss
sum -> backward with DDP allreduce -> clip -> step). Here the whole step —
including gradient accumulation (reference :588-608) as a lax.scan over
micro-batches — is one compiled program under `shard_map` over the 'dp'
mesh axis, with a single `psum` for gradients (the NCCL allreduce
equivalent, riding ICI).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.train.losses import LossOutputs, compute_losses
from dreamvla_tpu.train.optimizer import build_lr_schedule, build_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(model: DreamVLA, tcfg: TrainConfig, sample_batch: Dict,
                       rng: jax.Array, total_steps: int,
                       steps_per_epoch: int = 1000,
                       cheap_init: bool = False):
    """Initialise params + optimizer. sample_batch: one host micro-batch
    (window contract, see `prepare_model_inputs`).

    cheap_init=True skips the real initializer: the param tree comes from
    jax.eval_shape (host-only trace) filled with a constant by a trivial
    broadcast program. For benchmarking only — through this environment's
    tunnel the full init program costs minutes (bench.py docstring) and
    step timing does not depend on weight values."""
    rngs = {"params": rng,
            "diffusion": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
            "mask": jax.random.fold_in(rng, 3)}
    init = lambda: model.init(  # noqa: E731 - shared by both paths
        rngs, mode="train", train=False,
        **prepare_model_inputs(model.cfg, decode_packed_batch(sample_batch)))
    if cheap_init:
        shapes = jax.eval_shape(init)["params"]
        params = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    else:
        params = init()["params"]
    schedule = build_lr_schedule(
        tcfg.lr_scheduler, tcfg.learning_rate,
        tcfg.warmup_epochs * steps_per_epoch, total_steps)
    tx = build_optimizer(params, schedule, tcfg.weight_decay,
                         tcfg.grad_clip_norm)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params)), tx, schedule


def action_chunks(actions: jnp.ndarray, s: int, steps: int) -> jnp.ndarray:
    """(B, W, 7) -> (B, s, steps, 7): chunk labels, chunk j at time t is the
    action at t+j (train_utils.py:145)."""
    return jnp.stack([actions[:, j : s + j] for j in range(steps)], axis=2)


def prepare_model_inputs(cfg: DreamVLAConfig, batch: Dict) -> Dict:
    """Window batch -> model forward kwargs (train_utils.py:139-156).

    Window contract (collator output; leaves are (B, W, ...)):
      images_primary/images_wrist (B,W,3,H,W'), states (B,W,7|8) with the
      gripper already in {0,1}, actions (B,W,7) rel-actions with gripper in
      {0,1}, text_tokens (B,77) or text_features (B,512), plus optional
      depth/dino/sam/tracks label fields consumed by compute_losses.
    """
    s = cfg.sequence_length
    out = dict(
        image_primary=batch["images_primary"][:, :s],
        image_wrist=batch["images_wrist"][:, :s],
        state=batch["states"][:, :s],
    )
    if "text_features" in batch:
        out["text_features"] = batch["text_features"]
    else:
        out["text_tokens"] = batch["text_tokens"]
    if "actions" in batch:
        chunks = action_chunks(batch["actions"], s, cfg.action_pred_steps)
        out["action_label"] = chunks
    return out


def decode_packed_batch(batch: Dict) -> Dict:
    """In-graph decode of the packed-cache host contract
    (`data/packed_cache.py`, image_mode='u8'): uint8 CHW images ->
    CLIP-normalised float32 (bit-equal to the host `clip_image_transform`
    constants), float16 feature labels / uint8 visibility -> float32.
    A trivial fused VPU op on TPU; a no-op on already-float batches."""
    from dreamvla_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    batch = dict(batch)
    for k, v in batch.items():
        if v.dtype == jnp.uint8 and k.startswith("images_"):
            mean = jnp.asarray(CLIP_MEAN).reshape(1, 1, 3, 1, 1)
            std = jnp.asarray(CLIP_STD).reshape(1, 1, 3, 1, 1)
            batch[k] = (v.astype(jnp.float32) / 255.0 - mean) / std
        elif v.dtype in (jnp.float16, jnp.uint8):
            batch[k] = v.astype(jnp.float32)
    return batch


def apply_random_shifts(tcfg: TrainConfig, batch: Dict, rng) -> Dict:
    """On-device DrQ shifts (the reference runs these in dataloader worker
    processes, data_utils.py:1337-1354): rgb_pad shifts the static view
    (and its depth under traj_cons), gripper_pad the wrist view — each
    stream draws its own shifts, matching the reference's separate calls."""
    from dreamvla_tpu.ops.augment import random_shifts_aug

    batch = dict(batch)
    rngs = jax.random.split(rng, 4)
    if tcfg.rgb_pad > 0:
        batch["images_primary"] = random_shifts_aug(
            rngs[0], batch["images_primary"], tcfg.rgb_pad, tcfg.traj_cons)
        if tcfg.traj_cons and "depth_primary" in batch:
            batch["depth_primary"] = random_shifts_aug(
                rngs[1], batch["depth_primary"], tcfg.rgb_pad, True)
    if tcfg.gripper_pad > 0:
        batch["images_wrist"] = random_shifts_aug(
            rngs[2], batch["images_wrist"], tcfg.gripper_pad, tcfg.traj_cons)
        if tcfg.traj_cons and "depth_wrist" in batch:
            batch["depth_wrist"] = random_shifts_aug(
                rngs[3], batch["depth_wrist"], tcfg.gripper_pad, True)
    return batch


def make_loss_fn(model: DreamVLA, tcfg: TrainConfig, trunk_pipeline=None):
    """trunk_pipeline: optional pipeline-parallel trunk apply
    (parallel.pp.build_trunk_pipeline), threaded through to GPT2Trunk."""
    def loss_fn(params, batch, rng):
        r_diff, r_drop, r_mask, r_aug = jax.random.split(rng, 4)
        batch = apply_random_shifts(tcfg, decode_packed_batch(batch), r_aug)
        inputs = prepare_model_inputs(model.cfg, batch)
        outputs = model.apply(
            {"params": params}, mode="train", train=True,
            rngs={"diffusion": r_diff, "dropout": r_drop, "mask": r_mask},
            trunk_pipeline=trunk_pipeline, **inputs)
        loss_batch = dict(batch)
        loss_batch["action_chunks"] = inputs.get("action_label")
        losses = compute_losses(model.cfg, tcfg, outputs, loss_batch)
        return losses.total, losses
    return loss_fn


def accumulate_grads(loss_fn, params, batch, rng):
    """Micro-batch gradient accumulation shared by every regime (dp /
    fsdp / pp / sp): batch leaves (accum, B, ...) -> (grads, LossOutputs),
    both averaged over the accum axis (reference train_utils.py:588-608)."""
    accum = batch["states"].shape[0]
    if accum == 1:
        # no accumulation: skip the zero-init + add of a full
        # gradient buffer (~2 extra params-sized HBM passes)
        mb = jax.tree.map(lambda x: x[0], batch)
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, rng)
        return grads, losses

    def micro(carry, xs):
        grads_acc, losses_acc = carry
        mb, mb_rng = xs
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, mb_rng)
        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
        losses_acc = jax.tree.map(jnp.add, losses_acc, losses)
        return (grads_acc, losses_acc), None

    zero_g = jax.tree.map(jnp.zeros_like, params)
    zero_l = LossOutputs(*([jnp.zeros((), jnp.float32)] * 8))
    rngs = jax.random.split(rng, accum)
    (grads, losses), _ = jax.lax.scan(micro, (zero_g, zero_l), (batch, rngs))
    scale = 1.0 / accum
    grads = jax.tree.map(lambda x: x * scale, grads)
    losses = jax.tree.map(lambda x: x * scale, losses)
    return grads, losses


def build_train_step(model: DreamVLA, tcfg: TrainConfig, tx,
                     mesh: Optional[Mesh] = None, dp_axis: str = "dp",
                     donate: bool = True):
    """Returns step(state, batch, rng) -> (state, LossOutputs).

    batch leaves are (accum, local_bs, ...) — an explicit micro-batch axis
    (accum=1 when gradient accumulation is off). With a mesh the function is
    shard_map'ed: batch sharded on dp, state replicated.
    """
    loss_fn = make_loss_fn(model, tcfg)

    def local_grads(params, batch, rng):
        return accumulate_grads(loss_fn, params, batch, rng)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, losses = local_grads(state.params, batch, rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            losses = jax.lax.pmean(losses, dp_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), losses

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    rep = P()
    batch_spec = P(None, dp_axis)  # (accum, global_bs, ...) sharded on bs
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, batch_spec, rep),
        out_specs=(rep, rep),
        check_vma=False,  # Pallas calls inside don't annotate varying-ness
    )
    return jax.jit(sharded, donate_argnums=donate_argnums)
