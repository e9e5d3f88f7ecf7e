"""Epoch training loop.

Capability parity with reference `train_one_epoch_calvin`
(utils/train_utils.py:59-748) minus the host-side label math (which lives
fused in `train.losses`): per-epoch sampler reseeding, step/data timing
meters, samples/sec(/chip) throughput, per-term loss reporting, periodic
checkpointing. The device step (forward+losses+grads+update+accum) is one
compiled program from `parallel.train_step`.
"""

from __future__ import annotations

import signal
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig
from dreamvla_tpu.parallel.mesh import shard_batch
from dreamvla_tpu.utils.logging import AverageMeter, MetricLogger


# Preemption flag: TPU pods deliver SIGTERM ahead of eviction. The handler
# only sets this event; the epoch loop checks it at the next step boundary,
# writes a mid-epoch checkpoint and returns cleanly, and cmd_train stops —
# together with `--resume_from_checkpoint auto` the train CLI survives
# kill/restart cycles losing at most the in-flight step.
_PREEMPTED = threading.Event()


def install_preemption_handler() -> threading.Event:
    """Route SIGTERM to the preemption event. Returns the event (tests set
    and clear it directly)."""
    signal.signal(signal.SIGTERM, lambda signum, frame: _PREEMPTED.set())
    return _PREEMPTED


def preempted() -> bool:
    return _PREEMPTED.is_set()


def device_batch(batch: Dict[str, np.ndarray], accum: int) -> Dict:
    """(B, ...) host batch -> (accum, B/accum, ...) micro-batch layout."""
    out = {}
    for k, v in batch.items():
        b = v.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum {accum}")
        out[k] = v.reshape((accum, b // accum) + v.shape[1:])
    return out


def train_one_epoch(model, tcfg: TrainConfig, state, step_fn, data_info,
                    epoch: int, rng: jax.Array, mesh=None,
                    logger: Optional[MetricLogger] = None,
                    log_every: int = 20,
                    save_every_iter: int = 0, ckpt_dir: Optional[str] = None,
                    is_saver: bool = True,
                    panel_every: int = 0, panel_dir: Optional[str] = None,
                    profile_dir: Optional[str] = None,
                    profile_steps: tuple = (10, 15)):
    cfg: DreamVLAConfig = model.cfg
    data_info.set_epoch(epoch)
    loader = data_info.dataloader
    step_time, data_time = AverageMeter(), AverageMeter()
    n_chips = len(jax.devices())
    end = time.time()
    losses = None
    profiling = False
    for i, batch in enumerate(loader):
        data_time.update(time.time() - end)
        if profile_dir and epoch == 0 and is_saver:
            # capture a jax.profiler trace of steady-state steps
            if i == profile_steps[0] and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif i == profile_steps[1] and profiling:
                jax.profiler.stop_trace()
                profiling = False
        if (panel_every and logger is not None and is_saver
                and i % panel_every == 0):
            from dreamvla_tpu.parallel.train_step import decode_packed_batch
            from dreamvla_tpu.train.panels import build_panels

            rng, prng = jax.random.split(rng)
            # packed-cache batches ship uint8 images / f16 features; the
            # panel builder (like the model) wants the decoded f32 view
            panels = build_panels(model, state.params,
                                  decode_packed_batch(
                                      jax.tree.map(jnp.asarray, batch)),
                                  prng)
            if panels:
                logger.log_images(panels, int(jax.device_get(state.step)),
                                  save_dir=panel_dir)
        batch = device_batch(batch, tcfg.gradient_accumulation_steps)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        rng, sub = jax.random.split(rng)
        state, losses = step_fn(state, batch, sub)
        step_time.update(time.time() - end)
        end = time.time()
        if (save_every_iter and ckpt_dir and is_saver
                and (i + 1) % save_every_iter == 0):
            # mid-epoch preemption-safe checkpoint (reference exposes
            # --save_every_iter but never acts on it)
            from dreamvla_tpu.train.checkpoints import save_checkpoint

            save_checkpoint(ckpt_dir, epoch, state, delete_previous=True,
                            mid_epoch=True)
        if _PREEMPTED.is_set():
            if ckpt_dir and is_saver:
                from dreamvla_tpu.train.checkpoints import save_checkpoint

                save_checkpoint(ckpt_dir, epoch, state, delete_previous=True,
                                mid_epoch=True)
            if profiling:
                jax.profiler.stop_trace()
            return state, losses
        if logger is not None and i % log_every == 0:
            # each process's loader yields batch_size samples per step and
            # device_batch SPLITS (not replicates) them into accum
            # micro-batches, so the global step consumes
            # batch_size * process_count samples — NOT x accum and NOT
            # x local device count (shard_batch splits over local dp)
            global_bs = tcfg.batch_size * jax.process_count()
            # ONE host<->device sync for the whole scalar tree: per-float()
            # conversions each cost a tunnel RTT (40-70 ms on pod TPUs)
            host = jax.device_get({
                "arm": losses.arm_action, "gripper": losses.gripper_action,
                "image": losses.image, "depth": losses.depth,
                "traj": losses.trajectory, "dino": losses.dino,
                "sam": losses.sam, "total": losses.total,
                "step": state.step})
            logger.log({
                "loss/total": float(host["total"]),
                "loss/arm": float(host["arm"]),
                "loss/gripper": float(host["gripper"]),
                "loss/image": float(host["image"]),
                "loss/depth": float(host["depth"]),
                "loss/traj": float(host["traj"]),
                "loss/dino": float(host["dino"]),
                "loss/sam": float(host["sam"]),
                "perf/samples_per_sec": global_bs / max(step_time.val, 1e-9),
                "perf/samples_per_sec_per_chip":
                    global_bs / max(step_time.val, 1e-9) / n_chips,
                "perf/data_time": data_time.val,
                "perf/step_time": step_time.val,
                "epoch": epoch,
            }, step=int(host["step"]))
    if profiling:
        jax.profiler.stop_trace()
    return state, losses
