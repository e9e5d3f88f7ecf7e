"""Break the flagship train step's wall time into fwd / bwd / optimizer.

Times three compiled programs at the CALVIN-finetune shapes on the real
chip (reference step they decompose: utils/train_utils.py:158-608 —
forward + 7-loss sum, backward, clip + AdamW step):

  fwd       loss forward only (losses.total);
  fwd+bwd   value_and_grad of the same loss (adds the backward);
  step      the full train step (adds grad-clip + AdamW + param update).

Differences between consecutive rows isolate the backward and the
optimizer. Methodology matches bench.py: the tunnel's per-dispatch RTT
would swamp the numbers, so each timed dispatch runs N steps inside one
on-device lax.scan with perturbed inputs and a readback that depends on
every step (fwd/bwd accumulate loss + global grad norm; step carries the
updated TrainState through the scan).

Each row runs in its OWN process (--only) by default: holding three
compiled executables plus their buffers in one process OOMs the 16 GB
chip at bs8 (observed RESOURCE_EXHAUSTED compiling fwd+bwd after fwd).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_breakdown.py \
       [--batch 8] [--steps 5] [--repeats 5] [--remat]
"""

from __future__ import annotations

import argparse
from functools import partial
import subprocess
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--accum", type=int, default=1,
                    help="in-graph micro-batch accumulation: the full step "
                         "runs --batch samples as --accum micro-batches of "
                         "batch/accum through the lax.scan accumulator "
                         "(parallel/train_step.accumulate_grads) — the "
                         "route to a bs-16 point past the bs-16 "
                         "single-dispatch compile crash")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--remat", action="store_true",
                    help="wrap trunk blocks in jax.checkpoint")
    ap.add_argument("--no_fused_train", action="store_true",
                    help="disable the fused train trunk kernels "
                         "(cfg.fused_trunk_train) for an unfused A/B row")
    ap.add_argument("--no_fused_decoder", action="store_true",
                    help="disable the fused decoder ViT-block kernels "
                         "(cfg.fused_decoder_train) for an unfused A/B row")
    ap.add_argument("--only", choices=["fwd", "fwdbwd", "step"],
                    help="measure one program (default: all three, each in "
                         "a fresh subprocess to avoid cross-program OOM)")
    ap.add_argument("--cheap_init", action="store_true",
                    help="constant-fill params via jax.eval_shape instead "
                         "of the real initializer (the init program costs "
                         "minutes through the tunnel; step timing is "
                         "value-independent) — used by bench.py")
    args = ap.parse_args()

    if args.only is None:
        for tag in ("fwd", "fwdbwd", "step"):
            cmd = [sys.executable, __file__, "--only", tag,
                   "--batch", str(args.batch), "--steps", str(args.steps),
                   "--repeats", str(args.repeats),
                   "--accum", str(args.accum)]
            if args.remat:
                cmd.append("--remat")
            if args.no_fused_train:
                cmd.append("--no_fused_train")
            if args.no_fused_decoder:
                cmd.append("--no_fused_decoder")
            if args.cheap_init:
                cmd.append("--cheap_init")
            subprocess.run(cmd, check=True)
        return

    import dataclasses

    from dreamvla_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.parallel.train_step import (build_train_step,
                                                  create_train_state,
                                                  make_loss_fn)
    from dreamvla_tpu.utils.testing import make_synthetic_batch

    assert jax.default_backend() == "tpu", (
        f"backend is {jax.default_backend()!r}; run this on the chip")

    bs, n = args.batch, args.steps
    cfg, tcfg = calvin_finetune()
    if args.remat:
        cfg = dataclasses.replace(cfg, remat=True)
    if args.no_fused_train:
        cfg = dataclasses.replace(cfg, fused_trunk_train=False)
    if args.no_fused_decoder:
        cfg = dataclasses.replace(cfg, fused_decoder_train=False)
    tcfg = dataclasses.replace(tcfg, batch_size=bs)
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=bs)
    state, tx, _ = create_train_state(model, tcfg, batch,
                                      jax.random.PRNGKey(0), total_steps=100,
                                      cheap_init=args.cheap_init)
    batch = jax.tree.map(jnp.asarray, batch)
    loss_fn = make_loss_fn(model, tcfg)

    def perturb(b, i):
        # bf16-safe perturbation (see PROGRESS notes: adding f32 epsilons
        # silently promotes the whole residual stream)
        return dict(b, images_primary=b["images_primary"]
                    + (i.astype(jnp.float32) * 1e-4))

    @jax.jit
    def run_fwd(params, batch, rng):
        def body(acc, i):
            loss, _ = loss_fn(params, perturb(batch, i),
                              jax.random.fold_in(rng, i))
            return acc + loss, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    @jax.jit
    def run_fwd_bwd(params, batch, rng):
        def body(acc, i):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, perturb(batch, i), jax.random.fold_in(rng, i))
            return acc + loss + optax.global_norm(grads), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
        return acc

    step = build_train_step(model, tcfg, tx, mesh=None, donate=False)

    # Donate the carried TrainState (and return it for the next dispatch):
    # without donation XLA double-buffers the ~6.3 GB param+AdamW state and
    # the fused bs-8 program misses HBM by a few MB. Matches real training,
    # where the step donates its state.
    @partial(jax.jit, donate_argnums=(0,))
    def run_step(state, batch, rng):
        def body(st, i):
            # accum axis added in-trace (numpy add_accum_axis would choke
            # on tracers inside the scan body): (B, ...) ->
            # (accum, B/accum, ...) micro-batches for accumulate_grads
            micro = jax.tree.map(
                lambda v: v.reshape((args.accum, v.shape[0] // args.accum)
                                    + v.shape[1:]),
                perturb(batch, i))
            st, losses = step(st, micro, jax.random.fold_in(rng, i))
            return st, losses.total
        st, tot = jax.lax.scan(body, state, jnp.arange(n))
        return st, jnp.sum(tot)

    def measure(tag, fn, *a):
        t0 = time.time()
        float(fn(*a))  # compile + warm
        print(f"{tag}: built (+{time.time() - t0:.0f}s)", flush=True)
        ts = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append((time.perf_counter() - t0) / n)
        ms = float(np.median(ts)) * 1e3
        print(f"{tag}: {ms:.1f} ms/step  ({bs / (ms / 1e3):.2f} samples/s)",
              flush=True)
        return ms

    def measure_step(tag):
        # run_step donates + returns the state: thread it through repeats
        # (float(tot) syncs each dispatch).
        st = state
        t0 = time.time()
        st, tot = run_step(st, batch, rng)
        float(tot)
        print(f"{tag}: built (+{time.time() - t0:.0f}s)", flush=True)
        ts = []
        for r in range(args.repeats):
            t0 = time.perf_counter()
            st, tot = run_step(st, batch, rng)
            float(tot)
            ts.append((time.perf_counter() - t0) / n)
        ms = float(np.median(ts)) * 1e3
        print(f"{tag}: {ms:.1f} ms/step  ({bs / (ms / 1e3):.2f} samples/s)",
              flush=True)

    rng = jax.random.PRNGKey(7)
    tag = {"fwd": "fwd       ", "fwdbwd": "fwd+bwd   ",
           "step": "full step "}[args.only]
    if args.only == "fwd":
        measure(tag, run_fwd, state.params, batch, rng)
    elif args.only == "fwdbwd":
        measure(tag, run_fwd_bwd, state.params, batch, rng)
    else:
        measure_step(tag)


if __name__ == "__main__":
    main()
