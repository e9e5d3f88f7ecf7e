"""Synthetic batch fixtures (window contract) for tests, dry-runs, benches."""

from __future__ import annotations

from typing import Dict

import numpy as np

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig


def _smooth_images(rng, batch, w, c, hw):
    """Low-frequency image stack (learnable targets: a tiny model can
    memorise these through MAE masking, unlike iid pixel noise)."""
    u = np.linspace(-1.0, 1.0, hw, dtype=np.float32)
    gx, gy = np.meshgrid(u, u, indexing="ij")
    coef = rng.normal(size=(batch, w, c, 3)).astype(np.float32)
    img = (coef[..., 0, None, None] * gx
           + coef[..., 1, None, None] * gy
           + coef[..., 2, None, None] * gx * gy)
    return img.astype(np.float32)


def make_synthetic_batch(cfg: DreamVLAConfig, tcfg: TrainConfig, batch: int,
                         seed: int = 0, with_labels: bool = True,
                         learnable: bool = False) -> Dict:
    """One host micro-batch matching the collator's window contract.

    learnable=True swaps iid-noise images/depth for smooth low-frequency
    fields so an overfit run can actually drive the reconstruction losses
    to ~0 (used by the learning-dynamics test)."""
    rng = np.random.default_rng(seed)
    # collator contract: frames cover window_size + pred_num - 1 steps;
    # actions additionally cover the chunk tail (+act_step-1)
    w = tcfg.window_size + cfg.pred_num - 1
    wa = w + cfg.action_pred_steps - 1
    hw = cfg.image_size
    f32 = np.float32
    if learnable:
        images_primary = _smooth_images(rng, batch, w, 3, hw)
        images_wrist = _smooth_images(rng, batch, w, 3, hw)
    else:
        images_primary = rng.normal(size=(batch, w, 3, hw, hw)).astype(f32)
        images_wrist = rng.normal(size=(batch, w, 3, hw, hw)).astype(f32)
    out = dict(
        images_primary=images_primary,
        images_wrist=images_wrist,
        states=np.concatenate(
            [rng.normal(size=(batch, w, 6)).astype(f32),
             rng.integers(0, 2, size=(batch, w, 1)).astype(f32)], axis=-1),
        actions=np.concatenate(
            # learnable: arm targets inside the tanh head's range (real
            # CALVIN rel_actions live in [-1, 1])
            [(rng.uniform(-0.9, 0.9, size=(batch, wa, 6)) if learnable
              else rng.normal(size=(batch, wa, 6))).astype(f32),
             rng.integers(0, 2, size=(batch, wa, 1)).astype(f32)], axis=-1),
    )
    if cfg.include_text_encoder:
        out["text_tokens"] = rng.integers(0, 49408, size=(batch, 77)).astype(np.int32)
    else:
        out["text_features"] = rng.normal(size=(batch, 512)).astype(f32)
    if with_labels:
        if cfg.depth_pred:
            if learnable:
                out["depth_primary"] = np.abs(
                    _smooth_images(rng, batch, w, 1, hw)) + 0.1
                out["depth_wrist"] = np.abs(
                    _smooth_images(rng, batch, w, 1, hw)) + 0.1
            else:
                out["depth_primary"] = np.abs(rng.normal(size=(batch, w, 1, hw, hw))).astype(f32)
                out["depth_wrist"] = np.abs(rng.normal(size=(batch, w, 1, hw, hw))).astype(f32)
        if cfg.dino_feat_pred:
            out["dino_primary"] = rng.normal(size=(batch, w, 256, 768)).astype(f32)
            out["dino_wrist"] = rng.normal(size=(batch, w, 256, 768)).astype(f32)
        if cfg.sam_feat_pred:
            out["sam_primary"] = rng.normal(size=(batch, w, 256, 256)).astype(f32)
            out["sam_wrist"] = rng.normal(size=(batch, w, 256, 256)).astype(f32)
        if cfg.trajectory_pred or True:  # tracks also feed flow_as_mask
            g = cfg.traj_grid
            out["tracks"] = rng.normal(size=(batch, w, g * g, 2)).astype(f32)
            out["tracks_gripper"] = rng.normal(size=(batch, w, g * g, 2)).astype(f32)
    return out


def make_disk_calvin(root, n: int = 24, seed: int = 0) -> None:
    """Write a tiny CALVIN-shape episode directory under `root` (a
    'training' split dir): per-frame npz files + language annotations +
    episode index, matching data/calvin.py's on-disk contract."""
    import os

    import numpy as np

    os.makedirs(os.path.join(root, "lang_annotations"), exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        np.savez(
            os.path.join(root, f"episode_{i:07d}.npz"),
            rgb_static=rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (48, 48, 3), dtype=np.uint8),
            depth_static=rng.random((64, 64)).astype(np.float32),
            depth_gripper=rng.random((48, 48)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6),
                 [1.0 if i % 2 else -1.0]]).astype(np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14), [1.0]]).astype(np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
    np.save(os.path.join(root, "lang_annotations", "auto_lang_ann.npy"),
            {"info": {"indx": [(0, n - 1)]},
             "language": {"ann": ["do the thing"], "task": ["thing"]}})
    np.save(os.path.join(root, "ep_start_end_ids.npy"),
            np.array([[0, n - 1]]))


def add_accum_axis(batch: Dict, accum: int = 1) -> Dict:
    """Tile a micro-batch into the (accum, B, ...) layout of the train step."""
    return {k: np.broadcast_to(v[None], (accum,) + v.shape).copy()
            for k, v in batch.items()}


# ---------------------------------------------------------------------------
# Cached test inits.
#
# Full-model `model.init` traces the whole DreamVLA graph — ~20-30 s per
# config on the 1-core CPU this suite runs on, and the suite pays it in a
# dozen files. Init values are arbitrary random draws, so any PRIOR init
# with the same tree is a valid one to reuse; the cache key hashes every
# package source plus the config/shape signature, so ANY code edit safely
# invalidates (a committed warm cache then makes even a fresh-clone suite
# run fast, same idea as the committed XLA compile cache next to it).
# ---------------------------------------------------------------------------

_PARAM_CACHE_DIR = None  # set by tests/conftest.py; None disables caching


def set_param_cache_dir(path) -> None:
    global _PARAM_CACHE_DIR
    _PARAM_CACHE_DIR = path


def _package_source_hash() -> str:
    import hashlib
    import os

    import dreamvla_tpu

    root = os.path.dirname(dreamvla_tpu.__file__)
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    import flax
    import jax

    h.update(f"{jax.__version__}/{flax.__version__}".encode())
    return h.hexdigest()[:16]


_SRC_HASH = None


def init_signature(mode: str, rng_names, inputs) -> str:
    """Canonical signature for cached_init: identical inits from different
    test files dedupe to one cache entry."""
    return (f"init|{mode}|rngs:{','.join(sorted(rng_names))}|"
            + "|".join(f"{k}:{np.asarray(v).shape}:{np.asarray(v).dtype}"
                       for k, v in sorted(inputs.items())))


def cached_init(model, init_thunk, signature: str):
    """Return `init_thunk()`'s params tree, disk-cached.

    signature must determine the tree (config repr + input shapes + seeds);
    the package-source hash is mixed in automatically.
    """
    global _SRC_HASH
    if _PARAM_CACHE_DIR is None:
        return init_thunk()
    import hashlib
    import os
    import pickle

    import jax

    if _SRC_HASH is None:
        _SRC_HASH = _package_source_hash()
    key = hashlib.sha256(
        (repr(model.cfg if hasattr(model, "cfg") else model)
         + "|" + signature + "|" + _SRC_HASH).encode()).hexdigest()[:24]
    base = os.path.join(_PARAM_CACHE_DIR, key)
    # .pkl entries are committed (warm for a fresh clone); entries above
    # the size cap go to .local.pkl (gitignored) so the repo stays lean
    for suffix in (".pkl", ".local.pkl"):
        if os.path.exists(base + suffix):
            with open(base + suffix, "rb") as f:
                return pickle.load(f)
    params = jax.device_get(init_thunk())
    blob = pickle.dumps(params)
    cap = int(os.environ.get("DREAMVLA_PARAM_CACHE_MAX", 6 * 2**20))
    path = base + (".pkl" if len(blob) <= cap else ".local.pkl")
    os.makedirs(_PARAM_CACHE_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return params


def cached_train_state(model, tcfg, batch, seed: int, total_steps: int,
                       steps_per_epoch: int = 1000, create_fn=None):
    """create_train_state with the expensive model.init disk-cached.

    Same return contract as parallel.train_step.create_train_state; the
    optimizer/schedule are rebuilt (cheap) rather than cached. create_fn
    overrides the init function (e.g. when the module attribute is itself
    monkeypatched to this wrapper — avoids recursing through the patch).
    """
    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.parallel.train_step import (TrainState,
                                                  create_train_state)
    from dreamvla_tpu.train.optimizer import (build_lr_schedule,
                                              build_optimizer)

    if create_fn is None:
        create_fn = create_train_state
    sig = (f"train_state|{repr(tcfg)}|seed{seed}|"
           + "|".join(f"{k}:{np.asarray(v).shape}:{np.asarray(v).dtype}"
                      for k, v in sorted(batch.items())))
    params = cached_init(
        model,
        lambda: create_fn(model, tcfg, batch,
                          jax.random.PRNGKey(seed), total_steps,
                          steps_per_epoch)[0].params,
        sig)
    schedule = build_lr_schedule(
        tcfg.lr_scheduler, tcfg.learning_rate,
        tcfg.warmup_epochs * steps_per_epoch, total_steps)
    tx = build_optimizer(params, schedule, tcfg.weight_decay,
                         tcfg.grad_clip_norm)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    return state, tx, schedule
