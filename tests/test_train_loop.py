"""End-to-end training-loop integration: disk fixture -> loader -> SPMD step
-> metrics -> checkpoints, on the 8-device CPU mesh.

Model/state/loader are built once (module fixture) and shared by both tests
— rebuilding at a second batch shape doubled the CPU compile bill and made
this the slowest file in the suite.
"""

import dataclasses
import json

import jax
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.data.calvin import get_calvin_dataset
from dreamvla_tpu.data.tokenizer import HashTokenizer
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.parallel.mesh import make_mesh
from dreamvla_tpu.parallel.train_step import build_train_step, create_train_state
from dreamvla_tpu.train.loop import train_one_epoch
from dreamvla_tpu.utils.logging import MetricLogger
from dreamvla_tpu.utils.testing import cached_train_state


@pytest.fixture(scope="module")
def calvin_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin_loop") / "training"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(24):
        np.savez(
            root / f"episode_{i:07d}.npz",
            rgb_static=rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (48, 48, 3), dtype=np.uint8),
            depth_static=rng.random((64, 64)).astype(np.float32),
            depth_gripper=rng.random((48, 48)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6), [1.0 if i % 2 else -1.0]]).astype(np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14), [1.0]]).astype(np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
    lang_dir = root / "lang_annotations"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy",
            {"info": {"indx": [(0, 23)]},
             "language": {"ann": ["do the thing"], "task": ["thing"]}})
    np.save(root / "ep_start_end_ids.npy", np.array([[0, 23]]))
    return root


@pytest.fixture(scope="module")
def loop_setup(calvin_root):
    cfg, tcfg = tiny_test()
    cfg = dataclasses.replace(cfg, include_text_encoder=True)
    tcfg = dataclasses.replace(tcfg, batch_size=8, window_size=6)
    model = DreamVLA(cfg)
    data = get_calvin_dataset(str(calvin_root.parent),
                              batch_size=tcfg.batch_size,
                              window_size=tcfg.window_size,
                              act_step=cfg.action_pred_steps,
                              num_workers=2, image_size=cfg.image_size,
                              tokenizer=HashTokenizer())
    sample = next(iter(data.dataloader))
    state, tx, _ = cached_train_state(model, tcfg, sample, 0,
                                       total_steps=10)
    return cfg, tcfg, model, data, sample, state, tx


def test_epoch_end_to_end(loop_setup, tmp_path, capsys):
    cfg, tcfg, model, data, _, state, tx = loop_setup
    mesh = make_mesh(("dp",))
    step = build_train_step(model, tcfg, tx, mesh=mesh, donate=False)
    logger = MetricLogger()
    state2, losses = train_one_epoch(
        model, tcfg, state, step, data, epoch=0, rng=jax.random.PRNGKey(1),
        mesh=mesh, logger=logger, log_every=1,
        save_every_iter=2, ckpt_dir=str(tmp_path / "ck"),
        profile_dir=str(tmp_path / "prof"), profile_steps=(0, 1))
    assert losses is not None and np.isfinite(float(losses.total))
    assert int(state2.step) == data.dataloader.num_batches
    assert data.dataloader.num_batches >= 2  # save/profile cadence reachable
    # metrics went to stdout as JSON lines
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    rec = json.loads(lines[0])
    assert "loss/total" in rec and "perf/samples_per_sec" in rec
    # mid-epoch checkpoint written
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path / "ck")) as mgr:
        assert mgr.all_steps() == [0]
    # --profile_dir captured a jax.profiler trace of steady-state steps
    import glob

    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)


def test_panels_build(loop_setup, tmp_path):
    from dreamvla_tpu.train.panels import build_panels

    cfg, tcfg, model, data, sample, state, tx = loop_setup
    panels = build_panels(model, state.params, sample, jax.random.PRNGKey(1))
    assert "image/primary_pred_vs_label" in panels
    assert "depth/primary_pred_vs_label" in panels
    img = panels["image/primary_pred_vs_label"]
    assert img.ndim == 3 and img.shape[-1] == 3
    # PNG fallback path
    MetricLogger().log_images(panels, step=0, save_dir=str(tmp_path / "p"))
    import os

    assert len(os.listdir(tmp_path / "p")) == len(panels)


def test_preemption_saves_and_stops(loop_setup, tmp_path):
    """SIGTERM preemption: the epoch loop finishes the in-flight step,
    writes a mid-epoch checkpoint, and returns early; auto-resume then
    re-enters the SAME epoch (last-completed semantics)."""
    from dreamvla_tpu.train import loop as dvloop
    from dreamvla_tpu.train.checkpoints import restore_checkpoint

    cfg, tcfg, model, data, _, state, tx = loop_setup
    mesh = make_mesh(("dp",))
    step = build_train_step(model, tcfg, tx, mesh=mesh, donate=False)
    ev = dvloop.install_preemption_handler()
    ev.set()  # "SIGTERM already delivered" before the first step boundary
    try:
        state2, _ = train_one_epoch(
            model, tcfg, state, step, data, epoch=3,
            rng=jax.random.PRNGKey(1), mesh=mesh,
            ckpt_dir=str(tmp_path / "ck"), is_saver=True)
    finally:
        ev.clear()
    # exactly one step ran before the boundary check fired
    assert int(state2.step) == int(state.step) + 1
    assert data.dataloader.num_batches > 1  # it genuinely stopped early
    restored, resume_epoch = restore_checkpoint(str(tmp_path / "ck"), state)
    assert resume_epoch == 3  # re-enter the interrupted epoch
    assert int(restored.step) == int(state2.step)
