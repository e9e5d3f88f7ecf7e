"""Offline-pipeline CLI subcommands + CALVIN walkers + train-CLI flags.

Covers the reference's launchable offline stage (docs/CALVIN_ABC-D_RUN.md
:19-46: cotrack/sam/dino extractors, merge, rebuild) and the flagship
finetune.sh flag set (scripts/CALVIN_ABC_D/DreamVLA/finetune.sh:8-61)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from dreamvla_tpu import cli
from dreamvla_tpu.extract.calvin_walk import (calvin_frame_indices,
                                              extract_calvin_features,
                                              extract_calvin_tracks,
                                              lang_episode_ranges)


@pytest.fixture()
def calvin_root(tmp_path):
    """Fabricated CALVIN tree: 10 frames, lang ranges (0,6) and (7,9)."""
    root = tmp_path / "calvin"
    split = root / "training"
    split.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(10):
        np.savez(split / f"episode_{i:07d}.npz",
                 rgb_static=rng.randint(0, 255, (32, 32, 3), np.uint8),
                 rgb_gripper=rng.randint(0, 255, (24, 24, 3), np.uint8),
                 depth_static=rng.rand(32, 32).astype(np.float32),
                 depth_gripper=rng.rand(24, 24).astype(np.float32),
                 rel_actions=rng.rand(7).astype(np.float32),
                 robot_obs=rng.rand(15).astype(np.float32))
    (split / "lang_annotations").mkdir()
    ann = {"info": {"indx": [(0, 6), (7, 9)]},
           "language": {"ann": ["task a", "task b"],
                        "task": ["a", "b"],
                        "emb": np.zeros((2, 1, 384), np.float32)}}
    np.save(split / "lang_annotations" / "auto_lang_ann.npy", ann)
    return str(root)


def fake_extractor(frames):
    """(N, H, W, 3) -> (N, 4, 6) deterministic features."""
    return np.stack([np.full((4, 6), f.mean(), np.float32) for f in frames])


def test_calvin_walk_indices(calvin_root):
    assert lang_episode_ranges(calvin_root) == [(0, 6), (7, 9)]
    assert calvin_frame_indices(calvin_root) == list(range(10))


def test_extract_calvin_features_pt_roundtrip(calvin_root, tmp_path):
    import torch

    save = str(tmp_path / "feat")
    n = extract_calvin_features(calvin_root, fake_extractor, save,
                                batch_size=4)
    assert n == 10
    t = torch.load(os.path.join(save, "rgb_static", "training", "3.pt"))
    assert t.dtype == torch.bfloat16 and t.shape == (4, 6)
    # skip-existing resume behaviour
    assert extract_calvin_features(calvin_root, fake_extractor, save) == 0
    # striping splits the work
    n0 = extract_calvin_features(calvin_root, fake_extractor,
                                 str(tmp_path / "s"), process_index=0,
                                 process_count=2)
    n1 = extract_calvin_features(calvin_root, fake_extractor,
                                 str(tmp_path / "s"), process_index=1,
                                 process_count=2)
    assert n0 + n1 == 10


def fake_track_fn(frames, grid):
    t = len(frames)
    n = grid * grid
    tracks = np.ones((t, n, 2), np.float32)
    vis = np.ones((t, n), np.float32)
    return tracks, vis


def test_extract_calvin_tracks_tail_convention(calvin_root, tmp_path):
    save = str(tmp_path / "trk")
    n = extract_calvin_tracks(calvin_root, fake_track_fn, save, grid=4,
                              frame_gap=2)
    assert n == 10
    out = Path(save) / "rgb_static" / "training"
    with np.load(out / "0.npz") as z:  # lead frame: real deltas
        assert z["tracks"].shape == (16, 2) and (z["tracks"] == 1).all()
        assert z["visibility"].dtype == bool and z["visibility"].all()
    with np.load(out / "6.npz") as z:  # tail of (0,6): zeros + all-visible
        assert (z["tracks"] == 0).all() and z["visibility"].all()
    # short episode (7,9) with gap 2: frame 7 leads, 8-9 are tails
    with np.load(out / "8.npz") as z:
        assert (z["tracks"] == 0).all() and z["visibility"].all()


def test_loader_reads_reference_track_layout(calvin_root, tmp_path):
    """DiskCalvinDataset consumes the CLI extractor's artifacts."""
    from dreamvla_tpu.data.calvin import CalvinDataset

    save = str(tmp_path / "trk")
    for key in ("rgb_static", "rgb_gripper"):
        extract_calvin_tracks(calvin_root, fake_track_fn, save, grid=4,
                              image_key=key, frame_gap=2)
    ds = CalvinDataset(os.path.join(calvin_root, "training"),
                       key="lang", window_size=3, act_step=1,
                       load_track_labels=True, track_label_path=save)
    sample = ds[0]
    assert sample["tracks"].shape == (3, 16, 2)
    assert sample["track_vis"].shape == (3, 16)
    assert sample["tracks_gripper"].shape == (3, 16, 2)


def test_cli_extract_tracks_lk_end_to_end(calvin_root, tmp_path):
    save = str(tmp_path / "trk_lk")
    cli.main(["extract_tracks", "--data_root", calvin_root,
              "--save_path", save, "--tracker", "lk", "--patch_size", "56",
              "--frame_gap", "2", "--process_index", "0",
              "--process_count", "1"])
    out = Path(save) / "rgb_static" / "training"
    assert len(list(out.glob("*.npz"))) == 10
    with np.load(out / "0.npz") as z:
        assert z["tracks"].shape == (16, 2)  # grid = 224 // 56 = 4


def test_cli_merge_features(calvin_root, tmp_path):
    # sidecars: dino .pt + tracks .npz in the reference layouts
    import torch

    save = str(tmp_path / "feat")
    extract_calvin_features(calvin_root, fake_extractor, save)
    trk = str(tmp_path / "trk")
    extract_calvin_tracks(calvin_root, fake_track_fn, trk, grid=4,
                          frame_gap=2)
    out = str(tmp_path / "merged")
    cli.main(["merge_features", "--data_root", calvin_root,
              "--out_dir", out, "--dino_path", save, "--track_path", trk])
    with np.load(Path(out) / "training" / "episode_0000002.npz") as z:
        assert z["dino_static"].shape == (4, 6)
        assert z["traj_static"].shape == (16, 2)
        assert z["visibility_static"].dtype == bool
        assert "rgb_static" in z.files  # original keys kept


def test_cli_rebuild_tracks_real_repair(calvin_root, tmp_path):
    save = str(tmp_path / "trk")
    extract_calvin_tracks(calvin_root, fake_track_fn, save, grid=4,
                          frame_gap=2)
    victim = Path(save) / "rgb_static" / "training" / "4.npz"
    victim.write_bytes(b"corrupt")
    cli.main(["rebuild_tracks", "--track_root", save,
              "--data_root", calvin_root, "--tracker", "lk",
              "--patch_size", "56", "--frame_gap", "2"])
    with np.load(victim) as z:  # regenerated from source frames
        assert z["tracks"].shape == (16, 2)


def test_train_parser_accepts_flagship_finetune_flags():
    """The canonical finetune.sh recipe parses (reference
    scripts/CALVIN_ABC_D/DreamVLA/finetune.sh:8-61)."""
    parser = cli.build_parser()
    args = parser.parse_args([
        "train", "--preset", "calvin_finetune",
        "--calvin_dataset", "/data/task_ABC_D",
        "--finetune_from_pretrained_ckpt", "/ckpt/pretrain.pth",
        "--reset_obs_token", "--reset_action_decoder",
        "--save_checkpoint", "--save_checkpoint_path", "ckpts/",
    ])
    assert args.reset_obs_token and args.reset_action_decoder
    assert not args.reset_mask_token and not args.reset_resampler

    for ft in ("droid", "oxe", "real", "libero_pretrain",
               "libero_finetune", "calvin"):
        args = parser.parse_args(["train", "--finetune_type", ft,
                                  "--root_dir", "/data",
                                  "--real_dataset_names", "kitchen"])
        assert args.finetune_type == ft


def test_train_routing_reaches_droid_oxe_real(monkeypatch, tmp_path):
    """cmd_train's finetune_type routing calls the matching dataset
    getter (reference train.py:98-109)."""
    calls = []

    def fake_get(name):
        def _get(*a, **k):
            calls.append(name)
            raise RuntimeError("stop-after-routing")
        return _get

    import dreamvla_tpu.data.droid_oxe as dox

    monkeypatch.setattr(dox, "get_droid_dataset", fake_get("droid"))
    monkeypatch.setattr(dox, "get_oxe_dataset", fake_get("oxe"))
    monkeypatch.setattr(dox, "get_real_dataset", fake_get("real"))

    parser = cli.build_parser()
    for ft in ("droid", "oxe", "real"):
        args = parser.parse_args(
            ["train", "--preset", "tiny_test", "--finetune_type", ft,
             "--root_dir", str(tmp_path), "--real_dataset_names", "x"])
        with pytest.raises(RuntimeError, match="stop-after-routing"):
            cli.cmd_train(args)
    assert calls == ["droid", "oxe", "real"]


REFERENCE_ARGS = os.environ.get(
    "DREAMVLA_REFERENCE_ARGS", "/root/reference/utils/arguments_utils.py")


@pytest.mark.skipif(not os.path.exists(REFERENCE_ARGS),
                    reason="reference checkout not available")
def test_train_parser_accepts_every_reference_flag():
    """Every flag the reference argparse defines
    (utils/arguments_utils.py:43-311) parses on our train subcommand, so
    any reference launch script can be replayed verbatim."""
    import re

    ref = open(REFERENCE_ARGS).read()
    ref_flags = sorted(set(re.findall(r'add_argument\(\s*"--([a-zA-Z0-9_]+)"',
                                      ref)))
    # eval-only flags live on the eval subcommands
    eval_only = {"amp", "calvin_conf_path", "checkpoint_index", "cross_att",
                 "debug", "diverse_inst", "eval_index", "eval_log_dir",
                 "evaluate_from_checkpoint", "future_act_len", "pt_index",
                 "reset", "visualize", "in9_size", "dert_style"}
    parser = cli.build_parser()
    argv = ["train"]
    store_true = set(re.findall(
        r'add_argument\(\s*"--([a-zA-Z0-9_]+)"[^)]*action="store_true"', ref))
    int_flags = set(re.findall(
        r'add_argument\(\s*"--([a-zA-Z0-9_]+)"[^)]*type=int', ref))
    float_flags = set(re.findall(
        r'add_argument\(\s*"--([a-zA-Z0-9_]+)"[^)]*type=float', ref))
    for f in ref_flags:
        if f in eval_only:
            continue
        if f in store_true:
            argv.append(f"--{f}")
        elif f in int_flags:
            argv += [f"--{f}", "1"]
        elif f in float_flags:
            argv += [f"--{f}", "0.5"]
        else:
            argv += [f"--{f}", "x"]
    args = parser.parse_args(argv)
    assert args.command == "train"


def test_train_parallelism_flags_parse_and_exclude():
    parser = cli.build_parser()
    args = parser.parse_args(["train", "--preset", "tiny_test",
                              "--fsdp", "4"])
    assert args.fsdp == 4 and args.pp_stages == 0 and args.sp == 0
    args = parser.parse_args(["train", "--preset", "tiny_test",
                              "--pp_stages", "2", "--pp_microbatches", "2"])
    assert args.pp_stages == 2 and args.pp_microbatches == 2
    # regimes are mutually exclusive — cmd_train rejects combinations
    # before touching data or devices
    args = parser.parse_args(["train", "--preset", "tiny_test",
                              "--fsdp", "2", "--sp", "2"])
    with pytest.raises(SystemExit):
        cli.cmd_train(args)


def test_cmd_train_pp_end_to_end(tmp_path, monkeypatch):
    """One real epoch through the CLI with --pp_stages: exercises the
    routing (stage restack, optimizer rebuild, pp shardings, GPipe step)
    from argv to checkpoint."""
    import dataclasses

    from dreamvla_tpu import config as dvconfig
    from dreamvla_tpu.utils.testing import make_disk_calvin

    # the CLI data path always tokenizes language, so the tiny preset needs
    # its text tower on (HashTokenizer fallback covers the missing vocab)
    def tiny_with_text():
        cfg, tcfg = dvconfig.tiny_test()
        return dataclasses.replace(cfg, include_text_encoder=True), tcfg

    monkeypatch.setitem(dvconfig.PRESETS, "tiny_test", tiny_with_text)

    # serve the expensive full-model init from the test param cache — the
    # routing under test (argv -> stage restack -> GPipe step -> ckpt) is
    # downstream of init values
    from dreamvla_tpu.parallel import train_step as dvts
    from dreamvla_tpu.utils.testing import cached_train_state

    orig_cts = dvts.create_train_state

    def cached_cts(model, tcfg, batch, rng, total_steps, steps_per_epoch=1000):
        del rng
        return cached_train_state(model, tcfg, batch, 0, total_steps,
                                  steps_per_epoch, create_fn=orig_cts)

    monkeypatch.setattr(dvts, "create_train_state", cached_cts)

    root = tmp_path / "calvin" / "training"
    make_disk_calvin(str(root))
    parser = cli.build_parser()
    args = parser.parse_args([
        "train", "--preset", "tiny_test",
        "--calvin_dataset", str(tmp_path / "calvin"),
        "--batch_size", "8", "--num_epochs", "1", "--workers", "1",
        "--pp_stages", "2", "--pp_microbatches", "2",
        "--save_checkpoint", "--save_checkpoint_path", str(tmp_path / "ck"),
        "--run_name", "pp_smoke",
    ])
    cli.cmd_train(args)
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path / "ck" / "pp_smoke")) as mgr:
        assert mgr.all_steps() == [0]


def test_cmd_train_auto_resume_kill_restart(tmp_path, monkeypatch):
    """Elastic loop: train 1 epoch + checkpoint, 'restart the job' with
    --resume_from_checkpoint auto and a bigger epoch budget, and assert
    the rebuilt process resumes AFTER the completed epoch (exactly one new
    epoch runs) with step continuity in the written checkpoints."""
    import dataclasses

    from dreamvla_tpu import config as dvconfig
    from dreamvla_tpu.utils.testing import make_disk_calvin

    def tiny_with_text():
        cfg, tcfg = dvconfig.tiny_test()
        return dataclasses.replace(cfg, include_text_encoder=True), tcfg

    monkeypatch.setitem(dvconfig.PRESETS, "tiny_test", tiny_with_text)

    from dreamvla_tpu.parallel import train_step as dvts
    from dreamvla_tpu.utils.testing import cached_train_state

    orig_cts = dvts.create_train_state

    def cached_cts(model, tcfg, batch, rng, total_steps, steps_per_epoch=1000):
        del rng
        return cached_train_state(model, tcfg, batch, 0, total_steps,
                                  steps_per_epoch, create_fn=orig_cts)

    monkeypatch.setattr(dvts, "create_train_state", cached_cts)

    from dreamvla_tpu.train import loop as dvloop

    epochs_run = []
    orig_epoch = dvloop.train_one_epoch

    def counting_epoch(model, tcfg, state, step_fn, data_info, epoch, *a,
                       **kw):
        epochs_run.append(epoch)
        return orig_epoch(model, tcfg, state, step_fn, data_info, epoch,
                          *a, **kw)

    # cmd_train does `from dreamvla_tpu.train.loop import train_one_epoch`
    # at call time, so patch the loop module, not cli
    monkeypatch.setattr(dvloop, "train_one_epoch", counting_epoch)

    root = tmp_path / "calvin" / "training"
    make_disk_calvin(str(root))
    base = ["train", "--preset", "tiny_test",
            "--calvin_dataset", str(tmp_path / "calvin"),
            "--batch_size", "8", "--workers", "1",
            "--save_checkpoint", "--save_checkpoint_path",
            str(tmp_path / "ck"), "--run_name", "elastic",
            "--resume_from_checkpoint", "auto"]
    parser = cli.build_parser()

    # run 1: 'auto' with no checkpoint yet -> starts fresh, completes epoch 0
    cli.cmd_train(parser.parse_args(base + ["--num_epochs", "1"]))
    assert epochs_run == [0]

    # 'preemption': process gone; run 2 rebuilds everything and resumes
    epochs_run.clear()
    cli.cmd_train(parser.parse_args(base + ["--num_epochs", "2"]))
    assert epochs_run == [1]  # epoch 0 not re-run

    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path / "ck" / "elastic")) as mgr:
        assert sorted(mgr.all_steps()) == [0, 1]
        p0 = mgr.restore(0)
        p1 = mgr.restore(1)
    assert int(p1["epoch"]) == 1
    assert int(p1["step"]) == 2 * int(p0["step"]) > 0


def test_cli_pack_calvin_and_packed_train(tmp_path, monkeypatch):
    """pack_calvin subcommand -> cmd_train --packed_cache_dir: the packed
    route from argv to a finished epoch + checkpoint (u8 host contract,
    in-graph decode). Mirrors test_cmd_train_pp_end_to_end's tiny setup."""
    import dataclasses

    import numpy as np

    from dreamvla_tpu import config as dvconfig
    from dreamvla_tpu.utils.testing import make_disk_calvin

    def tiny_with_text():
        cfg, tcfg = dvconfig.tiny_test()
        return dataclasses.replace(cfg, include_text_encoder=True), tcfg

    monkeypatch.setitem(dvconfig.PRESETS, "tiny_test", tiny_with_text)

    from dreamvla_tpu.parallel import train_step as dvts
    from dreamvla_tpu.utils.testing import cached_train_state

    orig_cts = dvts.create_train_state

    def cached_cts(model, tcfg, batch, rng, total_steps, steps_per_epoch=1000):
        del rng
        return cached_train_state(model, tcfg, batch, 0, total_steps,
                                  steps_per_epoch, create_fn=orig_cts)

    monkeypatch.setattr(dvts, "create_train_state", cached_cts)

    root = tmp_path / "calvin" / "training"
    make_disk_calvin(str(root))
    # pack_calvin reads the episode index; make_disk_calvin only writes
    # the lang annotations
    np.save(root / "ep_start_end_ids.npy", np.array([[0, 23]]))

    cfg, _ = tiny_with_text()
    parser = cli.build_parser()
    cli.cmd_pack_calvin(parser.parse_args([
        "pack_calvin", "--data_root", str(tmp_path / "calvin"),
        "--out_dir", str(tmp_path / "packed"),
        "--image_size", str(cfg.image_size),
        "--frames_per_shard", "10"]))
    assert (tmp_path / "packed" / "packed_index.json").exists()

    cli.cmd_train(parser.parse_args([
        "train", "--preset", "tiny_test",
        "--calvin_dataset", str(tmp_path / "calvin"),
        "--packed_cache_dir", str(tmp_path / "packed"),
        "--batch_size", "8", "--num_epochs", "1", "--workers", "1",
        "--save_checkpoint", "--save_checkpoint_path", str(tmp_path / "ck"),
        "--run_name", "packed_smoke"]))
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(str(tmp_path / "ck" / "packed_smoke")) as mgr:
        assert mgr.all_steps() == [0]
