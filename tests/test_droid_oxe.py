"""DROID/OXE per-step datasets + LIBERO converter over synthetic fixtures."""

import json

import numpy as np
import pytest

from dreamvla_tpu.data.droid_oxe import (MixtureDataset, PerStepDataset,
                                         get_droid_dataset)


@pytest.fixture(scope="module")
def droid_root(tmp_path_factory):
    import h5py
    from PIL import Image

    base = tmp_path_factory.mktemp("droid")
    rng = np.random.default_rng(0)
    info = []
    for name, eps in [("droid_tiny", 2)]:
        for e in range(eps):
            ep = f"ep{e:04d}"
            steps = 9
            info.append([ep, steps])
            for s in range(steps):
                d = base / name / "episodes" / ep / "steps" / f"{s:04d}"
                d.mkdir(parents=True)
                for img in ("image_primary", "image_wrist"):
                    Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                                 dtype=np.uint8)).save(
                        d / f"{img}.jpg")
                with h5py.File(d / "other.h5", "w") as f:
                    f["action_delta_wrist_pose"] = np.array(
                        [0.01, 0.01, 0.01, 0.02, 0.02, 0.02, 1.0], np.float32)
                    f["language_instruction"] = b"pick up the cup"
                    g = f.create_group("observation")
                    g["gripper_pose6d"] = rng.normal(size=6).astype(np.float32)
                    g["gripper_open_state"] = np.array([1.0], np.float32)
                    g["joint_position"] = rng.normal(size=7).astype(np.float32)
    di = base / "data_info"
    di.mkdir()
    with open(di / "droid_tiny_info.json", "w") as f:
        json.dump(info, f)
    return base


def test_droid_dataset_window_and_scaling(droid_root):
    ds = PerStepDataset(str(droid_root), "droid_tiny", "droid_tiny_info",
                        data_info_dir=str(droid_root / "data_info"),
                        window_size=3, act_step=2, layout="droid")
    # per episode starts = 9 - (3+1) = 5, two episodes
    assert len(ds) == 10
    s = ds[0]
    assert s["rgb_static"].shape == (4, 64, 64, 3)
    # 0.01 / 0.02 = 0.5 pos scaling; 0.02 / 0.05 = 0.4 orn scaling
    np.testing.assert_allclose(s["rel_actions"][0, :3], 0.5, atol=1e-6)
    np.testing.assert_allclose(s["rel_actions"][0, 3:6], 0.4, atol=1e-6)
    assert s["lang"] == "pick up the cup"


def test_oxe_10x_exception(droid_root):
    # same tree read through the OXE loader with a 10x-scaled dataset name
    import shutil

    src = droid_root / "droid_tiny" / "episodes"
    tgt = droid_root / "berkeley_autolab_ur5"
    if not tgt.exists():
        shutil.copytree(src, tgt)
        with open(droid_root / "data_info" / "berkeley_autolab_ur5.json", "w") as f:
            json.dump([["ep0000", 9], ["ep0001", 9]], f)
    ds = PerStepDataset(str(droid_root), "berkeley_autolab_ur5",
                        "berkeley_autolab_ur5",
                        data_info_dir=str(droid_root / "data_info"),
                        window_size=3, act_step=2, layout="oxe")
    s = ds[0]
    np.testing.assert_allclose(s["rel_actions"][0, :3], 0.05, atol=1e-6)
    # no-joints exception leaves slots 7:14 zero
    assert np.all(s["robot_obs"][:, 7:14] == 0)


def test_mixture_bisect(droid_root):
    a = PerStepDataset(str(droid_root), "droid_tiny", "droid_tiny_info",
                       data_info_dir=str(droid_root / "data_info"),
                       window_size=3, act_step=2)
    mix = MixtureDataset([a, a])
    assert len(mix) == 2 * len(a)
    np.testing.assert_array_equal(mix[len(a)]["robot_obs"],
                                  a[0]["robot_obs"])


def test_libero_converter_roundtrip(tmp_path):
    import h5py

    from dreamvla_tpu.data.convert_libero import convert_suite
    from dreamvla_tpu.data.libero import LiberoDataset

    rng = np.random.default_rng(1)
    src = tmp_path / "raw"
    src.mkdir()
    with h5py.File(src / "KITCHEN_SCENE1_open_the_drawer_demo.hdf5", "w") as f:
        d = f.create_group("data")
        for k in range(2):
            g = d.create_group(f"demo_{k}")
            t = 6
            o = g.create_group("obs")
            o["agentview_rgb"] = rng.integers(0, 255, (t, 64, 64, 3),
                                              dtype=np.uint8)
            o["eye_in_hand_rgb"] = rng.integers(0, 255, (t, 64, 64, 3),
                                                dtype=np.uint8)
            o["joint_states"] = rng.normal(size=(t, 7)).astype(np.float32)
            o["ee_states"] = rng.normal(size=(t, 6)).astype(np.float32)
            o["gripper_states"] = rng.normal(size=(t, 2)).astype(np.float32)
            g["actions"] = np.concatenate(
                [rng.normal(size=(t, 6)),
                 np.sign(rng.normal(size=(t, 1)))], axis=1).astype(np.float32)

    out_root = tmp_path / "converted"
    di = tmp_path / "data_info"
    convert_suite(str(src), str(out_root), "libero_demo",
                  data_info_dir=str(di))
    with open(di / "libero_demo_converted.json") as f:
        index = json.load(f)
    assert index == [["000000", 6], ["000001", 6]]

    ds = LiberoDataset(str(out_root), "libero_demo_converted",
                       data_info_dir=str(di), window_size=3, act_step=2)
    s = ds[0]
    assert s["rgb_static"].shape == (4, 64, 64, 3)
    assert s["lang"] == "open the drawer"
    # carried gripper state: step 1's gripper_state equals action[0][-1]
    with h5py.File(out_root / "libero_demo_converted" / "episodes" / "000000"
                   / "steps" / "0001" / "other.h5") as f:
        gs = float(f["observation"]["gripper_state"][()])
        a0 = float(f["action"][-1]) if False else None
    with h5py.File(out_root / "libero_demo_converted" / "episodes" / "000000"
                   / "steps" / "0000" / "other.h5") as f:
        a0 = float(f["action"][()][-1])
    assert gs == a0
