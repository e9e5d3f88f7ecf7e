"""Data pipeline tests over synthetic on-disk fixtures (CALVIN + LIBERO)."""

import json
import os

import numpy as np
import pytest

from dreamvla_tpu.data.calvin import CalvinDataset, get_calvin_dataset
from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.libero import LiberoDataset
from dreamvla_tpu.data.loader import PrefetchLoader, ShardedSampler
from dreamvla_tpu.data.tokenizer import HashTokenizer
from dreamvla_tpu.data.transforms import clip_image_transform


# ------------------------------------------------------------------ fixtures
@pytest.fixture(scope="module")
def calvin_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin") / "training"
    root.mkdir()
    rng = np.random.default_rng(0)
    n = 40
    for i in range(n):
        np.savez(
            root / f"episode_{i:07d}.npz",
            rgb_static=rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (84, 84, 3), dtype=np.uint8),
            depth_static=rng.random((200, 200)).astype(np.float32),
            depth_gripper=rng.random((84, 84)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6), [1.0 if i % 2 else -1.0]]).astype(np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14), [1.0 if i % 3 else -1.0]]).astype(np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
    ann = {
        "info": {"indx": [(0, 19), (20, 39)]},
        "language": {"ann": ["lift the red block", "open the drawer"],
                     "task": ["lift_red_block", "open_drawer"]},
    }
    lang_dir = root / "lang_annotations"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy", ann)
    np.save(root / "ep_start_end_ids.npy", np.array([[0, 19], [20, 39]]))
    return root


@pytest.fixture(scope="module")
def libero_root(tmp_path_factory):
    import h5py

    base = tmp_path_factory.mktemp("libero")
    name = "libero_tiny_converted"
    rng = np.random.default_rng(1)
    info = []
    for ep in ["demo_0", "demo_1"]:
        steps = 8
        info.append([ep, steps])
        for s in range(steps):
            d = base / name / "episodes" / ep / "steps" / f"{s:04d}"
            d.mkdir(parents=True)
            from PIL import Image

            Image.fromarray(rng.integers(0, 255, (128, 128, 3),
                                         dtype=np.uint8)).save(
                d / "image_primary.jpg")
            Image.fromarray(rng.integers(0, 255, (128, 128, 3),
                                         dtype=np.uint8)).save(
                d / "image_wrist.jpg")
            with h5py.File(d / "other.h5", "w") as f:
                f["action"] = rng.normal(size=7).astype(np.float32)
                g = f.create_group("observation")
                g["tcp_pose"] = rng.normal(size=7).astype(np.float32)
                g["proprio"] = rng.normal(size=7).astype(np.float32)
                g["gripper_state"] = np.float32(-1.0 if s % 2 else 1.0)
                f["language_instruction"] = b"put the bowl on the stove"
    data_info = base / "data_info"
    data_info.mkdir()
    with open(data_info / f"{name}.json", "w") as f:
        json.dump(info, f)
    return base, name, str(data_info)


# -------------------------------------------------------------------- tests
def test_calvin_lang_index(calvin_root):
    ds = CalvinDataset(str(calvin_root), key="lang", window_size=4,
                       act_step=2, pred_num=1)
    # window = 4+1+0 = 5; per 20-frame episode: 20-5+1... range(start, end+1-5)
    assert ds.window == 5
    assert len(ds) == 2 * len(range(0, 19 + 1 - 5))
    s = ds[0]
    assert s["rgb_static"].shape == (5, 200, 200, 3)
    assert s["rel_actions"].shape == (5, 7)
    assert s["lang"] == "lift the red block"


def test_calvin_vis_and_except_lang_index(calvin_root):
    ds = CalvinDataset(str(calvin_root), key="vis", window_size=4, act_step=2)
    assert len(ds) == 2 * 15
    # except_lang requires the except_lang_idx asset; synthesise one
    d = calvin_root / "except_lang_idx"
    d.mkdir(exist_ok=True)
    np.save(d / "except_lang_idx.npy", np.array([[0, 19]]))
    ds2 = CalvinDataset(str(calvin_root), key="except_lang", window_size=4,
                        act_step=2)
    assert len(ds2) == 15


def test_collator_contract(calvin_root):
    ds = CalvinDataset(str(calvin_root), key="lang", window_size=4, act_step=2)
    coll = WindowCollator(HashTokenizer(), window_size=4, act_step=2)
    batch = coll([ds[0], ds[7]])
    assert batch["images_primary"].shape == (2, 4, 3, 224, 224)
    assert batch["depth_primary"].shape == (2, 4, 1, 224, 224)
    assert batch["states"].shape == (2, 4, 7)
    assert batch["actions"].shape == (2, 5, 7)
    assert batch["text_tokens"].shape == (2, 77)
    assert set(np.unique(batch["actions"][..., 6])) <= {0.0, 1.0}
    assert set(np.unique(batch["states"][..., 6])) <= {0.0, 1.0}


def test_full_loader_pipeline(calvin_root):
    info = get_calvin_dataset(str(calvin_root.parent), batch_size=2,
                              window_size=4, act_step=2, num_workers=2,
                              tokenizer=HashTokenizer())
    info.set_epoch(0)
    batches = list(iter(info.dataloader))
    assert len(batches) == info.dataloader.num_batches
    assert batches[0]["images_primary"].shape[0] == 2


def test_sharded_sampler_partition():
    samplers = [ShardedSampler(103, batch_size=4, rank=r, world_size=4,
                               seed=1) for r in range(4)]
    all_batches = [np.concatenate(list(s)) for s in samplers]
    # equal shard sizes, no overlap modulo the wraparound padding
    assert len({len(b) for b in all_batches}) == 1
    # different epoch -> different order
    samplers[0].set_epoch(1)
    b1 = np.concatenate(list(samplers[0]))
    assert not np.array_equal(all_batches[0], b1)


def test_libero_dataset(libero_root):
    base, name, data_info = libero_root
    ds = LiberoDataset(str(base), name, data_info_dir=data_info,
                       window_size=4, act_step=2)
    assert len(ds) == 16  # one window start per step
    s = ds[0]
    assert s["rgb_static"].shape == (5, 128, 128, 3)
    assert s["robot_obs"].shape == (5, 15)
    assert s["lang"] == "put the bowl on the stove"
    # tail windows pad by repetition, rel_actions zero-padded except gripper
    tail = ds[7]  # start at step 7 of an 8-step episode -> 4 padded frames
    assert tail["rgb_static"].shape == (5, 128, 128, 3)
    np.testing.assert_array_equal(tail["rgb_static"][1], tail["rgb_static"][0])
    assert np.all(tail["rel_actions"][1:, :-1] == 0)
    np.testing.assert_array_equal(tail["rel_actions"][1:, -1],
                                  np.repeat(tail["rel_actions"][0, -1], 4))


def test_clip_transform_range():
    img = np.full((1, 200, 200, 3), 128, np.uint8)
    out = clip_image_transform(img)
    assert out.shape == (1, 3, 224, 224)
    # uniform gray maps to (0.5019 - mean)/std per channel
    from dreamvla_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    want = (128 / 255 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(out[0, :, 112, 112], want, atol=1e-3)


def test_partial_data_filters_episodes(calvin_root):
    ds_full = CalvinDataset(str(calvin_root), key="lang", window_size=4,
                            act_step=2)
    ds_part = CalvinDataset(str(calvin_root), key="lang", window_size=4,
                            act_step=2, partial_data=True,
                            partial_ranges=[[0, 19]])
    assert len(ds_part) == len(ds_full) // 2
    assert ds_part[0]["lang"] == "lift the red block"


def test_text_aug_uses_enrich_pool(calvin_root):
    pool = {"lift_red_block": ["grab the crimson cube"]}
    ds = CalvinDataset(str(calvin_root), key="lang", window_size=4,
                       act_step=2, text_aug=True, enrich_lang=pool)
    assert ds[0]["lang"] == "grab the crimson cube"


def test_corrupt_frame_fallback(calvin_root, capsys):
    ds = CalvinDataset(str(calvin_root), key="lang", window_size=4, act_step=2)
    # corrupt the first window's first frame; neighbour windows still load
    victim = calvin_root / "episode_0000000.npz"
    backup = victim.read_bytes()
    try:
        victim.write_bytes(b"corrupt")
        s = ds[0]  # falls through to window starting at frame 1
        assert s["rgb_static"].shape == (5, 200, 200, 3)
        assert "retrying neighbour" in capsys.readouterr().out
    finally:
        victim.write_bytes(backup)
