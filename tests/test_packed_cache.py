"""Packed frame-record cache: build, read, collate and device-decode parity.

The packed cache must be numerically invisible: a batch assembled from the
packed shards (either host-normalised f32 or uint8 + on-device decode) has
to match the per-frame-npz pipeline bit-for-bit for images/actions/states
and to float16 precision for packed feature labels.
"""

import numpy as np
import pytest

from dreamvla_tpu.data.calvin import CalvinDataset
from dreamvla_tpu.data.collate import WindowCollator
from dreamvla_tpu.data.packed_cache import (PackedCalvinDataset,
                                            build_packed_cache,
                                            get_packed_calvin_dataset)
from dreamvla_tpu.data.tokenizer import HashTokenizer

WINDOW, ACT = 4, 2


@pytest.fixture(scope="module")
def calvin_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin_packed") / "training"
    root.mkdir()
    rng = np.random.default_rng(7)
    n = 30
    for i in range(n):
        np.savez(
            root / f"episode_{i:07d}.npz",
            rgb_static=rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (84, 84, 3), dtype=np.uint8),
            depth_static=rng.random((200, 200)).astype(np.float32),
            depth_gripper=rng.random((84, 84)).astype(np.float32),
            rel_actions=np.concatenate(
                [rng.normal(size=6), [1.0 if i % 2 else -1.0]]).astype(
                    np.float32),
            robot_obs=np.concatenate(
                [rng.normal(size=14), [1.0 if i % 3 else -1.0]]).astype(
                    np.float32),
            scene_obs=rng.normal(size=24).astype(np.float32),
        )
    # a GAP between the episode ranges (frames 14/15 exist but belong to
    # no range) exercises the id-discontinuity shard split
    ann = {
        "info": {"indx": [(0, 13), (16, 29)]},
        "language": {"ann": ["stack the blocks", "close the drawer"],
                     "task": ["stack_block", "close_drawer"]},
    }
    lang_dir = root / "lang_annotations"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy", ann)
    np.save(root / "ep_start_end_ids.npy", np.array([[0, 13], [16, 29]]))
    return root


@pytest.fixture(scope="module")
def packed_dir(calvin_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("packed_out")
    # frames_per_shard=7 forces windows across shard boundaries AND a new
    # shard at the 14->15 episode-range discontinuity
    index = build_packed_cache(str(calvin_root), str(out),
                               frames_per_shard=7, progress_every=0)
    assert index["num_frames"] == 28
    # 0..13 (shards of 7,7) then a fresh shard at the 13->16 gap: 16..29
    assert [s["start"] for s in index["shards"]] == [0, 7, 16, 23]
    assert [s["count"] for s in index["shards"]] == [7, 7, 7, 7]
    return out


def _datasets(calvin_root, packed_dir):
    base = CalvinDataset(str(calvin_root), window_size=WINDOW, act_step=ACT)
    packed = PackedCalvinDataset(str(calvin_root), str(packed_dir),
                                 window_size=WINDOW, act_step=ACT)
    return base, packed


def test_packed_window_matches_raw_pipeline(calvin_root, packed_dir):
    """f32-mode collated batches from packed vs raw are identical
    (images/depth bit-equal: the stored u8 crop IS the PIL intermediate)."""
    base, packed = _datasets(calvin_root, packed_dir)
    assert len(base) == len(packed)
    tok = HashTokenizer()
    coll = WindowCollator(tok, WINDOW, ACT)
    for idx in (0, 3, len(base) - 1):  # idx 3 window crosses shard 0/1
        b_raw = coll([base[idx]])
        b_pk = coll([packed[idx]])
        assert set(b_raw) == set(b_pk)
        for k in b_raw:
            np.testing.assert_array_equal(
                b_raw[k], b_pk[k], err_msg=f"{k} differs at idx {idx}")


def test_u8_mode_ships_uint8_and_device_decode_matches(calvin_root,
                                                       packed_dir):
    """image_mode='u8' ships uint8 CHW; decode_packed_batch reproduces the
    host-normalised f32 batch exactly."""
    import jax.numpy as jnp

    from dreamvla_tpu.parallel.train_step import decode_packed_batch

    _, packed = _datasets(calvin_root, packed_dir)
    tok = HashTokenizer()
    f32 = WindowCollator(tok, WINDOW, ACT)([packed[2]])
    u8 = WindowCollator(tok, WINDOW, ACT, image_mode="u8")([packed[2]])
    assert u8["images_primary"].dtype == np.uint8
    assert u8["images_wrist"].dtype == np.uint8
    dec = decode_packed_batch({k: jnp.asarray(v) for k, v in u8.items()})
    for k in f32:
        np.testing.assert_allclose(np.asarray(dec[k]), f32[k], atol=1e-6,
                                   err_msg=k)


def test_packed_features_roundtrip(calvin_root, tmp_path_factory):
    """DINO/SAM .pt sidecars and CoTracker npz labels pack (f16) and read
    back through the sample contract (dino_primary/sam_primary/tracks…)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(3)
    feat_root = tmp_path_factory.mktemp("feats")
    dino, sam, tracks = (feat_root / n for n in ("dino", "sam", "tracks"))
    for fid in range(30):
        for cam in ("rgb_static", "rgb_gripper"):
            d = dino / cam / "training"
            d.mkdir(parents=True, exist_ok=True)
            torch.save(torch.tensor(rng.normal(size=(256, 768)),
                                    dtype=torch.bfloat16), d / f"{fid}.pt")
            s = sam / cam / "training"
            s.mkdir(parents=True, exist_ok=True)
            # stored transposed on disk (reference data_utils.py:1131)
            torch.save(torch.tensor(rng.normal(size=(256, 256)),
                                    dtype=torch.bfloat16), s / f"{fid}.pt")
            t = tracks / cam / "training"
            t.mkdir(parents=True, exist_ok=True)
            np.savez(t / f"{fid}.npz",
                     tracks=rng.normal(size=(784, 2)).astype(np.float32),
                     visibility=rng.integers(0, 2, 784).astype(np.uint8))

    out = tmp_path_factory.mktemp("packed_feats")
    build_packed_cache(str(calvin_root), str(out), frames_per_shard=64,
                       dino_features_path=str(dino),
                       sam_features_path=str(sam),
                       track_label_path=str(tracks), progress_every=0)

    base = CalvinDataset(str(calvin_root), window_size=WINDOW, act_step=ACT,
                         load_dino_features=True,
                         dino_features_path=str(dino),
                         load_sam_features=True, sam_features_path=str(sam),
                         load_track_labels=True,
                         track_label_path=str(tracks))
    packed = PackedCalvinDataset(str(calvin_root), str(out),
                                 window_size=WINDOW, act_step=ACT)
    s_raw, s_pk = base[1], packed[1]
    for k in ("dino_primary", "dino_wrist", "sam_primary", "sam_wrist"):
        assert s_pk[k].dtype == np.float16
        np.testing.assert_allclose(s_pk[k].astype(np.float32), s_raw[k],
                                   atol=2e-2, rtol=2e-2, err_msg=k)
    for k in ("tracks", "tracks_gripper"):
        np.testing.assert_array_equal(s_pk[k], s_raw[k])
    for k in ("track_vis", "track_vis_gripper"):
        np.testing.assert_array_equal(s_pk[k].astype(np.float32), s_raw[k])


def test_train_step_u8_batch_matches_f32(calvin_root, packed_dir):
    """The full train step on the packed u8 host contract produces the
    same losses as on the pre-decoded f32 batch (decode_packed_batch runs
    in-graph inside loss_fn for every regime)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import tiny_test
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.parallel.train_step import (build_train_step,
                                                  create_train_state,
                                                  decode_packed_batch)
    from dreamvla_tpu.utils.testing import make_synthetic_batch

    cfg, tcfg = tiny_test()
    tcfg = dataclasses.replace(tcfg, batch_size=2)
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=2, seed=3)
    rng = np.random.default_rng(5)
    # rebuild the images as a u8 packed contract + its exact f32 decode
    for k in ("images_primary", "images_wrist"):
        batch[k] = rng.integers(0, 256, size=batch[k].shape,
                                dtype=np.uint8)
    batch_u8 = {k: jnp.asarray(v) for k, v in batch.items()}
    batch_f32 = decode_packed_batch(batch_u8)
    assert batch_f32["images_primary"].dtype == jnp.float32

    state, tx, _ = create_train_state(model, tcfg, batch, jax.random.PRNGKey(0),
                                      total_steps=10, cheap_init=True)
    step = build_train_step(model, tcfg, tx, mesh=None, donate=False)
    r = jax.random.PRNGKey(1)
    add_accum = lambda b: jax.tree.map(lambda v: v[None], b)  # noqa: E731
    _, losses_u8 = step(state, add_accum(batch_u8), r)
    _, losses_f32 = step(state, add_accum(batch_f32), r)
    np.testing.assert_allclose(float(losses_u8.total),
                               float(losses_f32.total), rtol=1e-5)
    np.testing.assert_allclose(float(losses_u8.image),
                               float(losses_f32.image), rtol=1e-5)


def test_get_packed_calvin_dataset_loader(calvin_root, packed_dir):
    """End-to-end loader assembly over the packed cache (u8 default)."""
    info = get_packed_calvin_dataset(
        str(calvin_root.parent), str(packed_dir), batch_size=2,
        window_size=WINDOW, act_step=ACT, num_workers=2,
        tokenizer=HashTokenizer())
    info.set_epoch(0)
    batch = next(iter(info.dataloader))
    assert batch["images_primary"].shape == (2, WINDOW, 3, 224, 224)
    assert batch["images_primary"].dtype == np.uint8
    assert batch["actions"].shape == (2, WINDOW + ACT - 1, 7)
    assert set(np.unique(batch["actions"][..., 6])) <= {0.0, 1.0}
