"""Extractor pipeline tests (random weights; shapes + artifacts + oracles)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dreamvla_tpu.extract.sam_encoder import (
    _get_rel_pos, sam_preprocess, window_partition, window_unpartition)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 4)).astype(np.float32))
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 3 * 3, 4, 4, 4)
    back = window_unpartition(wins, 4, pad_hw, (10, 10))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_rel_pos_matches_torch_semantics():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    rel = rng.normal(size=(27, 8)).astype(np.float32)  # 2*14-1
    got = np.asarray(_get_rel_pos(14, 14, jnp.asarray(rel)))
    # torch reference (segment-anything get_rel_pos, no interpolation case)
    q = torch.arange(14)[:, None] * max(14 / 14, 1.0)
    k = torch.arange(14)[None, :] * max(14 / 14, 1.0)
    idx = (q - k) + (14 - 1) * max(14 / 14, 1.0)
    want = torch.from_numpy(rel)[idx.long()].numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sam_preprocess_shapes_and_padding():
    img = np.full((1, 100, 200, 3), 255, np.uint8)
    out = sam_preprocess(img, target=256)
    assert out.shape == (1, 3, 256, 256)
    # long side 200 -> 256, short side 100 -> 128; rows 128+ are zero pad
    assert np.abs(out[0, :, 200:, :]).max() == 0.0
    assert np.abs(out[0, :, :128, :]).max() > 0


def test_dino_extractor_shapes(tmp_path):
    from dreamvla_tpu.extract.pipeline import (DinoFeatureExtractor,
                                               extract_episode_features)

    class Tiny(DinoFeatureExtractor):
        def __init__(self):
            from dreamvla_tpu.extract.dinov2 import DinoV2ViT

            self.model = DinoV2ViT(img_size=28, patch_size=14, embed_dim=32,
                                   depth=1, num_heads=4, pretrain_grid=2)
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 28, 28)))["params"]
            self._fn = jax.jit(
                lambda p, x: self.model.apply({"params": p}, x)[0])

        def __call__(self, frames):
            from dreamvla_tpu.extract.pipeline import dino_preprocess

            return np.asarray(
                self._fn(self.params,
                         jnp.asarray(dino_preprocess(frames, size=28))))

    ex = Tiny()
    rng = np.random.default_rng(2)
    frames = {i: rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
              for i in range(5)}
    n = extract_episode_features(frames, ex, str(tmp_path / "dino"),
                                 batch_size=2)
    assert n == 5
    feat = np.load(tmp_path / "dino" / "0.npy")
    assert feat.shape == (4, 32)  # 2x2 grid of patch tokens
    # skip-existing on rerun
    assert extract_episode_features(frames, ex, str(tmp_path / "dino")) == 0


def test_sam_encoder_tiny_forward():
    from dreamvla_tpu.extract.sam_encoder import SAMImageEncoder

    model = SAMImageEncoder(img_size=64, patch_size=16, embed_dim=32,
                            depth=2, num_heads=4, out_chans=16,
                            window_size=2, global_attn_indexes=(1,))
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 3, 64, 64)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_cotracker_interface_zero_fill():
    from dreamvla_tpu.extract.pipeline import CoTrackerExtractor

    ex = CoTrackerExtractor(grid=28)
    tracks, vis = ex(np.zeros((4, 224, 224, 3), np.uint8))
    assert tracks.shape == (4, 784, 2) and vis.shape == (4, 784)


def test_merge_features_into_episodes(tmp_path):
    from dreamvla_tpu.extract.pipeline import (atomic_save_npy,
                                               merge_features_into_episodes)

    ep_dir = tmp_path / "eps"
    ep_dir.mkdir()
    for i in range(3):
        np.savez(ep_dir / f"episode_{i:07d}.npz", rgb_static=np.zeros((4, 4, 3)))
    feat_dir = tmp_path / "dino"
    feat_dir.mkdir()
    for i in range(3):
        atomic_save_npy(str(feat_dir / f"{i}.npy"), np.full((2, 2), i, np.float32))
    n = merge_features_into_episodes(
        str(ep_dir), {"dino": str(feat_dir)}, str(tmp_path / "out"),
        {"dino_static": "dino"})
    assert n == 3
    with np.load(tmp_path / "out" / "episode_0000001.npz") as z:
        assert z["dino_static"][0, 0] == 1.0
        assert "rgb_static" in z.files
