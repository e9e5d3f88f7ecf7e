"""pred_num>1 loss-path goldens vs torch transcriptions of
train_utils.py:174-213 (label unfold windows), :274-330 (flow-as-mask),
:330-340 (image MSE) — VERDICT r1 item 8: pin the unfold semantics at
pred_num=2/3 and the reference's own pred_num==1 restrictions."""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dreamvla_tpu.ops.patchify import normalize_patchified, patchify
from dreamvla_tpu.train.losses import (flow_activity_mask,
                                       unfold_pred_windows)


def torch_unfold(x, pred_num):
    """train_utils.py:189-193: unfold(1, P, 1).permute(0,1,4,2,3).flatten."""
    t = torch.from_numpy(np.asarray(x))
    t = t.unfold(1, pred_num, 1)
    perm = (0, 1, t.dim() - 1) + tuple(range(2, t.dim() - 1))
    return t.permute(*perm).flatten(0, 1).numpy()


@pytest.mark.parametrize("pred_num", [1, 2, 3])
def test_unfold_windows_match_torch(pred_num):
    rng = np.random.default_rng(0)
    s_eff = 4
    x = rng.normal(size=(2, s_eff + pred_num - 1, 5, 3)).astype(np.float32)
    want = torch_unfold(x, pred_num)
    got = np.asarray(unfold_pred_windows(jnp.asarray(x), pred_num, s_eff))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (2 * s_eff, pred_num, 5, 3)


@pytest.mark.parametrize("pred_num", [2, 3])
def test_image_label_windows_match_reference(pred_num):
    """Full image-label construction at pred_num>1
    (train_utils.py:174-193): slice future window, patchify, per-patch
    normalize, unfold into P-step windows."""
    rng = np.random.default_rng(1)
    bs, s_eff, f, patch = 2, 3, 2, 8
    frames = rng.normal(size=(bs, f + s_eff + pred_num - 1 + 1, 3, 16, 16)
                        ).astype(np.float32)

    # --- torch transcription
    t = torch.from_numpy(frames)
    lab = t[:, f: f + s_eff + pred_num - 1].flatten(0, 1)
    # patchify (train_utils.py:37-50 semantics == ops.patchify, tested
    # in test_ops): reuse ours on the flattened frames for both sides,
    # normalization included, so this test isolates the unfold.
    lab_np = np.asarray(normalize_patchified(
        patchify(jnp.asarray(lab.numpy()), patch)))
    lab_t = torch.from_numpy(lab_np).view(bs, s_eff + pred_num - 1,
                                          *lab_np.shape[1:])
    lab_t = lab_t.unfold(1, pred_num, 1).permute(0, 1, 4, 2, 3).flatten(0, 1)

    # --- ours
    lab_j = frames[:, f: f + s_eff + pred_num - 1]
    b = lab_j.shape[0]
    lab_j = patchify(jnp.asarray(lab_j.reshape((-1,) + lab_j.shape[2:])),
                     patch)
    lab_j = normalize_patchified(lab_j)
    lab_j = lab_j.reshape((b, s_eff + pred_num - 1) + lab_j.shape[1:])
    got = np.asarray(unfold_pred_windows(lab_j, pred_num, s_eff))
    np.testing.assert_allclose(got, lab_t.numpy(), atol=1e-6)


def test_flow_activity_mask_matches_torch():
    """train_utils.py:274-313: avg_pool 2x2 -> L2 norm -> >1.0 ->
    3x3 max-pool dilation (primary) / no dilation (wrist)."""
    rng = np.random.default_rng(2)
    grid = 8
    tracks = (rng.normal(size=(3, 2, grid * grid, 2)) * 2).astype(np.float32)

    t = torch.from_numpy(tracks).reshape(6, grid, grid, 2).permute(0, 3, 1, 2)
    pooled = F.avg_pool2d(t, 2, 2)
    norm = torch.norm(pooled, dim=1)
    mask = (norm > 1.0).unsqueeze(1).float()
    dil = F.max_pool2d(mask, 3, 1, padding=1)
    want_p = dil.reshape(6, 1, (grid // 2) ** 2, 1).numpy()
    want_w = mask.reshape(6, 1, (grid // 2) ** 2, 1).numpy()

    got_p = np.asarray(flow_activity_mask(jnp.asarray(tracks), grid,
                                          dilate=True))
    got_w = np.asarray(flow_activity_mask(jnp.asarray(tracks), grid,
                                          dilate=False))
    np.testing.assert_array_equal(got_p, want_p)
    np.testing.assert_array_equal(got_w, want_w)


def _tiny_setup(pred_num, **tcfg_kw):
    from dreamvla_tpu.config import tiny_test
    from dreamvla_tpu.train.losses import compute_losses

    mcfg, tcfg = tiny_test()
    mcfg = dataclasses.replace(mcfg, pred_num=pred_num, dino_feat_pred=True,
                               sam_feat_pred=True)
    tcfg = dataclasses.replace(tcfg, loss_dino_feat=True, loss_sam_feat=True,
                               loss_action=False, loss_image=False,
                               loss_depth=False, loss_trajectory=False,
                               **tcfg_kw)
    return mcfg, tcfg, compute_losses


def test_feat_cosine_rejects_prednum_gt1():
    """The reference asserts pred_num==1 in the dino/sam cosine path
    (train_utils.py:420-422); we must error, not silently drop windows."""
    from dreamvla_tpu.models.dreamvla import DreamVLAOutputs

    mcfg, tcfg, compute_losses = _tiny_setup(pred_num=2)
    s = mcfg.sequence_length
    rng = np.random.default_rng(3)
    n_tok = 4
    batch = {
        "dino_primary": rng.normal(size=(1, s + 4, n_tok, 8)),
        "dino_wrist": rng.normal(size=(1, s + 4, n_tok, 8)),
        "action_chunks": rng.normal(size=(1, s, mcfg.action_pred_steps, 7)),
    }
    outputs = DreamVLAOutputs(
        dino_pred=jnp.asarray(rng.normal(size=(s, 2, 2, n_tok, 8)),
                              jnp.float32))
    with pytest.raises(ValueError, match="pred_num==1"):
        compute_losses(mcfg, dataclasses.replace(tcfg, loss_sam_feat=False),
                       outputs, batch)


def test_flow_as_mask_rejects_prednum_gt1():
    from dreamvla_tpu.config import tiny_test
    from dreamvla_tpu.models.dreamvla import DreamVLAOutputs
    from dreamvla_tpu.train.losses import compute_losses

    mcfg, tcfg = tiny_test()
    mcfg = dataclasses.replace(mcfg, pred_num=2, obs_pred=True)
    tcfg = dataclasses.replace(tcfg, loss_image=True, flow_as_mask=True,
                               loss_action=False)
    s = mcfg.sequence_length
    rng = np.random.default_rng(4)
    n_patch = (mcfg.image_size // mcfg.patch_size) ** 2
    batch = {
        "images_primary": rng.normal(
            size=(1, s + 6, 3, mcfg.image_size, mcfg.image_size)),
        "images_wrist": rng.normal(
            size=(1, s + 6, 3, mcfg.image_size, mcfg.image_size)),
        "tracks": rng.normal(size=(1, s + 6, mcfg.traj_grid ** 2, 2)),
        "tracks_gripper": rng.normal(size=(1, s + 6, mcfg.traj_grid ** 2, 2)),
        "action_chunks": rng.normal(size=(1, s, mcfg.action_pred_steps, 7)),
    }
    outputs = DreamVLAOutputs(
        image_pred=jnp.asarray(rng.normal(
            size=(s, 2, 2, n_patch, 3 * mcfg.patch_size ** 2)), jnp.float32))
    with pytest.raises(ValueError, match="pred_num==1"):
        compute_losses(mcfg, tcfg, outputs, batch)
