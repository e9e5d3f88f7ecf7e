"""Loss assembly for DreamVLA training.

Capability parity with reference `utils/train_utils.py:158-585` (the 7-term
weighted sum) and `utils/sigloss.py` (SiLog depth loss):

  total = arm_ratio * smooth_l1(arm)            (:159-161)
        + gripper_ratio * bce(gripper)          (:162-164)
        + 0.1   * image mse (flow-masked opt.)  (:274-337, :585)
        + 0.001 * SiLog depth                   (:341-380)
        + 0.1   * [0.1 * traj mse]              (:457-502)
        + 0.01  * dino cosine                   (:407-425)
        + 0.01  * sam cosine                    (:432-450)

With the DiT head the action term is the diffusion loss passthrough
(:168-170). All label constructions (future-frame patchify+normalise,
pred_num unfolding, pixel-unshuffle flow packing, flow-as-mask dilation)
match the reference bit-for-bit and are pure jnp — they run fused on device
inside the train step instead of per-batch host code.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from dreamvla_tpu.config import DreamVLAConfig, TrainConfig
from dreamvla_tpu.models.dreamvla import DreamVLAOutputs
from dreamvla_tpu.ops.patchify import (
    normalize_patchified,
    patchify,
    pixel_unshuffle_tracks,
    unpatchify,
)


@struct.dataclass
class LossOutputs:
    total: jnp.ndarray
    arm_action: jnp.ndarray
    gripper_action: jnp.ndarray
    image: jnp.ndarray
    depth: jnp.ndarray
    trajectory: jnp.ndarray
    dino: jnp.ndarray
    sam: jnp.ndarray


def smooth_l1(pred, target, beta: float = 1.0):
    """torch.nn.functional.smooth_l1_loss with default beta=1, mean."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def binary_cross_entropy(p, target, eps: float = 1e-12):
    p = jnp.clip(p, eps, 1.0 - eps)
    return jnp.mean(-(target * jnp.log(p) + (1 - target) * jnp.log1p(-p)))


def silog_loss(pred, target, lambd: float = 0.5, eps: float = 1e-6):
    diff = jnp.log(target + eps) - jnp.log(pred + eps)
    return jnp.sqrt(
        jnp.maximum(jnp.mean(diff**2) - lambd * jnp.mean(diff) ** 2, 0.0)
    )


def cosine_dissimilarity(pred, target, eps: float = 1e-8):
    """mean(1 - cos_sim) along the last axis (torch cosine_similarity eps)."""
    pn = jnp.maximum(jnp.linalg.norm(pred, axis=-1), eps)
    tn = jnp.maximum(jnp.linalg.norm(target, axis=-1), eps)
    cos = jnp.sum(pred * target, axis=-1) / (pn * tn)
    return jnp.mean(1.0 - cos)


def unfold_pred_windows(x: jnp.ndarray, pred_num: int, s_eff: int) -> jnp.ndarray:
    """(B, s_eff+P-1, ...) -> (B*s_eff, P, ...): sliding windows of length P
    (the reference's tensor.unfold(1, P, 1).permute(...).flatten(0,1))."""
    wins = jnp.stack([x[:, j : j + s_eff] for j in range(pred_num)], axis=2)
    return wins.reshape((-1, pred_num) + x.shape[2:])


def flow_activity_mask(tracks: jnp.ndarray, grid: int, threshold: float = 1.0,
                       dilate: bool = True) -> jnp.ndarray:
    """(N, P, grid*grid, 2) flow deltas -> (N*P, 1, (grid/2)^2, 1) binary
    mask: 2x2 avg-pool, L2-norm > threshold, optional 3x3 max-pool dilation
    (train_utils.py:274-313; the wrist mask skips dilation)."""
    n, p, hw, c = tracks.shape
    t = tracks.reshape(n * p, grid, grid, c)
    g2 = grid // 2
    pooled = t.reshape(n * p, g2, 2, g2, 2, c).mean(axis=(2, 4))  # (N*P,g2,g2,2)
    norm = jnp.linalg.norm(pooled, axis=-1)
    mask = (norm > threshold).astype(jnp.float32)
    if dilate:
        mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
        mask = jnp.maximum(mask, 0.0)
    return mask.reshape(n * p, 1, g2 * g2, 1)


def compute_losses(
    cfg: DreamVLAConfig,
    tcfg: TrainConfig,
    outputs: DreamVLAOutputs,
    batch: Dict[str, jnp.ndarray],
) -> LossOutputs:
    """batch fields (the reference 13-slot collator contract, as a dict):
      images_primary/images_wrist: (B, W, 3, H, W') full window incl. future
      depth_primary/depth_wrist:   (B, W, 1, H, W') optional
      dino_primary/dino_wrist:     (B, W, 256, 768) optional
      sam_primary/sam_wrist:       (B, W, 256, 256) optional
      tracks/tracks_gripper:       (B, W, G*G, 2) optional
      action_chunks:               (B, S, steps, 7) labels (gripper in {0,1})
    """
    zero = jnp.zeros((), jnp.float32)
    s = cfg.sequence_length
    g = cfg.atten_goal
    s_eff = s - g
    p = cfg.pred_num
    f = tcfg.future_steps

    # ---- action ----------------------------------------------------------
    arm_l = grip_l = zero
    if cfg.use_dit_head:
        arm_l = outputs.dit_loss if outputs.dit_loss is not None else zero
    elif tcfg.loss_action and cfg.action_pred_steps > 0:
        labels = batch["action_chunks"][:, :s_eff]
        arm_l = smooth_l1(outputs.arm_action[:, :s_eff].astype(jnp.float32),
                          labels[..., :6].astype(jnp.float32))
        grip_l = binary_cross_entropy(
            outputs.gripper_action[:, :s_eff].astype(jnp.float32),
            labels[..., 6:].astype(jnp.float32))

    # ---- image -----------------------------------------------------------
    img_l = zero
    if tcfg.loss_image and cfg.obs_pred:
        def labelize(frames):
            lab = frames[:, f : f + s_eff + p - 1]
            b = lab.shape[0]
            lab = patchify(lab.reshape((-1,) + lab.shape[2:]), cfg.patch_size)
            lab = normalize_patchified(lab)
            lab = lab.reshape((b, s_eff + p - 1) + lab.shape[1:])
            return unfold_pred_windows(lab, p, s_eff)  # (B*s_eff, P, L, C)

        lab_p = labelize(batch["images_primary"].astype(jnp.float32))
        lab_w = labelize(batch["images_wrist"].astype(jnp.float32))
        pred = outputs.image_pred.astype(jnp.float32)
        bsz = batch["images_primary"].shape[0]
        pred = pred.reshape((bsz, s) + pred.shape[1:])[:, :s_eff]
        pred = pred.reshape((-1,) + pred.shape[2:])  # (B*s_eff, 2, P, L, C)
        if tcfg.flow_as_mask and "tracks" in batch:
            if p != 1:
                # the reference's mask has B*(s_eff+p-1) frames vs
                # B*s_eff prediction windows -> shape error at p>1
                # (train_utils.py:274-330); fail with a clear message
                raise ValueError(
                    "flow_as_mask is defined for pred_num==1 only "
                    "(reference train_utils.py:274-330 shapes)")
            tr_p = batch["tracks"][:, : s_eff + p - 1].astype(jnp.float32)
            tr_w = batch["tracks_gripper"][:, : s_eff + p - 1].astype(jnp.float32)
            m_p = flow_activity_mask(tr_p, cfg.traj_grid, dilate=True)
            m_w = flow_activity_mask(tr_w, cfg.traj_grid, dilate=False)
            img_l = 0.5 * (
                jnp.mean((pred[:, 0] * m_p - lab_p * m_p) ** 2)
                + jnp.mean((pred[:, 1] * m_w - lab_w * m_w) ** 2))
        else:
            img_l = 0.5 * (jnp.mean((pred[:, 0] - lab_p) ** 2)
                           + jnp.mean((pred[:, 1] - lab_w) ** 2))

    # ---- depth -----------------------------------------------------------
    depth_l = zero
    if tcfg.loss_depth and cfg.depth_pred:
        def depth_label(frames):
            lab = frames[:, f : f + s_eff + p - 1].astype(jnp.float32)
            return unfold_pred_windows(lab, p, s_eff)  # (B*s_eff, P, 1, H, W)

        lab_p = depth_label(batch["depth_primary"])
        lab_w = depth_label(batch["depth_wrist"])
        pred = outputs.depth_pred.astype(jnp.float32)
        bsz = batch["depth_primary"].shape[0]
        pred = pred.reshape((bsz, s) + pred.shape[1:])[:, :s_eff]
        pred = pred.reshape((-1,) + pred.shape[2:])

        if cfg.use_dpt_head:
            # DPT head emits dense maps already: (B*s_eff, 2, P, 1, H, W)
            d_p, d_w = pred[:, 0], pred[:, 1]
        else:
            def unpatch_view(v):  # (N, P, L, p^2) -> (N, P, 1, H, W)
                n = v.shape[0]
                img = unpatchify(v.reshape((-1,) + v.shape[2:]),
                                 cfg.patch_size, 1)
                return img.reshape((n, p) + img.shape[1:])

            d_p = unpatch_view(pred[:, 0])
            d_w = unpatch_view(pred[:, 1])
        depth_l = 0.5 * (silog_loss(d_p, lab_p) + silog_loss(d_w, lab_w))

    # ---- dino / sam cosine -------------------------------------------------
    def feat_cosine(pred_key, prim, wrist):
        if p != 1:
            # the reference itself asserts pred_num==1 here
            # (train_utils.py:420-422 `assert ...shape[1] == 1`); fail
            # loudly instead of silently dropping windows
            raise ValueError(
                "dino/sam cosine losses are defined for pred_num==1 only "
                "(reference train_utils.py:420-422 asserts this)")
        lab_p = unfold_pred_windows(
            batch[prim][:, f : f + s_eff + p - 1].astype(jnp.float32), p, s_eff)
        lab_w = unfold_pred_windows(
            batch[wrist][:, f : f + s_eff + p - 1].astype(jnp.float32), p, s_eff)
        pred = getattr(outputs, pred_key).astype(jnp.float32)
        bsz = batch[prim].shape[0]
        pred = pred.reshape((bsz, s) + pred.shape[1:])[:, :s_eff]
        pred = pred.reshape((-1,) + pred.shape[2:])
        # reference squeezes pred_num==1 (train_utils.py:420-422)
        return 0.5 * (cosine_dissimilarity(pred[:, 0, 0], lab_p[:, 0])
                      + cosine_dissimilarity(pred[:, 1, 0], lab_w[:, 0]))

    dino_l = (feat_cosine("dino_pred", "dino_primary", "dino_wrist")
              if (tcfg.loss_dino_feat and cfg.dino_feat_pred) else zero)
    sam_l = (feat_cosine("sam_pred", "sam_primary", "sam_wrist")
             if (tcfg.loss_sam_feat and cfg.sam_feat_pred) else zero)

    # ---- trajectory --------------------------------------------------------
    traj_l = zero
    if tcfg.loss_trajectory and cfg.trajectory_pred:
        grid = cfg.traj_grid
        tr_p = batch["tracks"][:, : s_eff + p - 1].astype(jnp.float32)
        tr_w = batch["tracks_gripper"][:, : s_eff + p - 1].astype(jnp.float32)
        if not cfg.no_unshuffle:
            out_grid = cfg.image_size // cfg.patch_size
            tr_p = pixel_unshuffle_tracks(tr_p, grid, out_grid)
            tr_w = pixel_unshuffle_tracks(tr_w, grid, out_grid)
        lab_p = unfold_pred_windows(tr_p, p, s_eff)
        lab_w = unfold_pred_windows(tr_w, p, s_eff)
        pred = outputs.traj_pred.astype(jnp.float32)
        bsz = batch["tracks"].shape[0]
        pred = pred.reshape((bsz, s) + pred.shape[1:])[:, :s_eff]
        pred = pred.reshape((-1,) + pred.shape[2:])
        if cfg.no_pred_gripper_traj:
            traj_l = 0.1 * jnp.mean((pred[:, 0] - lab_p) ** 2)
        else:
            traj_l = 0.1 * (jnp.mean((pred[:, 0] - lab_p) ** 2)
                            + jnp.mean((pred[:, 1] - lab_w) ** 2))

    total = (tcfg.loss_arm_action_ratio * arm_l
             + tcfg.loss_gripper_action_ratio * grip_l
             + tcfg.loss_image_ratio * img_l
             + tcfg.loss_depth_ratio * depth_l
             + tcfg.loss_traj_ratio * traj_l
             + tcfg.loss_dino_ratio * dino_l
             + tcfg.loss_sam_ratio * sam_l)
    return LossOutputs(total=total, arm_action=arm_l, gripper_action=grip_l,
                       image=img_l, depth=depth_l, trajectory=traj_l,
                       dino=dino_l, sam=sam_l)
