"""Model / training configuration.

Replaces the reference's ~120-flag argparse tree
(`utils/arguments_utils.py:43-311`) with typed dataclasses plus named presets
mirroring the shipped launch scripts (`scripts/CALVIN_ABC_D/DreamVLA/*.sh`,
`scripts/LIBERO/DreamVLA/*.sh`). `dreamvla_tpu.utils.cli` exposes the same
flag names on the command line for drop-in familiarity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DreamVLAConfig:
    # trunk
    hidden_dim: int = 1024
    transformer_layers: int = 24
    transformer_heads: int = 16
    sequence_length: int = 10
    dropout: float = 0.1
    # vision encoder + resampler
    use_dinosiglip: bool = False
    image_size: int = 224
    patch_size: int = 16
    vision_embed_dim: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    # dinosiglip tower dims (released sizes; shrink for tests)
    dino_dim: int = 1024
    dino_depth: int = 24
    dino_heads: int = 16
    dino_pos_grid: int = 37
    siglip_dim: int = 1152
    siglip_depth: int = 27
    siglip_heads: int = 16
    siglip_mlp: int = 4304
    vision_patch_size: int = 14  # dinosiglip towers are patch-14
    num_resampler_query: int = 16
    resampler_depth: int = 3
    include_text_encoder: bool = True  # False: caller feeds CLIP features
    # CLIP text tower dims (ViT-B/32 defaults; shrink for tests)
    clip_vocab: int = 49408
    clip_width: int = 512
    clip_heads: int = 8
    clip_layers: int = 12
    clip_embed_dim: int = 512
    # dream-query heads
    num_obs_token_per_image: int = 9
    pred_num: int = 1
    obs_pred: bool = False
    depth_pred: bool = False
    dino_feat_pred: bool = False
    sam_feat_pred: bool = False
    trajectory_pred: bool = False
    use_dpt_head: bool = False  # DPT refinement head (external weights)
    no_pred_gripper_traj: bool = False
    no_unshuffle: bool = False
    share_query: bool = False
    # TPU-side: run the trunk in [A | dream-query | action] token order so
    # role-split attention slices contiguously (exact; default on)
    trunk_token_reorder: bool = True
    # TPU-side: whole-block fused Pallas kernel for test-mode trunk applies
    # (ops.gpt2_fused; bf16-resolution-equal to the unfused path, float32-
    # oracle-anchored). Escape hatch for debugging / strict bit-parity runs.
    fused_trunk_inference: bool = True
    # TPU-side: differentiable whole-block fused kernels for TRAINING trunk
    # applies (ops.gpt2_fused_train; in-kernel hash-mask dropout + fused
    # two-kernel backward under custom_vjp, gradients parity-tested against
    # the unfused path). Escape hatch mirrors fused_trunk_inference.
    fused_trunk_train: bool = True
    # TPU-side: differentiable whole-block fused kernels for the dream
    # decoders' ViT blocks (ops.vit_fused_train; the decoders TRAIN, so
    # these carry a fused backward — ~16 TFLOP of the bs-8 train step is
    # decoder fwd+bwd, co-dominant with the trunk). Same escape-hatch
    # convention as fused_trunk_train.
    fused_decoder_train: bool = True
    # TPU-side, opt-in: W8A8 int8 trunk matmuls inside the fused kernel
    # (2x MXU peak, half the weight traffic). Requires params pre-quantized
    # with ops.gpt2_fused.quantize_trunk_params; accuracy is a measured
    # trade (tools/fused_action_parity.py --int8), NOT bit-parity.
    int8_trunk_inference: bool = False
    # Same trade for the DiT action head's dense matmuls (plain-XLA qdot;
    # models/dit.quantize_dit_params). The big win is at small batch, where
    # the DDIM loop is DiT-weight-read bound.
    int8_dit_inference: bool = False
    # Same trade for the frozen MAE encoder's block matmuls
    # (ops.vit_fused.quantize_encoder_params + int8 fused kernel).
    int8_encoder_inference: bool = False
    track_label_patch_size: int = 8
    # attention-mask flags
    atten_goal: int = 0
    atten_goal_state: bool = False
    atten_only_obs: bool = False
    attn_robot_proprio_state: bool = False
    mask_l_obs_ratio: float = 0.0
    # action head
    action_pred_steps: int = 3
    use_dit_head: bool = False
    use_fm: bool = False
    dit_type: str = "DiT-B"
    # state encoding
    gripper_width: bool = False
    # phase: pretrain rebuilds the (stochastic) mask each step
    phase: str = "finetune"
    # compute
    compute_dtype: str = "bfloat16"
    remat: bool = False
    # lax.scan unroll factor for the layer-stacked fused SERVING kernels
    # (stack_trunk_params / stack_encoder_params applies). 1 = smallest
    # executable (one kernel instance per op family); larger values give
    # XLA a k-layer window to overlap weight DMA with compute at a
    # ~k-fold larger compile. Bit-equal for any value (scheduling only).
    scan_unroll: int = 1

    # ------------------------------------------------------------ derived
    @property
    def vision_width(self) -> int:
        if self.use_dinosiglip:
            return self.dino_dim + self.siglip_dim
        return self.vision_embed_dim

    @property
    def cls_width(self) -> int:
        return self.dino_dim if self.use_dinosiglip else self.vision_embed_dim

    @property
    def vision_tokens(self) -> int:
        if self.use_dinosiglip:
            return (self.image_size // self.vision_patch_size) ** 2
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_a(self) -> int:
        """text + state + 2 views x resampler queries + 2 cls tokens."""
        return 1 + 1 + 2 * self.num_resampler_query + 2

    @property
    def num_obs_token(self) -> int:
        return (self.num_obs_token_per_image * 2) if self.obs_pred else 0

    @property
    def num_depth_token(self) -> int:
        return (self.num_obs_token_per_image * 2) if self.depth_pred else 0

    @property
    def num_dino_token(self) -> int:
        return (self.num_obs_token_per_image * 2) if self.dino_feat_pred else 0

    @property
    def num_sam_token(self) -> int:
        return (self.num_obs_token_per_image * 2) if self.sam_feat_pred else 0

    @property
    def num_traj_token(self) -> int:
        if not self.trajectory_pred:
            return 0
        per = self.num_obs_token_per_image
        return per if self.no_pred_gripper_traj else per * 2

    @property
    def any_pred_head(self) -> bool:
        return (self.obs_pred or self.depth_pred or self.dino_feat_pred
                or self.sam_feat_pred or self.trajectory_pred)

    @property
    def total_query_tokens(self) -> int:
        """this_num_obs_token (dreamvla_model.py:280-285): with share_query
        only the shared obs tokens are appended; otherwise the sum of all
        enabled modality query groups."""
        if self.share_query:
            return self.num_obs_token
        if self.any_pred_head:
            return (self.num_obs_token + self.num_depth_token + self.num_traj_token
                    + self.num_dino_token + self.num_sam_token)
        return 0

    @property
    def num_b(self) -> int:
        return self.total_query_tokens + self.action_pred_steps

    @property
    def tokens_per_step(self) -> int:
        return self.num_a + self.num_b

    @property
    def trunk_seq_len(self) -> int:
        return self.tokens_per_step * self.sequence_length

    @property
    def num_image_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_mask_tokens(self) -> int:
        return self.num_image_patches * self.pred_num

    @property
    def traj_grid(self) -> int:
        """CoTracker label grid side (28 on 224^2 with track patch 8)."""
        return self.image_size // self.track_label_patch_size


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"  # constant|linear|cosine|cosine_restart
    warmup_epochs: int = 1
    num_epochs: int = 20
    weight_decay: float = 1e-4
    batch_size: int = 2
    gradient_accumulation_steps: int = 1
    grad_clip_norm: float = 0.1
    seed: int = 42
    # loss switches + weights (train_utils.py:585)
    loss_action: bool = True
    loss_image: bool = False
    loss_depth: bool = False
    loss_dino_feat: bool = False
    loss_sam_feat: bool = False
    loss_trajectory: bool = False
    loss_arm_action_ratio: float = 1.0
    loss_gripper_action_ratio: float = 0.01
    loss_image_ratio: float = 0.1
    loss_depth_ratio: float = 0.001
    loss_traj_ratio: float = 0.1
    loss_dino_ratio: float = 0.01
    loss_sam_ratio: float = 0.01
    flow_as_mask: bool = False
    # data
    window_size: int = 13
    future_steps: int = 3
    rgb_pad: int = 10
    gripper_pad: int = 4
    traj_cons: bool = True


# ---------------------------------------------------------------- presets
def calvin_pretrain() -> Tuple[DreamVLAConfig, TrainConfig]:
    """scripts/CALVIN_ABC_D/DreamVLA/pretrain.sh:9-50."""
    model = DreamVLAConfig(
        sequence_length=14, num_resampler_query=16, num_obs_token_per_image=9,
        obs_pred=True, atten_goal=4, atten_goal_state=True, atten_only_obs=True,
        attn_robot_proprio_state=True, action_pred_steps=3, phase="pretrain",
    )
    train = TrainConfig(
        learning_rate=1e-4, num_epochs=20, batch_size=2, window_size=17,
        future_steps=3, loss_action=True, loss_image=True,
    )
    return model, train


def calvin_finetune() -> Tuple[DreamVLAConfig, TrainConfig]:
    """scripts/CALVIN_ABC_D/DreamVLA/finetune.sh:8-61 (flagship config)."""
    model = DreamVLAConfig(
        sequence_length=10, num_resampler_query=16, num_obs_token_per_image=9,
        obs_pred=True, depth_pred=True, sam_feat_pred=True,
        use_dit_head=True, action_pred_steps=3, phase="finetune",
    )
    train = TrainConfig(
        learning_rate=1e-3, num_epochs=20, batch_size=2, window_size=13,
        future_steps=3, loss_action=True, loss_image=True, loss_depth=True,
        loss_sam_feat=True, flow_as_mask=True,
    )
    return model, train


def libero_pretrain() -> Tuple[DreamVLAConfig, TrainConfig]:
    """scripts/LIBERO/DreamVLA/pretrain.sh:11-58 (libero_90_converted)."""
    model = DreamVLAConfig(
        sequence_length=11, num_resampler_query=16, num_obs_token_per_image=9,
        obs_pred=True, atten_goal=4, atten_goal_state=True,
        atten_only_obs=True, attn_robot_proprio_state=True,
        mask_l_obs_ratio=0.5, gripper_width=True, action_pred_steps=3,
        phase="pretrain",
    )
    train = TrainConfig(
        learning_rate=1e-4, num_epochs=30, batch_size=10,
        gradient_accumulation_steps=8, warmup_epochs=1, window_size=11,
        future_steps=3, loss_action=True, loss_image=True,
    )
    return model, train


def libero_finetune() -> Tuple[DreamVLAConfig, TrainConfig]:
    """scripts/LIBERO/DreamVLA/finetune_spatial.sh:16-69 (goal/object/long
    differ only in --libero_path / run name; pass the suite on the CLI)."""
    model = DreamVLAConfig(
        sequence_length=7, num_resampler_query=16, num_obs_token_per_image=9,
        obs_pred=True, sam_feat_pred=True, gripper_width=True,
        use_dit_head=True, action_pred_steps=3, phase="finetune",
    )
    train = TrainConfig(
        learning_rate=2e-4, num_epochs=40, batch_size=16,
        gradient_accumulation_steps=4, warmup_epochs=5, window_size=10,
        future_steps=3, loss_action=True, loss_image=True,
        loss_sam_feat=True, flow_as_mask=True,
    )
    return model, train


def libero_scratch() -> Tuple[DreamVLAConfig, TrainConfig]:
    """scripts/LIBERO/DreamVLA/scratch_spatial.sh:17-64 — identical config to
    the finetune preset (diff-verified: the four scratch_* scripts differ only
    by --libero_path/run name; finetune adds --finetune_from_pretrained_ckpt,
    which is a CLI path, not a preset field)."""
    return libero_finetune()


def tiny_test() -> Tuple[DreamVLAConfig, TrainConfig]:
    """Small shapes for unit tests / CPU dry-runs."""
    model = DreamVLAConfig(
        hidden_dim=64, transformer_layers=2, transformer_heads=4,
        sequence_length=3, num_resampler_query=4, num_obs_token_per_image=4,
        image_size=32, patch_size=16, vision_embed_dim=64, vision_depth=2,
        vision_heads=4, include_text_encoder=False,
        clip_width=32, clip_heads=4, clip_layers=2,
        obs_pred=True, depth_pred=True,
        atten_only_obs=True, attn_robot_proprio_state=True,
        action_pred_steps=2, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=2, window_size=6, future_steps=1,
                        loss_action=True, loss_image=True, loss_depth=True,
                        rgb_pad=2, gripper_pad=1)
    return model, train


PRESETS = {
    "calvin_pretrain": calvin_pretrain,
    "calvin_finetune": calvin_finetune,
    "libero_pretrain": libero_pretrain,
    "libero_finetune": libero_finetune,
    "libero_scratch": libero_scratch,
    "tiny_test": tiny_test,
}
