"""Real-layout importer insurance: round-trip the ACTUAL reference model.

Instead of fabricating the reference checkpoint layout by hand (circular),
this builds a state dict from `/root/reference/models/dreamvla_model.py`
itself, executed on CPU torch with param-level shims for the external
packages that aren't installed here (timm Block/PatchEmbed/Attention/Mlp,
openai-CLIP `load`, einops_exts) — the shims reproduce those packages'
parameter layouts; everything defined by the reference's own source
(token/decoder/projector/trunk naming and composition) comes from the
reference, unmodified.

Checks: import_dreamvla consumes EVERY key of the frozen-stripped real
state dict (reference train_utils.py:750-757 strips vision_encoder/
clip_model), misses none, and export_dreamvla reproduces it bitwise."""

import dataclasses
import sys
import types

import numpy as np
import pytest
import torch
from torch import nn

from dreamvla_tpu.utils.ref_shims import REFERENCE_PATH, build_reference_model

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(REFERENCE_PATH),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def reference_model(tmp_path_factory):
    mae_ckpt = tmp_path_factory.mktemp("ckpt") / "mae.pth"
    torch.save({"model": {}}, mae_ckpt)  # ctor loads strict=False
    torch.manual_seed(0)
    return build_reference_model(
        str(mae_ckpt), sequence_length=3, num_resampler_query=3,
        num_obs_token_per_image=4, obs_pred=True, depth_pred=True,
        dino_feat_pred=True, sam_feat_pred=True, trajectory_pred=True,
        atten_only_obs=True, action_pred_steps=2, transformer_layers=2,
        hidden_dim=64, transformer_heads=4, phase="finetune",
        use_dit_head=True, dit_type="DiT-S", track_label_patch_size=8)


def _stripped_numpy_sd(model):
    """get_checkpoint semantics (train_utils.py:750-757): trainable params
    only, frozen encoders (vision/clip) excluded like the released ckpts."""
    return {k: v.detach().numpy().astype(np.float32)
            for k, v in model.named_parameters()
            if v.requires_grad
            and not k.startswith(("vision_encoder.", "clip_model."))}


def _my_cfg():
    from dreamvla_tpu.config import DreamVLAConfig

    return DreamVLAConfig(
        sequence_length=3, num_resampler_query=3, num_obs_token_per_image=4,
        obs_pred=True, depth_pred=True, dino_feat_pred=True,
        sam_feat_pred=True, trajectory_pred=True, atten_only_obs=True,
        action_pred_steps=2, transformer_layers=2, hidden_dim=64,
        transformer_heads=4, phase="finetune", use_dit_head=True,
        dit_type="DiT-S", track_label_patch_size=8)


def test_import_consumes_real_statedict(reference_model):
    from dreamvla_tpu.utils.torch_import import import_dreamvla

    sd = _stripped_numpy_sd(reference_model)
    assert len(sd) > 100  # a real model, not a stub
    tree, missing, unexpected = import_dreamvla(sd, _my_cfg())
    assert unexpected == [], f"unconsumed real keys: {unexpected[:10]}"
    assert missing == [], f"expected-but-absent keys: {missing[:10]}"


def test_roundtrip_real_statedict_bitwise(reference_model):
    from dreamvla_tpu.utils.torch_export import export_dreamvla
    from dreamvla_tpu.utils.torch_import import import_dreamvla

    from dreamvla_tpu.utils.torch_import import strip_prefix

    sd = _stripped_numpy_sd(reference_model)
    tree, _, _ = import_dreamvla(sd, _my_cfg())
    # export emits DDP-style "module."-prefixed keys like real reference
    # checkpoints (saved from DDP-wrapped models, train.py:279-292)
    out = strip_prefix(export_dreamvla(tree, _my_cfg()))
    # export skips params the reference keeps but never uses in forward
    # (recon_* heads, action encoders, the attention-mask buffer)
    unused = ("recon_", "action_pose_encoder",
              "action_gripper_position_encoder", "action_projector",
              "attention_mask")
    want = {k: v for k, v in sd.items() if not k.startswith(unused)}
    assert set(out) == set(want), (
        f"missing: {sorted(set(want) - set(out))[:8]} "
        f"extra: {sorted(set(out) - set(want))[:8]}")
    for k in want:
        np.testing.assert_array_equal(out[k], want[k], err_msg=k)
