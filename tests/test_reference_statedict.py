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

REF = "/root/reference"


# ------------------------------------------------------------------ shims
def _timm_shim():
    """timm.models.vision_transformer param-level stand-ins (layouts match
    the real package: qkv/proj, fc1/fc2, norm1/norm2, proj conv)."""
    vt = types.ModuleType("timm.models.vision_transformer")

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            hidden_features = hidden_features or in_features
            out_features = out_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1) * self.scale).softmax(-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))

    class Block(nn.Module):
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     norm_layer=nn.LayerNorm, act_layer=nn.GELU, **kw):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads, qkv_bias=qkv_bias)
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, **kw):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size,) * 2
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim, patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    vt.Mlp, vt.Attention, vt.Block, vt.PatchEmbed = (Mlp, Attention, Block,
                                                     PatchEmbed)
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.vision_transformer = vt
    timm.models = models
    return {"timm": timm, "timm.models": models,
            "timm.models.vision_transformer": vt}


def _clip_shim():
    clip = types.ModuleType("clip")

    class _ClipModel(nn.Module):
        """Layout-only stand-in; the released checkpoints strip clip_model
        (frozen), so only its presence matters here."""

        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(64, 16)
            self.text_projection = nn.Parameter(torch.zeros(16, 512))

        def encode_text(self, tokens):
            x = self.token_embedding(tokens).mean(1)
            return x @ self.text_projection

    def load(name, device="cpu", **kw):
        return _ClipModel(), (lambda img: img)

    def tokenize(texts, context_length=77, truncate=False):
        return torch.zeros((len(texts), context_length), dtype=torch.long)

    clip.load, clip.tokenize = load, tokenize
    return {"clip": clip}


def _einops_exts_shim():
    from einops import rearrange

    mod = types.ModuleType("einops_exts")

    def rearrange_many(tensors, pattern, **kw):
        return [rearrange(t, pattern, **kw) for t in tensors]

    mod.rearrange_many = rearrange_many
    return {"einops_exts": mod}


@pytest.fixture(scope="module")
def reference_model(tmp_path_factory):
    import importlib.machinery

    for k, v in {**_timm_shim(), **_clip_shim(),
                 **_einops_exts_shim()}.items():
        # transformers probes importlib.util.find_spec on these names
        v.__spec__ = importlib.machinery.ModuleSpec(k, loader=None)
        sys.modules.setdefault(k, v)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    mae_ckpt = tmp_path_factory.mktemp("ckpt") / "mae.pth"
    torch.save({"model": {}}, mae_ckpt)  # ctor loads strict=False

    from models.dreamvla_model import DreamVLA as RefDreamVLA

    torch.manual_seed(0)
    model = RefDreamVLA(
        finetune_type="calvin", clip_device="cpu",
        vit_checkpoint_path=str(mae_ckpt),
        sequence_length=3, num_resampler_query=3,
        num_obs_token_per_image=4, obs_pred=True, depth_pred=True,
        dino_feat_pred=True, sam_feat_pred=True, trajectory_pred=True,
        atten_only_obs=True, action_pred_steps=2, transformer_layers=2,
        hidden_dim=64, transformer_heads=4, phase="finetune",
        use_dit_head=True, dit_type="DiT-S", track_label_patch_size=8,
        attn_implementation="eager")
    return model


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
