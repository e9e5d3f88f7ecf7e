"""Run the ACTUAL reference model (`/root/reference`) on CPU torch.

The reference's `models/dreamvla_model.py` imports three packages that are
not installed in this environment (timm, openai-CLIP, einops_exts). This
module provides param-level stand-ins — faithful to those packages'
parameter layouts and forward math — and a builder that instantiates the
unmodified reference DreamVLA with them. Used by:

  * tests/test_reference_statedict.py — round-trips the real state-dict
    layout through import_dreamvla / export_dreamvla;
  * tools/anchor_baseline.py — times the real reference policy step on
    CPU to anchor the bench baseline (VERDICT: stop hardcoding a bare
    A100 estimate).

Shimmed leaves (timm Block/Attention/Mlp/PatchEmbed) follow the public
timm layout: qkv/proj, fc1/fc2, norm1/norm2, conv proj. Everything the
reference defines itself (token/decoder/projector naming, trunk, DiT) is
executed from the reference source, unmodified.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

import torch
from torch import nn

REFERENCE_PATH = "/root/reference"


def _timm_shim():
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
        (frozen). encode_text produces correctly-shaped 512-d features."""

        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(64, 16)
            self.text_projection = nn.Parameter(torch.zeros(16, 512))

        def encode_text(self, tokens):
            x = self.token_embedding(tokens % 64).mean(1)
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


def install_reference_shims() -> None:
    for k, v in {**_timm_shim(), **_clip_shim(),
                 **_einops_exts_shim()}.items():
        # transformers probes importlib.util.find_spec on these names
        v.__spec__ = importlib.machinery.ModuleSpec(k, loader=None)
        sys.modules.setdefault(k, v)
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def build_reference_model(mae_ckpt_path: str, **overrides):
    """Instantiate the unmodified reference DreamVLA on CPU torch."""
    install_reference_shims()
    from models.dreamvla_model import DreamVLA as RefDreamVLA

    kw = dict(finetune_type="calvin", clip_device="cpu",
              vit_checkpoint_path=mae_ckpt_path,
              attn_implementation="eager")
    kw.update(overrides)
    return RefDreamVLA(**kw)
