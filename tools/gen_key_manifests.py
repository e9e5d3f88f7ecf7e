"""Generate expected-key manifests for the released-checkpoint importers.

VERDICT r3 #7: the DinoSigLIP / DPT / CoTracker importers were only
unit-tested on fabricated dicts; the remaining exposure is checkpoint key
SPELLING. These manifests freeze the expected key set (name -> shape) of
each released checkpoint so tests/test_key_manifests.py can assert the
importers consume exactly those keys — no network needed.

Provenance per manifest (best offline ground truth available):
  * depth_anything_v2_vits_depth_head — generated from the installed HF
    `DepthAnythingForDepthEstimation` at the real DA-V2 vits head scale
    (features 64, out_channels [48,96,192,384], dreamvla_model.py:519-526),
    key names mapped to the DA-V2 `depth_head.*` layout with the SAME
    mapping the forward-parity oracle validates (tests/test_dpt_oracle.py).
  * cotracker3_offline — generated from the torch replica of the
    facebookresearch hub module (tests/test_cotracker3.py), at the released
    `scaled_offline.pth` sizes (CoTracker3Config defaults), including the
    checkpoint's real "virual_tracks" misspelling.
  * dinov2_vitl14_reg4 / siglip_so400m_224 — derived from the timm
    VisionTransformer layout conventions at the released sizes
    (vit_large_patch14_reg4_dinov2.lvd142m @518px: 1024d/24L/reg4/
    LayerScale/no_embed_class; vit_so400m_patch14_siglip_224: 1152d/27L/
    mlp4304/MAP attn_pool). timm itself is not installed here, so these
    two are convention-derived (the forward math + HF-layout variant are
    separately oracle-tested in tests/test_dinosiglip_oracle.py).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gen_key_manifests.py
Writes assets/key_manifests/*.json.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(ROOT, "assets", "key_manifests")


def _dump(name: str, source: str, keys: dict) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump({"source": source,
                   "keys": {k: list(v) for k, v in sorted(keys.items())}},
                  f, indent=1)
    print(f"{path}: {len(keys)} keys")


# ------------------------------------------------------------------ timm pair
def timm_vit_keys(depth: int, d: int, ff: int, patch: int = 14,
                  pos_tokens: int = 0, cls: bool = False, regs: int = 0,
                  layerscale: bool = False, attn_pool: bool = False) -> dict:
    """timm VisionTransformer param names at the given scale."""
    keys = {
        "patch_embed.proj.weight": (d, 3, patch, patch),
        "patch_embed.proj.bias": (d,),
        "pos_embed": (1, pos_tokens, d),
        "norm.weight": (d,), "norm.bias": (d,),
    }
    if cls:
        keys["cls_token"] = (1, 1, d)
    if regs:
        keys["reg_token"] = (1, regs, d)
    for i in range(depth):
        b = f"blocks.{i}"
        keys.update({
            f"{b}.norm1.weight": (d,), f"{b}.norm1.bias": (d,),
            f"{b}.attn.qkv.weight": (3 * d, d), f"{b}.attn.qkv.bias": (3 * d,),
            f"{b}.attn.proj.weight": (d, d), f"{b}.attn.proj.bias": (d,),
            f"{b}.norm2.weight": (d,), f"{b}.norm2.bias": (d,),
            f"{b}.mlp.fc1.weight": (ff, d), f"{b}.mlp.fc1.bias": (ff,),
            f"{b}.mlp.fc2.weight": (d, ff), f"{b}.mlp.fc2.bias": (d,),
        })
        if layerscale:
            keys[f"{b}.ls1.gamma"] = (d,)
            keys[f"{b}.ls2.gamma"] = (d,)
    if attn_pool:
        keys.update({
            "attn_pool.latent": (1, 1, d),
            "attn_pool.q.weight": (d, d), "attn_pool.q.bias": (d,),
            "attn_pool.kv.weight": (2 * d, d), "attn_pool.kv.bias": (2 * d,),
            "attn_pool.proj.weight": (d, d), "attn_pool.proj.bias": (d,),
            "attn_pool.norm.weight": (d,), "attn_pool.norm.bias": (d,),
            "attn_pool.mlp.fc1.weight": (ff, d),
            "attn_pool.mlp.fc1.bias": (ff,),
            "attn_pool.mlp.fc2.weight": (d, ff),
            "attn_pool.mlp.fc2.bias": (d,),
        })
    return keys


def gen_timm_pair() -> None:
    # dinov2-reg4 uses no_embed_class: pos_embed covers the 37x37 patch grid
    # only (518/14)^2 = 1369; import_timm_vit re-folds the layouts
    _dump("dinov2_vitl14_reg4",
          "timm vit_large_patch14_reg4_dinov2.lvd142m (convention-derived; "
          "see tools/gen_key_manifests.py provenance notes)",
          timm_vit_keys(24, 1024, 4096, pos_tokens=37 * 37, cls=True,
                        regs=4, layerscale=True))
    _dump("siglip_so400m_224",
          "timm vit_so400m_patch14_siglip_224 (convention-derived)",
          timm_vit_keys(27, 1152, 4304, pos_tokens=16 * 16, cls=False,
                        attn_pool=True))


# ------------------------------------------------------------------ DPT head
def gen_dpt() -> None:
    import torch
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_dpt_oracle import _hf_to_da2

    # real DA-V2 vits head scale (dreamvla_model.py:519-526); the dinov2
    # backbone is irrelevant to the depth_head.* subtree, keep it 1-layer
    cfg = DepthAnythingConfig(
        backbone_config=Dinov2Config(hidden_size=384, num_hidden_layers=1,
                                     num_attention_heads=6, patch_size=14),
        reassemble_hidden_size=384, neck_hidden_sizes=[48, 96, 192, 384],
        fusion_hidden_size=64, head_hidden_size=32, patch_size=14,
        depth_estimation_type="metric", max_depth=20.0)
    with torch.no_grad():
        hf = DepthAnythingForDepthEstimation(cfg)
    sd = _hf_to_da2(hf)
    _dump("depth_anything_v2_vits_depth_head",
          "HF DepthAnythingForDepthEstimation @ DA-V2 vits scale, mapped "
          "to the depth_head.* layout by tests/test_dpt_oracle._hf_to_da2",
          {k: tuple(v.shape) for k, v in sd.items()})


# ------------------------------------------------------------------ cotracker
def gen_cotracker() -> None:
    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_cotracker3 import TCoTracker3Offline

    from dreamvla_tpu.extract.cotracker3 import CoTracker3Config

    model = TCoTracker3Offline(CoTracker3Config())
    # the replica already carries the checkpoint's "virual_tracks"
    # misspelling (import_cotracker3 accepts both spellings)
    keys = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    _dump("cotracker3_offline",
          "facebookresearch/co-tracker cotracker3_offline "
          "(scaled_offline.pth) via the torch replica in "
          "tests/test_cotracker3.py at released sizes",
          keys)


# ----------------------------------------------------------------- MAE ViT-B
def gen_mae() -> None:
    """mae_pretrain_vit_base.pth['model'] layout (reference load site
    dreamvla_model.py:477-478), generated live from the HF port of the same
    checkpoint (facebook/vit-mae-base, ViTMAEForPreTraining) at the real
    base scale, mapped by the SAME mapping the forward-parity oracle
    validates (tests/test_hf_oracles._mae_hf_to_fb), plus the fixed sincos
    pos tables the fb file stores (import_mae_vit ignores them — baked at
    trace time). NOTE: facebook's fine-tuning variant of the file strips
    the decoder subtree (loaded strict=False by the reference); the
    manifest freezes the full encoder+decoder layout and the test also
    checks the encoder-only subset imports with exactly the decoder keys
    missing."""
    import torch
    from transformers import ViTMAEConfig, ViTMAEForPreTraining

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_hf_oracles import _mae_hf_to_fb

    cfg = ViTMAEConfig(
        image_size=224, patch_size=16, hidden_size=768,
        num_attention_heads=12, num_hidden_layers=12,
        intermediate_size=3072, decoder_hidden_size=512,
        decoder_num_attention_heads=16, decoder_num_hidden_layers=8,
        decoder_intermediate_size=2048)
    with torch.no_grad():
        hf = ViTMAEForPreTraining(cfg)
    keys = {k: tuple(v.shape) for k, v in _mae_hf_to_fb(hf, 12, 8).items()}
    keys["pos_embed"] = (1, 197, 768)
    keys["decoder_pos_embed"] = (1, 197, 512)
    _dump("mae_pretrain_vit_base",
          "facebook mae_pretrain_vit_base.pth['model'] via HF "
          "facebook/vit-mae-base (ViTMAEForPreTraining) at base scale, "
          "mapped by tests/test_hf_oracles._mae_hf_to_fb",
          keys)


# ------------------------------------------------------------- CLIP ViT-B/32
def _clip_visual_keys() -> dict:
    """openai ViT-B/32 visual tower (width 768, 12L, patch 32, 224px ->
    7x7+1 pos rows, proj to 512). import_clip_text deliberately ignores the
    whole tower (the reference only calls encode_text); freezing it in the
    manifest proves the ignore-set covers every released key."""
    d, layers, ff = 768, 12, 3072
    keys = {
        "visual.class_embedding": (d,),
        "visual.positional_embedding": (50, d),
        "visual.proj": (d, 512),
        "visual.conv1.weight": (d, 3, 32, 32),
        "visual.ln_pre.weight": (d,), "visual.ln_pre.bias": (d,),
        "visual.ln_post.weight": (d,), "visual.ln_post.bias": (d,),
    }
    for i in range(layers):
        tp = f"visual.transformer.resblocks.{i}"
        keys.update({
            f"{tp}.ln_1.weight": (d,), f"{tp}.ln_1.bias": (d,),
            f"{tp}.attn.in_proj_weight": (3 * d, d),
            f"{tp}.attn.in_proj_bias": (3 * d,),
            f"{tp}.attn.out_proj.weight": (d, d),
            f"{tp}.attn.out_proj.bias": (d,),
            f"{tp}.ln_2.weight": (d,), f"{tp}.ln_2.bias": (d,),
            f"{tp}.mlp.c_fc.weight": (ff, d), f"{tp}.mlp.c_fc.bias": (ff,),
            f"{tp}.mlp.c_proj.weight": (d, ff), f"{tp}.mlp.c_proj.bias": (d,),
        })
    return keys


def gen_clip() -> None:
    """openai CLIP ViT-B/32 state dict (reference clip.load site
    dreamvla_model.py:511-514): text tower generated live from the HF port
    (openai/clip-vit-base-patch32, CLIPTextModelWithProjection) at the real
    scale via the oracle-validated mapping
    (tests/test_hf_oracles._clip_hf_to_openai); visual tower + scalar
    buffers convention-derived (ignored by import_clip_text)."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_hf_oracles import _clip_hf_to_openai

    cfg = CLIPTextConfig(
        vocab_size=49408, max_position_embeddings=77, hidden_size=512,
        num_attention_heads=8, num_hidden_layers=12, intermediate_size=2048,
        projection_dim=512, hidden_act="quick_gelu")
    with torch.no_grad():
        hf = CLIPTextModelWithProjection(cfg)
    keys = {k: tuple(v.shape)
            for k, v in _clip_hf_to_openai(hf, 12).items()}
    keys.update(_clip_visual_keys())
    keys["logit_scale"] = ()
    # openai's build_model() deletes these three if present — released
    # archives may carry them; import_clip_text must tolerate them
    keys["input_resolution"] = ()
    keys["context_length"] = ()
    keys["vocab_size"] = ()
    _dump("clip_vit_b32",
          "openai CLIP ViT-B/32 state dict: text tower via HF "
          "openai/clip-vit-base-patch32 (CLIPTextModelWithProjection) "
          "mapped by tests/test_hf_oracles._clip_hf_to_openai; visual "
          "tower convention-derived (ignored by the importer)",
          keys)


# ------------------------------------------------------------- gpt2-medium
def gen_gpt2_medium() -> None:
    """HF gpt2-medium released weights (reference load site
    dreamvla_model.py:539-542). Generated live from the installed
    transformers GPT2Model at the real scale (1024d/24L/16h); the 2019-era
    released pytorch_model.bin additionally saved the per-layer causal-mask
    buffer `h.i.attn.bias` (persistent in the converter of that era), which
    the importer must ignore — added explicitly."""
    import torch
    from transformers import GPT2Config, GPT2Model

    cfg = GPT2Config(n_embd=1024, n_layer=24, n_head=16)
    with torch.no_grad():
        m = GPT2Model(cfg)
    keys = {k: tuple(v.shape) for k, v in m.state_dict().items()}
    for i in range(24):
        keys[f"h.{i}.attn.bias"] = (1, 1, 1024, 1024)
    _dump("gpt2_medium",
          "HF gpt2-medium (GPT2Model.state_dict() from the installed "
          "transformers at 1024d/24L/16h) + the released file's persistent "
          "h.i.attn.bias causal-mask buffers",
          keys)


if __name__ == "__main__":
    gen_timm_pair()
    gen_dpt()
    gen_cotracker()
    gen_mae()
    gen_clip()
    gen_gpt2_medium()
