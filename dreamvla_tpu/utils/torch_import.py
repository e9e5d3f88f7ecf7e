"""PyTorch checkpoint -> Flax params importers.

Bit-compatible loading of the released DreamVLA / MAE / CLIP checkpoints
(SURVEY.md hard part: Conv1D-vs-Linear transposes, timm Block naming, DDP
`module.` prefixes, frozen-param-stripped state dicts).

Conventions handled:
  * torch nn.Linear weight is (out, in) -> Flax Dense kernel (in, out): T;
  * HF Conv1D weight is already (in, out): no transpose (gpt2 trunk);
  * conv patch-embed (out, C, ph, pw) -> Dense over patchified pixels with
    (ph, pw, C) row order: transpose(2, 3, 1, 0).reshape(P*P*C, out);
  * LayerNorm weight/bias -> scale/bias;
  * optional `module.` DDP prefix is stripped; missing keys are left at
    their current (fresh-init) values and reported, mirroring
    `load_state_dict(strict=False)` (train.py:250).

All functions take a plain {name: np.ndarray} state dict — call
`load_torch_state_dict` to read a .pth (requires CPU torch, import-only).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "model", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    if hasattr(obj, "state_dict"):  # torchscript archive (clip.load style)
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().float().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = "module.") -> Dict[str, np.ndarray]:
    return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}


# --------------------------------------------------------------- primitives
class _Importer:
    """Collects assignments into a nested dict and tracks consumed keys."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used: set = set()
        self.out: Dict = {}
        self.missing: List[str] = []

    def has(self, key: str) -> bool:
        return key in self.sd

    def take(self, key: str):
        if key not in self.sd:
            self.missing.append(key)
            return None
        self.used.add(key)
        return self.sd[key]

    def assign(self, path: Tuple[str, ...], value) -> None:
        if value is None:
            return
        node = self.out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def dense(self, torch_prefix: str, path: Tuple[str, ...], transpose=True):
        w = self.take(f"{torch_prefix}.weight")
        if w is not None:
            self.assign(path + ("kernel",), w.T if transpose else w)
        if self.has(f"{torch_prefix}.bias"):
            self.assign(path + ("bias",), self.take(f"{torch_prefix}.bias"))

    def layernorm(self, torch_prefix: str, path: Tuple[str, ...]):
        self.assign(path + ("scale",), self.take(f"{torch_prefix}.weight"))
        self.assign(path + ("bias",), self.take(f"{torch_prefix}.bias"))

    def raw(self, torch_key: str, path: Tuple[str, ...]):
        self.assign(path, self.take(torch_key))

    def unexpected(self) -> List[str]:
        return [k for k in self.sd if k not in self.used]


def _vit_block(im: _Importer, tp: str, path: Tuple[str, ...]):
    """timm Block: norm1 / attn.qkv / attn.proj / norm2 / mlp.fc1 / mlp.fc2."""
    im.layernorm(f"{tp}.norm1", path + ("norm1",))
    im.dense(f"{tp}.attn.qkv", path + ("attn", "qkv"))
    im.dense(f"{tp}.attn.proj", path + ("attn", "proj"))
    im.layernorm(f"{tp}.norm2", path + ("norm2",))
    im.dense(f"{tp}.mlp.fc1", path + ("mlp", "fc1"))
    im.dense(f"{tp}.mlp.fc2", path + ("mlp", "fc2"))


def _patch_embed(im: _Importer, tp: str, path: Tuple[str, ...]):
    w = im.take(f"{tp}.proj.weight")  # (out, C, ph, pw)
    if w is not None:
        out = w.shape[0]
        im.assign(path + ("kernel",), w.transpose(2, 3, 1, 0).reshape(-1, out))
    im.assign(path + ("bias",), im.take(f"{tp}.proj.bias"))


# ------------------------------------------------------------------ MAE ViT
def import_mae_vit(sd: Dict[str, np.ndarray], depth: int = 12,
                   decoder_depth: int = 8) -> Tuple[Dict, List[str], List[str]]:
    """`mae_pretrain_vit_base.pth['model']` -> MaskedAutoencoderViT params."""
    im = _Importer(sd)
    _patch_embed(im, "patch_embed", ("patch_embed",))
    im.raw("cls_token", ("cls_token",))
    for i in range(depth):
        _vit_block(im, f"blocks.{i}", (f"blocks_{i}",))
    im.layernorm("norm", ("norm",))
    im.dense("decoder_embed", ("decoder_embed",))
    im.raw("mask_token", ("mask_token",))
    for i in range(decoder_depth):
        _vit_block(im, f"decoder_blocks.{i}", (f"decoder_blocks_{i}",))
    im.layernorm("decoder_norm", ("decoder_norm",))
    im.dense("decoder_pred", ("decoder_pred",))
    # pos_embed / decoder_pos_embed are fixed sincos tables we bake at trace
    im.used.update(k for k in sd if "pos_embed" in k)
    return im.out, im.missing, im.unexpected()


# --------------------------------------------------------------- CLIP text
def import_clip_text(sd: Dict[str, np.ndarray], layers: int = 12
                     ) -> Tuple[Dict, List[str], List[str]]:
    """OpenAI CLIP (ViT-B/32) state dict -> CLIPTextEncoder params.
    Visual-tower keys are ignored (the reference only uses encode_text)."""
    im = _Importer(sd)
    im.raw("token_embedding.weight", ("token_embedding",))
    im.raw("positional_embedding", ("positional_embedding",))
    for i in range(layers):
        tp = f"transformer.resblocks.{i}"
        p = (f"resblocks_{i}",)
        im.layernorm(f"{tp}.ln_1", p + ("ln_1",))
        w = im.take(f"{tp}.attn.in_proj_weight")
        if w is not None:
            im.assign(p + ("attn_in_proj", "kernel"), w.T)
        im.assign(p + ("attn_in_proj", "bias"), im.take(f"{tp}.attn.in_proj_bias"))
        im.dense(f"{tp}.attn.out_proj", p + ("attn_out_proj",))
        im.layernorm(f"{tp}.ln_2", p + ("ln_2",))
        im.dense(f"{tp}.mlp.c_fc", p + ("mlp_c_fc",))
        im.dense(f"{tp}.mlp.c_proj", p + ("mlp_c_proj",))
    im.layernorm("ln_final", ("ln_final",))
    im.raw("text_projection", ("text_projection",))  # used as x @ P: no T
    im.used.update(k for k in sd if k.startswith("visual.") or k in (
        "logit_scale", "input_resolution", "context_length", "vocab_size"))
    return im.out, im.missing, im.unexpected()


# ------------------------------------------------------------- GPT-2 trunk
def import_gpt2_trunk(sd: Dict[str, np.ndarray], num_layers: int,
                      prefix: str = "") -> Tuple[Dict, List[str], List[str]]:
    """Reference custom-GPT2 (HF Conv1D weights: already (in, out))."""
    im = _Importer(sd)
    for i in range(num_layers):
        tp = f"{prefix}h.{i}"
        p = (f"h_{i}",)
        im.layernorm(f"{tp}.ln_1", p + ("ln_1",))
        im.dense(f"{tp}.attn.c_attn", p + ("attn", "c_attn"), transpose=False)
        im.dense(f"{tp}.attn.c_proj", p + ("attn", "c_proj"), transpose=False)
        im.layernorm(f"{tp}.ln_2", p + ("ln_2",))
        im.dense(f"{tp}.mlp.c_fc", p + ("mlp_c_fc",), transpose=False)
        im.dense(f"{tp}.mlp.c_proj", p + ("mlp_c_proj",), transpose=False)
        im.used.update(k for k in sd if k.startswith(f"{tp}.attn.bias")
                       or k.startswith(f"{tp}.attn.masked_bias"))
    im.layernorm(f"{prefix}ln_f", ("ln_f",))
    # the released gpt2-medium checkpoint also carries wte/wpe; the trunk is
    # inputs_embeds-only with its own learned temporal pos-emb (reference
    # gpt2.py uses vocab_size=1 and never indexes wte/wpe), so ignore them
    im.used.update(k for k in sd if k in (f"{prefix}wte.weight",
                                          f"{prefix}wpe.weight"))
    return im.out, im.missing, im.unexpected()


# -------------------------------------------------------- modality decoders
def _decoder(im: _Importer, path_name: str, torch_stem: str, torch_mask_key: str,
             torch_proj: str, torch_norm: str, torch_pred: str):
    p = (path_name,)
    im.dense(torch_proj, p + ("projector",))
    w = im.take(torch_mask_key)
    if w is not None:
        im.assign(p + ("mask_token",), w)
    for i in range(2):
        _vit_block(im, f"{torch_stem}.{i}", p + (f"blocks_{i}",))
    im.layernorm(torch_norm, p + ("norm",))
    im.dense(torch_pred, p + ("pred",))


# --------------------------------------------------------------------- DiT
def import_dit(sd: Dict[str, np.ndarray], depth: int, prefix: str = "net."
               ) -> Tuple[Dict, List[str], List[str]]:
    im = _Importer(sd)
    im.dense(f"{prefix}x_embedder.linear", ("x_embedder",))
    if im.has(f"{prefix}history_embedder.linear.weight"):
        # defined-but-never-called in the reference (action history unused,
        # models.py:109-117) — our flax tree only creates it if exercised
        im.dense(f"{prefix}history_embedder.linear", ("history_embedder",))
    im.dense(f"{prefix}t_embedder.mlp.0", ("t_embedder", "mlp_0"))
    im.dense(f"{prefix}t_embedder.mlp.2", ("t_embedder", "mlp_2"))
    im.dense(f"{prefix}z_embedder.linear", ("z_embedder",))
    im.raw(f"{prefix}z_embedder.uncondition", ("uncondition",))
    im.raw(f"{prefix}positional_embedding", ("positional_embedding",))
    for i in range(depth):
        # DiT blocks use affine-free LayerNorms (models.py:129-131): only
        # attention + MLP weights exist.
        tp, p = f"{prefix}blocks.{i}", (f"blocks_{i}",)
        im.dense(f"{tp}.attn.qkv", p + ("attn", "qkv"))
        im.dense(f"{tp}.attn.proj", p + ("attn", "proj"))
        im.dense(f"{tp}.mlp.fc1", p + ("mlp", "fc1"))
        im.dense(f"{tp}.mlp.fc2", p + ("mlp", "fc2"))
    im.dense(f"{prefix}final_layer.linear", ("final_linear",))
    return im.out, im.missing, im.unexpected()


# ----------------------------------------------------------- full DreamVLA
def import_dreamvla(sd: Dict[str, np.ndarray], cfg) -> Tuple[Dict, List[str], List[str]]:
    """Full reference DreamVLA state dict -> DreamVLA params tree.

    Frozen-stripped checkpoints (train_utils.py:750-757 removes
    vision_encoder/clip_model keys) simply leave those subtrees missing —
    load the MAE / CLIP checkpoints separately via import_mae_vit /
    import_clip_text and merge.
    """
    sd = strip_prefix(sd)
    im = _Importer(sd)

    def sub(fn, *args, torch_prefix: str, path: str, **kw):
        inner = {k[len(torch_prefix):]: v for k, v in sd.items()
                 if k.startswith(torch_prefix)}
        tree, missing, _ = fn(inner, *args, **kw)
        if tree:
            im.out[path] = tree
        im.used.update(torch_prefix + k for k in inner)
        im.missing.extend(torch_prefix + m for m in missing)

    # frozen encoders (present unless stripped)
    if any(k.startswith("vision_encoder.") for k in sd):
        sub(import_mae_vit, cfg.vision_depth,
            torch_prefix="vision_encoder.", path="vision_encoder")
    if any(k.startswith("clip_model.") for k in sd):
        sub(import_clip_text, torch_prefix="clip_model.", path="text_encoder")

    for name in ("text_projector", "arm_state_encoder", "gripper_state_encoder",
                 "state_projector", "image_primary_projector",
                 "image_wrist_projector", "cls_token_primary_projector",
                 "cls_token_wrist_projector"):
        im.dense(name, (name,))

    # perceiver resampler
    rp = ("perceiver_resampler",)
    im.raw("perceiver_resampler.latents", rp + ("latents",))
    for i in range(cfg.resampler_depth):
        tp = f"perceiver_resampler.layers.{i}"
        pa = rp + (f"layers_{i}_attn",)
        im.layernorm(f"{tp}.0.norm_media", pa + ("norm_media",))
        im.layernorm(f"{tp}.0.norm_latents", pa + ("norm_latents",))
        im.dense(f"{tp}.0.to_q", pa + ("to_q",))
        im.dense(f"{tp}.0.to_kv", pa + ("to_kv",))
        im.dense(f"{tp}.0.to_out", pa + ("to_out",))
        pf = rp + (f"layers_{i}_ff",)
        im.layernorm(f"{tp}.1.0", pf + ("norm",))
        im.dense(f"{tp}.1.1", pf + ("fc1",))
        im.dense(f"{tp}.1.3", pf + ("fc2",))
    im.layernorm("perceiver_resampler.norm", rp + ("norm",))

    # learnable tokens + trunk
    for name in ("action_pred_token", "obs_tokens", "depth_tokens",
                 "dino_feat_tokens", "sam_feat_tokens", "trajectory_tokens",
                 "transformer_backbone_position_embedding"):
        if im.has(name):
            im.raw(name, (name,))
    im.layernorm("embedding_layer_norm", ("embedding_layer_norm",))
    sub(import_gpt2_trunk, cfg.transformer_layers,
        torch_prefix="transformer_backbone.", path="transformer_backbone")

    # decoders (reference top-level `mask_token` belongs to the image decoder)
    if cfg.obs_pred:
        _decoder(im, "image_decoder", "image_decoder", "mask_token",
                 "image_decoder_obs_pred_projector", "image_decoder_norm",
                 "image_decoder_pred")
    if cfg.depth_pred:
        _decoder(im, "depth_decoder", "depth_decoder", "depth_mask_token",
                 "depth_decoder_obs_pred_projector", "depth_decoder_norm",
                 "depth_decoder_pred")
    if cfg.dino_feat_pred:
        _decoder(im, "dino_decoder", "dino_feat_decoder", "dino_mask_token",
                 "dino_decoder_obs_pred_projector", "dino_decoder_norm",
                 "dino_decoder_pred")
    if cfg.sam_feat_pred:
        _decoder(im, "sam_decoder", "sam_feat_decoder", "sam_mask_token",
                 "sam_decoder_obs_pred_projector", "sam_decoder_norm",
                 "sam_decoder_pred")
    if cfg.trajectory_pred:
        _decoder(im, "traj_decoder", "traj_decoder", "traj_mask_token",
                 "traj_decoder_obs_pred_projector", "traj_decoder_norm",
                 "traj_decoder_pred")
    im.used.update(k for k in sd if "decoder_position_embedding" in k)

    # action heads
    if cfg.use_dit_head:
        sub(import_dit, {"DiT-S": 6, "DiT-B": 12, "DiT-L": 24}[cfg.dit_type],
            torch_prefix="action_model.", path="action_model")
    else:
        im.dense("action_decoder.0", ("action_decoder_fc1",))
        im.dense("action_decoder.2", ("action_decoder_fc2",))
        im.dense("arm_action_decoder.0", ("arm_action_head",))
        im.dense("gripper_action_decoder.0", ("gripper_action_head",))
    # unused-by-forward reference params (recon_* heads, action encoders)
    im.used.update(k for k in sd if k.startswith(
        ("recon_", "action_pose_encoder", "action_gripper_position_encoder",
         "action_projector", "attention_mask")))
    return im.out, im.missing, im.unexpected()


def merge_params(base, override):
    """Recursively overlay `override` onto `base` (strict=False load)."""
    import copy

    out = copy.deepcopy(dict(base)) if isinstance(base, dict) else base
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out
