"""Flax params -> reference-layout torch state dict (the reverse of
torch_import): lets checkpoints trained here be loaded by the reference
PyTorch codebase (strict=False), completing two-way interop.

Layout rules mirror torch_import: Dense kernels transpose to nn.Linear
weights, GPT-2 trunk stays (in, out) (HF Conv1D), decoder/mask-token/
resampler/DiT naming follows models/dreamvla_model.py. Frozen encoders are
omitted (the reference strips them from checkpoints too,
train_utils.py:750-757).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


class _Exporter:
    def __init__(self):
        self.sd: Dict[str, np.ndarray] = {}

    def linear(self, name: str, node: Dict[str, Any]):
        self.sd[f"{name}.weight"] = _np(node["kernel"]).T.copy()
        if "bias" in node:
            self.sd[f"{name}.bias"] = _np(node["bias"])

    def conv1d(self, name: str, node: Dict[str, Any]):
        self.sd[f"{name}.weight"] = _np(node["kernel"]).copy()
        self.sd[f"{name}.bias"] = _np(node["bias"])

    def ln(self, name: str, node: Dict[str, Any]):
        self.sd[f"{name}.weight"] = _np(node["scale"])
        self.sd[f"{name}.bias"] = _np(node["bias"])

    def raw(self, name: str, value):
        self.sd[name] = _np(value)

    def vit_block(self, stem: str, blk: Dict[str, Any]):
        self.ln(f"{stem}.norm1", blk["norm1"])
        self.linear(f"{stem}.attn.qkv", blk["attn"]["qkv"])
        self.linear(f"{stem}.attn.proj", blk["attn"]["proj"])
        self.ln(f"{stem}.norm2", blk["norm2"])
        self.linear(f"{stem}.mlp.fc1", blk["mlp"]["fc1"])
        self.linear(f"{stem}.mlp.fc2", blk["mlp"]["fc2"])


def export_dreamvla(params: Dict[str, Any], cfg,
                    module_prefix: bool = True) -> Dict[str, np.ndarray]:
    """DreamVLA params tree -> reference torch-layout {name: ndarray}."""
    ex = _Exporter()
    for name in ("text_projector", "arm_state_encoder", "gripper_state_encoder",
                 "state_projector", "image_primary_projector",
                 "image_wrist_projector", "cls_token_primary_projector",
                 "cls_token_wrist_projector"):
        ex.linear(name, params[name])

    res = params["perceiver_resampler"]
    ex.raw("perceiver_resampler.latents", res["latents"])
    for i in range(cfg.resampler_depth):
        at = res[f"layers_{i}_attn"]
        stem = f"perceiver_resampler.layers.{i}"
        ex.ln(f"{stem}.0.norm_media", at["norm_media"])
        ex.ln(f"{stem}.0.norm_latents", at["norm_latents"])
        for t in ("to_q", "to_kv", "to_out"):
            ex.linear(f"{stem}.0.{t}", at[t])
        ff = res[f"layers_{i}_ff"]
        ex.ln(f"{stem}.1.0", ff["norm"])
        ex.linear(f"{stem}.1.1", ff["fc1"])
        ex.linear(f"{stem}.1.3", ff["fc2"])
    ex.ln("perceiver_resampler.norm", res["norm"])

    for name in ("action_pred_token", "obs_tokens", "depth_tokens",
                 "dino_feat_tokens", "sam_feat_tokens", "trajectory_tokens",
                 "transformer_backbone_position_embedding"):
        if name in params:
            ex.raw(name, params[name])
    ex.ln("embedding_layer_norm", params["embedding_layer_norm"])

    trunk = params["transformer_backbone"]
    for i in range(cfg.transformer_layers):
        blk = trunk[f"h_{i}"]
        stem = f"transformer_backbone.h.{i}"
        ex.ln(f"{stem}.ln_1", blk["ln_1"])
        ex.conv1d(f"{stem}.attn.c_attn", blk["attn"]["c_attn"])
        ex.conv1d(f"{stem}.attn.c_proj", blk["attn"]["c_proj"])
        ex.ln(f"{stem}.ln_2", blk["ln_2"])
        ex.conv1d(f"{stem}.mlp.c_fc", blk["mlp_c_fc"])
        ex.conv1d(f"{stem}.mlp.c_proj", blk["mlp_c_proj"])
    ex.ln("transformer_backbone.ln_f", trunk["ln_f"])

    decoders = (
        ("image_decoder", "image_decoder", "mask_token",
         "image_decoder_obs_pred_projector", "image_decoder_norm",
         "image_decoder_pred"),
        ("depth_decoder", "depth_decoder", "depth_mask_token",
         "depth_decoder_obs_pred_projector", "depth_decoder_norm",
         "depth_decoder_pred"),
        ("dino_decoder", "dino_feat_decoder", "dino_mask_token",
         "dino_decoder_obs_pred_projector", "dino_decoder_norm",
         "dino_decoder_pred"),
        ("sam_decoder", "sam_feat_decoder", "sam_mask_token",
         "sam_decoder_obs_pred_projector", "sam_decoder_norm",
         "sam_decoder_pred"),
        ("traj_decoder", "traj_decoder", "traj_mask_token",
         "traj_decoder_obs_pred_projector", "traj_decoder_norm",
         "traj_decoder_pred"),
    )
    for flax_name, stem_t, mask_t, proj_t, norm_t, pred_t in decoders:
        if flax_name not in params:
            continue
        dec = params[flax_name]
        ex.linear(proj_t, dec["projector"])
        ex.raw(mask_t, dec["mask_token"])
        for i in range(2):
            ex.vit_block(f"{stem_t}.{i}", dec[f"blocks_{i}"])
        ex.ln(norm_t, dec["norm"])
        ex.linear(pred_t, dec["pred"])

    if "action_model" in params:
        dit = params["action_model"]
        ex.linear("action_model.net.x_embedder.linear", dit["x_embedder"])
        if "history_embedder" in dit:  # unused in the reference fwd too
            ex.linear("action_model.net.history_embedder.linear",
                      dit["history_embedder"])
        ex.linear("action_model.net.t_embedder.mlp.0",
                  dit["t_embedder"]["mlp_0"])
        ex.linear("action_model.net.t_embedder.mlp.2",
                  dit["t_embedder"]["mlp_2"])
        ex.linear("action_model.net.z_embedder.linear", dit["z_embedder"])
        ex.raw("action_model.net.z_embedder.uncondition", dit["uncondition"])
        ex.raw("action_model.net.positional_embedding",
               dit["positional_embedding"])
        i = 0
        while f"blocks_{i}" in dit:
            blk = dit[f"blocks_{i}"]
            stem = f"action_model.net.blocks.{i}"
            ex.linear(f"{stem}.attn.qkv", blk["attn"]["qkv"])
            ex.linear(f"{stem}.attn.proj", blk["attn"]["proj"])
            ex.linear(f"{stem}.mlp.fc1", blk["mlp"]["fc1"])
            ex.linear(f"{stem}.mlp.fc2", blk["mlp"]["fc2"])
            i += 1
        ex.linear("action_model.net.final_layer.linear", dit["final_linear"])
    else:
        ex.linear("action_decoder.0", params["action_decoder_fc1"])
        ex.linear("action_decoder.2", params["action_decoder_fc2"])
        ex.linear("arm_action_decoder.0", params["arm_action_head"])
        ex.linear("gripper_action_decoder.0", params["gripper_action_head"])

    sd = ex.sd
    if module_prefix:
        sd = {"module." + k: v for k, v in sd.items()}
    return sd


def save_reference_checkpoint(path: str, params, cfg, epoch: int = 0) -> None:
    """Write a reference-compatible {'epoch', 'model_state_dict'} .pth."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_dreamvla(params, cfg).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd}, path)
