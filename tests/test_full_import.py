"""End-to-end import_dreamvla: a fabricated reference-layout state dict
(frozen-encoder-stripped, as the released checkpoints are) must map onto the
full model tree with no unexpected keys and a working forward."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.utils import torch_import as ti


def linear(sd, name, kernel):
    """Emit torch nn.Linear layout from a flax (in, out) kernel."""
    sd[f"{name}.weight"] = np.asarray(kernel).T.copy()
    sd[f"{name}.bias"] = np.zeros(kernel.shape[1], np.float32)


def linear_nobias(sd, name, kernel):
    sd[f"{name}.weight"] = np.asarray(kernel).T.copy()


def conv1d(sd, name, kernel):
    """HF Conv1D stores (in, out) — flax kernel layout directly."""
    sd[f"{name}.weight"] = np.asarray(kernel).copy()
    sd[f"{name}.bias"] = np.zeros(kernel.shape[1], np.float32)


def ln(sd, name, dim):
    sd[f"{name}.weight"] = np.ones(dim, np.float32)
    sd[f"{name}.bias"] = np.zeros(dim, np.float32)


def vit_block(sd, stem, fresh_blk):
    ln(sd, f"{stem}.norm1", fresh_blk["norm1"]["scale"].shape[0])
    linear(sd, f"{stem}.attn.qkv", fresh_blk["attn"]["qkv"]["kernel"])
    linear(sd, f"{stem}.attn.proj", fresh_blk["attn"]["proj"]["kernel"])
    ln(sd, f"{stem}.norm2", fresh_blk["norm2"]["scale"].shape[0])
    linear(sd, f"{stem}.mlp.fc1", fresh_blk["mlp"]["fc1"]["kernel"])
    linear(sd, f"{stem}.mlp.fc2", fresh_blk["mlp"]["fc2"]["kernel"])


def fabricate_reference_sd(cfg, fresh):
    """Build a module.-prefixed torch-layout state dict whose shapes mirror
    the fresh flax tree (values random/identity — mapping is what's tested)."""
    sd = {}
    for name in ("text_projector", "arm_state_encoder", "gripper_state_encoder",
                 "state_projector", "image_primary_projector",
                 "image_wrist_projector", "cls_token_primary_projector",
                 "cls_token_wrist_projector"):
        linear(sd, name, fresh[name]["kernel"])

    res = fresh["perceiver_resampler"]
    sd["perceiver_resampler.latents"] = np.asarray(res["latents"]).copy()
    for i in range(cfg.resampler_depth):
        at = res[f"layers_{i}_attn"]
        stem = f"perceiver_resampler.layers.{i}"
        ln(sd, f"{stem}.0.norm_media", at["norm_media"]["scale"].shape[0])
        ln(sd, f"{stem}.0.norm_latents", at["norm_latents"]["scale"].shape[0])
        for tname, fname in (("to_q", "to_q"), ("to_kv", "to_kv"),
                             ("to_out", "to_out")):
            linear_nobias(sd, f"{stem}.0.{tname}", at[fname]["kernel"])
        ff = res[f"layers_{i}_ff"]
        ln(sd, f"{stem}.1.0", ff["norm"]["scale"].shape[0])
        linear_nobias(sd, f"{stem}.1.1", ff["fc1"]["kernel"])
        linear_nobias(sd, f"{stem}.1.3", ff["fc2"]["kernel"])
    ln(sd, "perceiver_resampler.norm", res["norm"]["scale"].shape[0])

    for name in ("action_pred_token", "obs_tokens", "depth_tokens",
                 "transformer_backbone_position_embedding"):
        if name in fresh:
            sd[name] = np.asarray(fresh[name]).copy()
    ln(sd, "embedding_layer_norm",
       fresh["embedding_layer_norm"]["scale"].shape[0])

    trunk = fresh["transformer_backbone"]
    for i in range(cfg.transformer_layers):
        blk = trunk[f"h_{i}"]
        stem = f"transformer_backbone.h.{i}"
        ln(sd, f"{stem}.ln_1", blk["ln_1"]["scale"].shape[0])
        conv1d(sd, f"{stem}.attn.c_attn", blk["attn"]["c_attn"]["kernel"])
        conv1d(sd, f"{stem}.attn.c_proj", blk["attn"]["c_proj"]["kernel"])
        ln(sd, f"{stem}.ln_2", blk["ln_2"]["scale"].shape[0])
        conv1d(sd, f"{stem}.mlp.c_fc", blk["mlp_c_fc"]["kernel"])
        conv1d(sd, f"{stem}.mlp.c_proj", blk["mlp_c_proj"]["kernel"])
    ln(sd, "transformer_backbone.ln_f", trunk["ln_f"]["scale"].shape[0])

    for dec_name, stems in (
        ("image_decoder", ("image_decoder_obs_pred_projector", "mask_token",
                           "image_decoder", "image_decoder_norm",
                           "image_decoder_pred")),
        ("depth_decoder", ("depth_decoder_obs_pred_projector",
                           "depth_mask_token", "depth_decoder",
                           "depth_decoder_norm", "depth_decoder_pred")),
    ):
        dec = fresh[dec_name]
        proj_t, mask_t, blocks_t, norm_t, pred_t = stems
        linear(sd, proj_t, dec["projector"]["kernel"])
        sd[mask_t] = np.asarray(dec["mask_token"]).copy()
        for i in range(2):
            vit_block(sd, f"{blocks_t}.{i}", dec[f"blocks_{i}"])
        ln(sd, norm_t, dec["norm"]["scale"].shape[0])
        linear(sd, pred_t, dec["pred"]["kernel"])

    linear(sd, "action_decoder.0", fresh["action_decoder_fc1"]["kernel"])
    linear(sd, "action_decoder.2", fresh["action_decoder_fc2"]["kernel"])
    linear(sd, "arm_action_decoder.0", fresh["arm_action_head"]["kernel"])
    linear(sd, "gripper_action_decoder.0",
           fresh["gripper_action_head"]["kernel"])
    # reference-only leftovers the importer must consume without mapping
    sd["attention_mask"] = np.zeros((4, 4), np.float32)
    sd["recon_state_decoder.0.weight"] = np.zeros((2, 2), np.float32)
    return {"module." + k: v for k, v in sd.items()}


def test_full_reference_checkpoint_import():
    cfg, _ = tiny_test()
    model = DreamVLA(cfg)
    rng = np.random.default_rng(1)
    b, s = 1, cfg.sequence_length
    inputs = dict(
        image_primary=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        image_wrist=jnp.asarray(rng.normal(size=(b, s, 3, 32, 32)), jnp.float32),
        state=jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32),
        text_features=jnp.asarray(rng.normal(size=(b, 512)), jnp.float32),
    )
    fresh = model.init({"params": jax.random.PRNGKey(0)}, mode="train",
                       train=False, **inputs)["params"]
    sd = fabricate_reference_sd(cfg, fresh)

    tree, missing, unexpected = ti.import_dreamvla(sd, cfg)
    assert unexpected == [], unexpected[:10]
    assert missing == [], missing[:10]

    merged = ti.merge_params(fresh, tree)
    # every mapped leaf must match the fresh shape exactly
    jax.tree.map(lambda a, b: (_ for _ in ()).throw(
        AssertionError(f"{a.shape} vs {b.shape}"))
        if a.shape != b.shape else None, merged, fresh)
    # the imported trunk kernels round-trip numerically (Conv1D no-transpose)
    np.testing.assert_allclose(
        np.asarray(merged["transformer_backbone"]["h_0"]["attn"]["c_attn"]["kernel"]),
        np.asarray(fresh["transformer_backbone"]["h_0"]["attn"]["c_attn"]["kernel"]))
    # Linear weights transpose back to the fresh kernels
    np.testing.assert_allclose(
        np.asarray(merged["text_projector"]["kernel"]),
        np.asarray(fresh["text_projector"]["kernel"]))
    out = model.apply({"params": merged}, mode="train", train=False, **inputs)
    assert np.isfinite(np.asarray(out.arm_action)).all()
