"""DinoSigLIP towers vs REAL upstream architectures (HF transformers).

The released timm checkpoints can't be downloaded here, but the installed
`transformers` package ships the same architectures
(Dinov2WithRegistersModel, SiglipVisionModel — both validated ports of the
checkpoints the reference loads via timm, dreamvla_model.py:479-509). These
tests randomly initialise tiny HF models, convert their state dicts into the
timm layout `import_timm_vit` consumes, and require our towers to reproduce
the HF forward at the reference's tap point (second-to-last block,
un-normed) — covering patch-embed conv equivalence, position-embedding
placement (registers get none), LayerScale, activation choice (SigLIP is
tanh-gelu: a real parity bug this oracle caught), and the importer key map.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dreamvla_tpu.models.dinosiglip import (TimmViT, import_timm_vit,
                                            siglip_so400m)
from dreamvla_tpu.models.layers import gelu_tanh

D, DEPTH, HEADS, FF, IMG, PATCH = 64, 4, 2, 128, 28, 14
TAP = DEPTH - 2  # reference taps get_intermediate_layers(n=depth-2)


def _fuse_qkv(q_w, k_w, v_w, q_b, k_b, v_b):
    return (torch.cat([q_w, k_w, v_w], dim=0), torch.cat([q_b, k_b, v_b]))


def _dinov2_to_timm(hf):
    sd = hf.state_dict()
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "reg_token": sd["embeddings.register_tokens"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(DEPTH):
        hp, tp = f"encoder.layer.{i}", f"blocks.{i}"
        qkv_w, qkv_b = _fuse_qkv(
            sd[f"{hp}.attention.attention.query.weight"],
            sd[f"{hp}.attention.attention.key.weight"],
            sd[f"{hp}.attention.attention.value.weight"],
            sd[f"{hp}.attention.attention.query.bias"],
            sd[f"{hp}.attention.attention.key.bias"],
            sd[f"{hp}.attention.attention.value.bias"])
        out.update({
            f"{tp}.norm1.weight": sd[f"{hp}.norm1.weight"],
            f"{tp}.norm1.bias": sd[f"{hp}.norm1.bias"],
            f"{tp}.attn.qkv.weight": qkv_w,
            f"{tp}.attn.qkv.bias": qkv_b,
            f"{tp}.attn.proj.weight": sd[f"{hp}.attention.output.dense.weight"],
            f"{tp}.attn.proj.bias": sd[f"{hp}.attention.output.dense.bias"],
            f"{tp}.ls1.gamma": sd[f"{hp}.layer_scale1.lambda1"],
            f"{tp}.ls2.gamma": sd[f"{hp}.layer_scale2.lambda1"],
            f"{tp}.norm2.weight": sd[f"{hp}.norm2.weight"],
            f"{tp}.norm2.bias": sd[f"{hp}.norm2.bias"],
            f"{tp}.mlp.fc1.weight": sd[f"{hp}.mlp.fc1.weight"],
            f"{tp}.mlp.fc1.bias": sd[f"{hp}.mlp.fc1.bias"],
            f"{tp}.mlp.fc2.weight": sd[f"{hp}.mlp.fc2.weight"],
            f"{tp}.mlp.fc2.bias": sd[f"{hp}.mlp.fc2.bias"],
        })
    return {k: v.numpy() for k, v in out.items()}


def _siglip_to_timm(hf):
    sd = hf.state_dict()
    out = {
        "pos_embed": sd["vision_model.embeddings.position_embedding.weight"]
        .unsqueeze(0),
        "patch_embed.proj.weight":
            sd["vision_model.embeddings.patch_embedding.weight"],
        "patch_embed.proj.bias":
            sd["vision_model.embeddings.patch_embedding.bias"],
    }
    for i in range(DEPTH):
        hp, tp = f"vision_model.encoder.layers.{i}", f"blocks.{i}"
        qkv_w, qkv_b = _fuse_qkv(
            sd[f"{hp}.self_attn.q_proj.weight"],
            sd[f"{hp}.self_attn.k_proj.weight"],
            sd[f"{hp}.self_attn.v_proj.weight"],
            sd[f"{hp}.self_attn.q_proj.bias"],
            sd[f"{hp}.self_attn.k_proj.bias"],
            sd[f"{hp}.self_attn.v_proj.bias"])
        out.update({
            f"{tp}.norm1.weight": sd[f"{hp}.layer_norm1.weight"],
            f"{tp}.norm1.bias": sd[f"{hp}.layer_norm1.bias"],
            f"{tp}.attn.qkv.weight": qkv_w,
            f"{tp}.attn.qkv.bias": qkv_b,
            f"{tp}.attn.proj.weight": sd[f"{hp}.self_attn.out_proj.weight"],
            f"{tp}.attn.proj.bias": sd[f"{hp}.self_attn.out_proj.bias"],
            f"{tp}.norm2.weight": sd[f"{hp}.layer_norm2.weight"],
            f"{tp}.norm2.bias": sd[f"{hp}.layer_norm2.bias"],
            f"{tp}.mlp.fc1.weight": sd[f"{hp}.mlp.fc1.weight"],
            f"{tp}.mlp.fc1.bias": sd[f"{hp}.mlp.fc1.bias"],
            f"{tp}.mlp.fc2.weight": sd[f"{hp}.mlp.fc2.weight"],
            f"{tp}.mlp.fc2.bias": sd[f"{hp}.mlp.fc2.bias"],
        })
    return {k: v.numpy() for k, v in out.items()}


def test_dinov2_reg4_matches_hf_oracle():
    from transformers import (Dinov2WithRegistersConfig,
                              Dinov2WithRegistersModel)

    torch.manual_seed(0)
    cfg = Dinov2WithRegistersConfig(
        hidden_size=D, num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        mlp_ratio=FF // D, image_size=IMG, patch_size=PATCH,
        num_register_tokens=4, hidden_act="gelu", layer_norm_eps=1e-6,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        drop_path_rate=0.0)
    hf = Dinov2WithRegistersModel(cfg).eval()

    imgs = np.random.default_rng(0).normal(size=(2, 3, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        hs = hf(torch.from_numpy(imgs),
                output_hidden_states=True).hidden_states
    want = hs[TAP + 1].numpy()  # after blocks 0..TAP

    ours = TimmViT(img_size=IMG, patch_size=PATCH, embed_dim=D, depth=DEPTH,
                   num_heads=HEADS, mlp_hidden=FF, num_registers=4,
                   class_token=True, layerscale=True, use_pallas=False)
    params, missing, unexpected = import_timm_vit(
        _dinov2_to_timm(hf), depth=DEPTH, layerscale=True)
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        patches, prefix = ours.apply({"params": params}, jnp.asarray(imgs))
    got = np.concatenate([np.asarray(prefix), np.asarray(patches)], axis=1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_siglip_matches_hf_oracle():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(1)
    cfg = SiglipVisionConfig(
        hidden_size=D, num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        intermediate_size=FF, image_size=IMG, patch_size=PATCH,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
        attention_dropout=0.0)
    hf = SiglipVisionModel(cfg).eval()

    imgs = np.random.default_rng(1).normal(size=(2, 3, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        hs = hf(torch.from_numpy(imgs),
                output_hidden_states=True).hidden_states
    want = hs[TAP + 1].numpy()

    ours = siglip_so400m(img_size=IMG, patch_size=PATCH, embed_dim=D,
                         depth=DEPTH, num_heads=HEADS, mlp_hidden=FF,
                         use_pallas=False)
    assert ours.act is gelu_tanh  # the parity bug this oracle caught
    params, missing, unexpected = import_timm_vit(
        _siglip_to_timm(hf), depth=DEPTH)
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        patches, prefix = ours.apply({"params": params}, jnp.asarray(imgs))
    assert prefix.shape[1] == 0
    np.testing.assert_allclose(np.asarray(patches), want, atol=2e-5, rtol=0)