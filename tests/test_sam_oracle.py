"""SAM ViTDet image encoder vs the REAL architecture (HF SamModel).

The reference extracts SAM features with the segment-anything `sam_vit_b`
encoder (data_process/sam_extractor.py); transformers ships a validated
port (SamVisionEncoder: windowed attention, decomposed rel-pos, LayerNorm2d
neck). This test random-initialises a tiny HF vision encoder, remaps its
state dict into the segment-anything layout `import_sam_encoder` consumes,
and requires our encoder to reproduce the HF forward — covering window
partition/unpartition padding, the (q,k) rel-pos gather, and the neck.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dreamvla_tpu.extract.sam_encoder import SAMImageEncoder, import_sam_encoder

IMG, PATCH, D, HEADS, DEPTH = 64, 16, 32, 2, 4
WIN = 3  # does not divide the 4x4 grid -> exercises window padding
GLOBAL = (1, 3)
OUT = 16


def _hf_to_sam(hf_enc):
    sd = hf_enc.state_dict()
    out = {
        "patch_embed.proj.weight": sd["patch_embed.projection.weight"],
        "patch_embed.proj.bias": sd["patch_embed.projection.bias"],
        "pos_embed": sd["pos_embed"],
        "neck.0.weight": sd["neck.conv1.weight"],
        "neck.1.weight": sd["neck.layer_norm1.weight"],
        "neck.1.bias": sd["neck.layer_norm1.bias"],
        "neck.2.weight": sd["neck.conv2.weight"],
        "neck.3.weight": sd["neck.layer_norm2.weight"],
        "neck.3.bias": sd["neck.layer_norm2.bias"],
    }
    for i in range(DEPTH):
        hp, sp = f"layers.{i}", f"blocks.{i}"
        for src, dst in (("layer_norm1", "norm1"), ("attn.qkv", "attn.qkv"),
                         ("attn.proj", "attn.proj"),
                         ("layer_norm2", "norm2"), ("mlp.lin1", "mlp.lin1"),
                         ("mlp.lin2", "mlp.lin2")):
            out[f"{sp}.{dst}.weight"] = sd[f"{hp}.{src}.weight"]
            out[f"{sp}.{dst}.bias"] = sd[f"{hp}.{src}.bias"]
        out[f"{sp}.attn.rel_pos_h"] = sd[f"{hp}.attn.rel_pos_h"]
        out[f"{sp}.attn.rel_pos_w"] = sd[f"{hp}.attn.rel_pos_w"]
    return {k: v.numpy() for k, v in out.items()}


def test_sam_encoder_matches_hf_oracle():
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    torch.manual_seed(0)
    cfg = SamVisionConfig(
        hidden_size=D, num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        image_size=IMG, patch_size=PATCH, window_size=WIN,
        global_attn_indexes=list(GLOBAL), output_channels=OUT,
        use_rel_pos=True, use_abs_pos=True, qkv_bias=True,
        mlp_ratio=4.0, layer_norm_eps=1e-6, attention_dropout=0.0,
        hidden_dropout_prob=0.0, hidden_act="gelu")
    hf = SamVisionEncoder(cfg).eval()
    # rel-pos tables init to zero in both frameworks; randomise so the
    # decomposed rel-pos path is actually exercised
    with torch.no_grad():
        for layer in hf.layers:
            layer.attn.rel_pos_h.normal_(std=0.2)
            layer.attn.rel_pos_w.normal_(std=0.2)
        hf.pos_embed.normal_(std=0.2)

    imgs = np.random.default_rng(0).normal(size=(2, 3, IMG, IMG)).astype(
        np.float32)
    with torch.no_grad():
        res = hf(torch.from_numpy(imgs))
        want = (res.last_hidden_state if hasattr(res, "last_hidden_state")
                else res[0]).numpy()

    ours = SAMImageEncoder(img_size=IMG, patch_size=PATCH, embed_dim=D,
                           depth=DEPTH, num_heads=HEADS, out_chans=OUT,
                           window_size=WIN, global_attn_indexes=GLOBAL)
    params, missing, unexpected = import_sam_encoder(_hf_to_sam(hf),
                                                     depth=DEPTH)
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        got = ours.apply({"params": params}, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=0)