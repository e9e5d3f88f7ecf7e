"""CLIP text tower and MAE ViT vs the REAL upstream architectures (HF).

Round 2 verified these against hand-written torch mirrors; these tests
replace the mirror with validated transformers ports of the exact models
the reference loads (openai/clip-vit-base-patch32 text tower,
facebook/vit-mae-base), remapping their state dicts into the OpenAI-CLIP /
facebook-MAE layouts `import_clip_text` / `import_mae_vit` consume.
Reference load sites: dreamvla_model.py:547-(«clip.load»), :442-478 (MAE).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from dreamvla_tpu.models.clip_text import CLIPTextEncoder
from dreamvla_tpu.models.vit_mae import MaskedAutoencoderViT
from dreamvla_tpu.utils.torch_import import import_clip_text, import_mae_vit


# ------------------------------------------------------------------ CLIP
def _clip_hf_to_openai(hf, layers):
    sd = hf.state_dict()
    out = {
        "token_embedding.weight":
            sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        # HF Linear stores (out, in); OpenAI uses x @ P with P (in, out)
        "text_projection": sd["text_projection.weight"].T.contiguous(),
    }
    for i in range(layers):
        hp, op = f"text_model.encoder.layers.{i}", f"transformer.resblocks.{i}"
        out[f"{op}.attn.in_proj_weight"] = torch.cat(
            [sd[f"{hp}.self_attn.q_proj.weight"],
             sd[f"{hp}.self_attn.k_proj.weight"],
             sd[f"{hp}.self_attn.v_proj.weight"]], dim=0)
        out[f"{op}.attn.in_proj_bias"] = torch.cat(
            [sd[f"{hp}.self_attn.q_proj.bias"],
             sd[f"{hp}.self_attn.k_proj.bias"],
             sd[f"{hp}.self_attn.v_proj.bias"]])
        for src, dst in (("self_attn.out_proj", "attn.out_proj"),
                         ("layer_norm1", "ln_1"), ("layer_norm2", "ln_2"),
                         ("mlp.fc1", "mlp.c_fc"), ("mlp.fc2", "mlp.c_proj")):
            out[f"{op}.{dst}.weight"] = sd[f"{hp}.{src}.weight"]
            out[f"{op}.{dst}.bias"] = sd[f"{hp}.{src}.bias"]
    return {k: v.numpy() for k, v in out.items()}


def test_clip_text_matches_hf_oracle():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    vocab, ctx, width, heads, layers, proj = 100, 16, 32, 4, 2, 24
    torch.manual_seed(0)
    cfg = CLIPTextConfig(
        vocab_size=vocab, max_position_embeddings=ctx, hidden_size=width,
        num_attention_heads=heads, num_hidden_layers=layers,
        intermediate_size=4 * width, projection_dim=proj,
        hidden_act="quick_gelu", eos_token_id=vocab - 1,
        bos_token_id=vocab - 2, attention_dropout=0.0)
    hf = CLIPTextModelWithProjection(cfg).eval()

    rng = np.random.default_rng(0)
    # body ids < eos; one EOS per row (argmax pooling == eos pooling)
    tokens = rng.integers(1, vocab - 2, size=(3, ctx))
    eos_pos = rng.integers(4, ctx, size=(3,))
    for r, p in enumerate(eos_pos):
        tokens[r, p] = vocab - 1
        tokens[r, p + 1:] = 0
    with torch.no_grad():
        want = hf(torch.from_numpy(tokens)).text_embeds.numpy()

    enc = CLIPTextEncoder(vocab_size=vocab, context_length=ctx, width=width,
                          heads=heads, layers=layers, embed_dim=proj,
                          use_pallas=False)
    params, missing, unexpected = import_clip_text(
        _clip_hf_to_openai(hf, layers), layers=layers)
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        got = enc.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)


# ------------------------------------------------------------------- MAE
def _mae_hf_to_fb(hf, depth, dec_depth):
    sd = hf.state_dict()
    out = {
        "cls_token": sd["vit.embeddings.cls_token"],
        "patch_embed.proj.weight":
            sd["vit.embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["vit.embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["vit.layernorm.weight"],
        "norm.bias": sd["vit.layernorm.bias"],
        "decoder_embed.weight": sd["decoder.decoder_embed.weight"],
        "decoder_embed.bias": sd["decoder.decoder_embed.bias"],
        "mask_token": sd["decoder.mask_token"],
        "decoder_norm.weight": sd["decoder.decoder_norm.weight"],
        "decoder_norm.bias": sd["decoder.decoder_norm.bias"],
        "decoder_pred.weight": sd["decoder.decoder_pred.weight"],
        "decoder_pred.bias": sd["decoder.decoder_pred.bias"],
    }

    def block(hp, fp):
        out[f"{fp}.attn.qkv.weight"] = torch.cat(
            [sd[f"{hp}.attention.attention.query.weight"],
             sd[f"{hp}.attention.attention.key.weight"],
             sd[f"{hp}.attention.attention.value.weight"]], dim=0)
        out[f"{fp}.attn.qkv.bias"] = torch.cat(
            [sd[f"{hp}.attention.attention.query.bias"],
             sd[f"{hp}.attention.attention.key.bias"],
             sd[f"{hp}.attention.attention.value.bias"]])
        for src, dst in (("attention.output.dense", "attn.proj"),
                         ("layernorm_before", "norm1"),
                         ("layernorm_after", "norm2"),
                         ("intermediate.dense", "mlp.fc1"),
                         ("output.dense", "mlp.fc2")):
            out[f"{fp}.{dst}.weight"] = sd[f"{hp}.{src}.weight"]
            out[f"{fp}.{dst}.bias"] = sd[f"{hp}.{src}.bias"]

    for i in range(depth):
        block(f"vit.encoder.layer.{i}", f"blocks.{i}")
    for i in range(dec_depth):
        block(f"decoder.decoder_layers.{i}", f"decoder_blocks.{i}")
    return {k: v.numpy() for k, v in out.items()}


def test_mae_encoder_decoder_match_hf_oracle():
    from transformers import ViTMAEConfig, ViTMAEForPreTraining

    img, patch, width, heads, depth = 32, 8, 48, 4, 2
    dec_width, dec_heads, dec_depth = 24, 2, 2
    torch.manual_seed(0)
    cfg = ViTMAEConfig(
        image_size=img, patch_size=patch, hidden_size=width,
        num_attention_heads=heads, num_hidden_layers=depth,
        intermediate_size=4 * width, decoder_hidden_size=dec_width,
        decoder_num_attention_heads=dec_heads,
        decoder_num_hidden_layers=dec_depth,
        decoder_intermediate_size=4 * dec_width, mask_ratio=0.0,
        hidden_act="gelu", layer_norm_eps=1e-6, qkv_bias=True,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = ViTMAEForPreTraining(cfg).eval()
    # fresh HF init can leave the decoder pos table non-sincos; released
    # checkpoints store the sincos table (which we bake at trace time) --
    # pin both tables to the canonical helper output
    from transformers.models.vit_mae.modeling_vit_mae import (
        get_2d_sincos_pos_embed as hf_sincos)

    with torch.no_grad():
        hf.vit.embeddings.position_embeddings.copy_(torch.from_numpy(
            hf_sincos(width, img // patch, add_cls_token=True)[None]))
        hf.decoder.decoder_pos_embed.copy_(torch.from_numpy(
            hf_sincos(dec_width, img // patch, add_cls_token=True)[None]))

    rng = np.random.default_rng(0)
    n_patches = (img // patch) ** 2
    imgs = rng.normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        # fixed noise: keep-all shuffle the decoder fully unshuffles
        noise = torch.rand(2, n_patches)
        want = hf(torch.from_numpy(imgs), noise=noise).logits.numpy()

    mae = MaskedAutoencoderViT(
        img_size=img, patch_size=patch, embed_dim=width, depth=depth,
        num_heads=heads, decoder_embed_dim=dec_width,
        decoder_depth=dec_depth, decoder_num_heads=dec_heads,
        use_pallas=False)
    params, missing, unexpected = import_mae_vit(
        _mae_hf_to_fb(hf, depth, dec_depth), depth=depth,
        decoder_depth=dec_depth)
    assert not missing and not unexpected, (missing, unexpected)

    def fwd(mdl, imgs):
        lat, mask, ids = mdl.forward_encoder(imgs, mask_ratio=0.0)
        return mdl.forward_decoder(lat, ids)

    with jax.default_matmul_precision("highest"):
        got = mae.apply({"params": params}, jnp.asarray(imgs), method=fwd)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=0)

# --------------------------------------------------- DINOv2 extractor ViT
def test_dinov2_extractor_matches_hf_oracle():
    """extract/dinov2.py's tower (the offline DINO label pipeline,
    reference data_process/dino_extractor.py) vs the real Dinov2Model:
    x_norm_patchtokens + cls at the final layernorm."""
    from transformers import Dinov2Config, Dinov2Model

    from dreamvla_tpu.extract.dinov2 import DinoV2ViT, import_dinov2

    img, patch, width, heads, depth = 28, 14, 32, 2, 2
    torch.manual_seed(0)
    cfg = Dinov2Config(
        hidden_size=width, num_hidden_layers=depth, num_attention_heads=heads,
        mlp_ratio=4, image_size=img, patch_size=patch, hidden_act="gelu",
        layer_norm_eps=1e-6, layerscale_value=1.0,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        drop_path_rate=0.0)
    hf = Dinov2Model(cfg).eval()
    sd = hf.state_dict()
    fb = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "mask_token": sd["embeddings.mask_token"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(depth):
        hp, fp = f"encoder.layer.{i}", f"blocks.{i}"
        fb[f"{fp}.attn.qkv.weight"] = torch.cat(
            [sd[f"{hp}.attention.attention.query.weight"],
             sd[f"{hp}.attention.attention.key.weight"],
             sd[f"{hp}.attention.attention.value.weight"]], dim=0)
        fb[f"{fp}.attn.qkv.bias"] = torch.cat(
            [sd[f"{hp}.attention.attention.query.bias"],
             sd[f"{hp}.attention.attention.key.bias"],
             sd[f"{hp}.attention.attention.value.bias"]])
        for src, dst in (("attention.output.dense", "attn.proj"),
                         ("norm1", "norm1"), ("norm2", "norm2"),
                         ("mlp.fc1", "mlp.fc1"), ("mlp.fc2", "mlp.fc2")):
            fb[f"{fp}.{dst}.weight"] = sd[f"{hp}.{src}.weight"]
            fb[f"{fp}.{dst}.bias"] = sd[f"{hp}.{src}.bias"]
        fb[f"{fp}.ls1.gamma"] = sd[f"{hp}.layer_scale1.lambda1"]
        fb[f"{fp}.ls2.gamma"] = sd[f"{hp}.layer_scale2.lambda1"]
    fb = {k: v.numpy() for k, v in fb.items()}

    imgs = np.random.default_rng(2).normal(size=(2, 3, img, img)).astype(
        np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(imgs)).last_hidden_state.numpy()

    ours = DinoV2ViT(img_size=img, patch_size=patch, embed_dim=width,
                     depth=depth, num_heads=heads,
                     pretrain_grid=img // patch, use_pallas=False)
    params, missing, unexpected = import_dinov2(fb, depth=depth)
    assert not missing and not unexpected, (missing, unexpected)
    with jax.default_matmul_precision("highest"):
        patches, cls = ours.apply({"params": params}, jnp.asarray(imgs))
    got = np.concatenate([np.asarray(cls)[:, None], np.asarray(patches)],
                         axis=1)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)
