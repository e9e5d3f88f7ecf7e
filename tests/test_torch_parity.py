"""Weight-import parity: torch oracles vs Flax modules with imported weights.

Oracles are built in-test from torch primitives (nn.Linear/LayerNorm/
MultiheadAttention, HF GPT2Block) using the same layouts as the reference's
dependencies (timm Block, OpenAI CLIP, HF Conv1D), so a green test means the
released checkpoints load bit-compatibly.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dreamvla_tpu.models.layers import ViTBlock
from dreamvla_tpu.models.gpt2 import GPT2Trunk
from dreamvla_tpu.models.clip_text import CLIPTextEncoder
from dreamvla_tpu.models.vit_mae import MaskedAutoencoderViT
from dreamvla_tpu.utils import torch_import as ti


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------- timm Block
class TorchTimmBlock(nn.Module):
    """Structural mirror of timm.models.vision_transformer.Block."""

    def __init__(self, dim, heads, mlp_ratio=4, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = nn.ModuleDict(dict(qkv=nn.Linear(dim, 3 * dim),
                                       proj=nn.Linear(dim, dim)))
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = nn.ModuleDict(dict(fc1=nn.Linear(dim, dim * mlp_ratio),
                                      fc2=nn.Linear(dim * mlp_ratio, dim)))
        self.heads = heads

    def forward(self, x):
        b, l, d = x.shape
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(b, l, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, l, d)
        x = x + self.attn["proj"](o)
        x = x + self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))
        return x


def test_vit_block_import_parity():
    torch.manual_seed(0)
    blk = TorchTimmBlock(32, 4).eval()
    x = torch.randn(2, 8, 32)
    want = blk(x).detach().numpy()

    im = ti._Importer({k.replace("attn.qkv", "attn.qkv").replace("mlp.fc", "mlp.fc"): v
                       for k, v in sd_numpy(blk).items()})
    ti._vit_block(im, "", ("block",))
    # keys had a leading "." from empty stem; rebuild with proper stem
    im = ti._Importer(sd_numpy(blk))
    im.layernorm("norm1", ("block", "norm1"))
    im.dense("attn.qkv", ("block", "attn", "qkv"))
    im.dense("attn.proj", ("block", "attn", "proj"))
    im.layernorm("norm2", ("block", "norm2"))
    im.dense("mlp.fc1", ("block", "mlp", "fc1"))
    im.dense("mlp.fc2", ("block", "mlp", "fc2"))

    fl = ViTBlock(num_heads=4, use_pallas=False)
    got = fl.apply({"params": im.out["block"]}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# -------------------------------------------------------------- GPT-2 trunk
def test_gpt2_trunk_import_parity():
    from transformers import GPT2Config
    from transformers.models.gpt2.modeling_gpt2 import GPT2Model

    config = GPT2Config(n_embd=64, n_layer=2, n_head=4, vocab_size=16,
                        attn_implementation="eager")
    torch.manual_seed(1)
    ref = GPT2Model(config).eval()
    x = torch.randn(2, 10, 64)
    # NOTE: stock HF blocks ALSO apply their internal causal tril (the
    # reference's trimmed GPT-2 removed it, relying on the custom mask
    # alone); keep the oracle bias causal so both paths agree.
    bias = torch.where(torch.rand(10, 10) < 0.3,
                       torch.tensor(-1e9), torch.tensor(0.0))
    bias = bias + torch.full((10, 10), -1e9).triu(1)
    bias = bias.clamp(min=-1e9)
    bias[:, 0] = 0.0
    with torch.no_grad():
        h = ref.drop(x)
        for blk in ref.h:
            h = blk(h, attention_mask=bias[None, None])[0]
        want = ref.ln_f(h).numpy()

    params, missing, unexpected = ti.import_gpt2_trunk(sd_numpy(ref), 2)
    assert not missing
    leftovers = [k for k in unexpected if not k.startswith(("wte", "wpe"))]
    assert not leftovers, leftovers
    trunk = GPT2Trunk(num_layers=2, num_heads=4, use_pallas=False)
    got = trunk.apply({"params": params}, jnp.asarray(x.numpy()),
                      bias=jnp.asarray(bias.numpy()), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


# --------------------------------------------------------------- CLIP text
class TorchCLIPText(nn.Module):
    """Structural mirror of OpenAI CLIP's text tower (ViT-B/32 scale-down)."""

    def __init__(self, vocab=100, ctx=16, width=32, heads=4, layers=2, embed=24):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
        self.blocks = nn.ModuleList()
        for _ in range(layers):
            blk = nn.ModuleDict(dict(
                ln_1=nn.LayerNorm(width),
                attn=nn.MultiheadAttention(width, heads),
                ln_2=nn.LayerNorm(width),
                mlp=nn.ModuleDict(dict(c_fc=nn.Linear(width, width * 4),
                                       c_proj=nn.Linear(width * 4, width))),
            ))
            self.blocks.append(blk)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.randn(width, embed) * width**-0.5)
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        self.register_buffer("causal", mask)

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)
        for blk in self.blocks:
            h = blk["ln_1"](x)
            a, _ = blk["attn"](h, h, h, need_weights=False, attn_mask=self.causal)
            x = x + a
            h = blk["ln_2"](x)
            h = blk["mlp"]["c_fc"](h)
            h = blk["mlp"]["c_proj"](h * torch.sigmoid(1.702 * h))
            x = x + h
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


def test_clip_text_import_parity():
    torch.manual_seed(2)
    ref = TorchCLIPText().eval()
    tokens = torch.randint(1, 100, (3, 16))
    tokens[:, -1] = 99  # EOT = max id
    with torch.no_grad():
        want = ref(tokens).numpy()

    # rename structural-mirror keys to OpenAI CLIP checkpoint layout
    sd = {}
    for k, v in sd_numpy(ref).items():
        k = k.replace("blocks.", "transformer.resblocks.")
        k = k.replace(".attn.in_proj_weight", ".attn.in_proj_weight")
        sd[k.replace("causal", "attn_mask")] = v
    sd.pop("attn_mask", None)
    params, missing, unexpected = ti.import_clip_text(sd, layers=2)
    assert not missing
    enc = CLIPTextEncoder(vocab_size=100, context_length=16, width=32, heads=4,
                          layers=2, embed_dim=24, use_pallas=False)
    got = enc.apply({"params": params}, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# ----------------------------------------------------------------- MAE ViT
class TorchMiniMAE(nn.Module):
    """Structural mirror of the MAE encoder (conv patch embed + blocks)."""

    def __init__(self, img=32, patch=16, dim=32, depth=2, heads=4):
        super().__init__()
        self.patch_embed = nn.ModuleDict(
            dict(proj=nn.Conv2d(3, dim, patch, stride=patch)))
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchTimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        from dreamvla_tpu.ops.posemb import get_2d_sincos_pos_embed
        pos = get_2d_sincos_pos_embed(dim, img // patch, cls_token=True)
        self.register_buffer("pos_embed", torch.from_numpy(pos).float()[None])

    def forward(self, imgs):
        x = self.patch_embed["proj"](imgs).flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:, :]
        cls = (self.cls_token + self.pos_embed[:, :1, :]).expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def test_mae_encoder_import_parity():
    torch.manual_seed(3)
    ref = TorchMiniMAE().eval()
    imgs = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = ref(imgs).numpy()
    sd = {k: v for k, v in sd_numpy(ref).items() if k != "pos_embed"}
    params, missing, unexpected = ti.import_mae_vit(sd, depth=2, decoder_depth=0)
    mae = MaskedAutoencoderViT(img_size=32, patch_size=16, embed_dim=32,
                               depth=2, num_heads=4, decoder_depth=0,
                               use_pallas=False)
    # decoder subtree untouched by this checkpoint: fill from fresh init
    fresh = mae.init(jax.random.PRNGKey(0), imgs.numpy(), 0.0)["params"]
    merged = ti.merge_params(fresh, params)
    got, _, _ = mae.apply({"params": merged}, jnp.asarray(imgs.numpy()), 0.0,
                          method=MaskedAutoencoderViT.forward_encoder)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
