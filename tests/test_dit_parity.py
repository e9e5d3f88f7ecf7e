"""DiT action-head import parity against an in-test torch oracle."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dreamvla_tpu.models.dit import DiT
from dreamvla_tpu.utils import torch_import as ti


class TorchDiT(nn.Module):
    """Structural mirror of the reference DiT (models/action_model/models.py)."""

    def __init__(self, in_ch=7, hidden=64, depth=2, heads=4, token=32, T=3):
        super().__init__()
        self.in_ch, self.hidden, self.heads, self.T = in_ch, hidden, heads, T
        self.x_embedder = nn.ModuleDict(dict(linear=nn.Linear(in_ch, hidden)))
        self.history_embedder = nn.ModuleDict(dict(linear=nn.Linear(in_ch, hidden)))
        self.t_embedder = nn.ModuleDict(dict(mlp=nn.Sequential(
            nn.Linear(256, hidden), nn.SiLU(), nn.Linear(hidden, hidden))))
        self.z_embedder = nn.ModuleDict(dict(linear=nn.Linear(token, hidden)))
        self.z_uncondition = nn.Parameter(torch.randn(1, token) * 0.02)
        self.positional_embedding = nn.Parameter(
            torch.randn(2 * T, hidden) * hidden**-0.5)
        self.blocks = nn.ModuleList()
        for _ in range(depth):
            self.blocks.append(nn.ModuleDict(dict(
                attn=nn.ModuleDict(dict(qkv=nn.Linear(hidden, 3 * hidden),
                                        proj=nn.Linear(hidden, hidden))),
                mlp=nn.ModuleDict(dict(fc1=nn.Linear(hidden, hidden * 4),
                                       fc2=nn.Linear(hidden * 4, hidden))),
            )))
        self.final_layer = nn.ModuleDict(dict(linear=nn.Linear(hidden, in_ch)))

    @staticmethod
    def timestep_embedding(t, dim=256, max_period=10000):
        half = dim // 2
        freqs = torch.exp(-math.log(max_period)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, z):
        x = self.x_embedder["linear"](x)
        t = self.t_embedder["mlp"](self.timestep_embedding(t))
        z = self.z_embedder["linear"](z)
        c = t.unsqueeze(1) + z
        h = torch.cat([c, x], dim=1) + self.positional_embedding
        for blk in self.blocks:
            hn = F.layer_norm(h, (self.hidden,), eps=1e-6)
            b, l, d = hn.shape
            qkv = blk["attn"]["qkv"](hn).reshape(b, l, 3, self.heads,
                                                 d // self.heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            o = F.scaled_dot_product_attention(q, k, v)
            h = h + blk["attn"]["proj"](o.transpose(1, 2).reshape(b, l, d))
            hn = F.layer_norm(h, (self.hidden,), eps=1e-6)
            h = h + blk["mlp"]["fc2"](F.gelu(blk["mlp"]["fc1"](hn),
                                             approximate="tanh"))
        h = self.final_layer["linear"](F.layer_norm(h, (self.hidden,), eps=1e-6))
        return h[:, c.shape[1]:, :]


def test_dit_import_parity():
    torch.manual_seed(0)
    ref = TorchDiT().eval()
    x = torch.randn(2, 3, 7)
    t = torch.tensor([5.0, 42.0])
    z = torch.randn(2, 3, 32)
    with torch.no_grad():
        want = ref(x, t, z).numpy()

    sd = {}
    for k, v in ref.state_dict().items():
        k = k.replace("z_uncondition", "z_embedder.uncondition")
        k = k.replace("t_embedder.mlp.0", "t_embedder.mlp.0")
        sd["net." + k] = v.numpy()
    params, missing, unexpected = ti.import_dit(sd, depth=2)
    assert not missing, missing
    assert not unexpected, unexpected

    dit = DiT(in_channels=7, hidden_size=64, depth=2, num_heads=4,
              token_size=32, action_horizon=3, use_pallas=False)
    got = dit.apply({"params": params}, jnp.asarray(x.numpy()),
                    jnp.asarray(t.numpy()), jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # CFG path: batched cond/uncond halves combine per the reference formula
    x2 = torch.cat([x, x])
    z2 = torch.cat([z, torch.zeros_like(z)])
    t2 = torch.cat([t, t])
    with torch.no_grad():
        cond = ref(x, t, z).numpy()
        uncond = ref(x, t, torch.zeros_like(z)).numpy()
    want_eps = uncond + 1.5 * (cond - uncond)
    got_cfg = dit.apply({"params": params}, jnp.asarray(x2.numpy()),
                        jnp.asarray(t2.numpy()), jnp.asarray(z2.numpy()), 1.5,
                        method=DiT.forward_with_cfg)
    np.testing.assert_allclose(np.asarray(got_cfg)[:2], want_eps, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cfg)[2:], want_eps, atol=2e-5)
