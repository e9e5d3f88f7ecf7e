"""DiT diffusion / flow-matching action head.

Capability parity with reference `models/action_model/models.py` (DiT,
TimestepEmbedder, LabelEmbedder with CFG uncondition vector, ActionEmbedder,
HistoryEmbedder) and `action_model.py` (ActionModel / ActionModelFM:
DDPM training loss over a 100-step squaredcos_cap_v2 schedule, DDIM-10
sampling with CFG 1.5, flow-matching variant with a 10-step Euler
integrator).

Sequence layout per reference usage: the condition z carries one token per
predicted action step (the trunk's action-query outputs), so the DiT runs on
2*T tokens = [t_emb + z_emb tokens ; noised action tokens] and returns the
last T.

TPU design: sampling loops are lax.scan's from `dreamvla_tpu.diffusion`; the
train loss takes explicit rngs; timesteps are float (the FM variant feeds
fractional t).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dreamvla_tpu.diffusion import (
    ddim_sample_loop,
    ddim_timestep_map,
    flow_matching_sample_loop,
    make_schedule,
    p_sample_loop,
    q_sample,
    respace_schedule,
)
from dreamvla_tpu.models.layers import MlpBlock, MultiHeadSelfAttention, gelu_tanh

DIT_SIZES = {
    "DiT-S": dict(depth=6, hidden_size=384, num_heads=4),
    "DiT-B": dict(depth=12, hidden_size=768, num_heads=12),
    "DiT-L": dict(depth=24, hidden_size=1024, num_heads=16),
}


def timestep_frequency_embedding(t: jnp.ndarray, dim: int, max_period=10000.0):
    """(N,) float timesteps -> (N, dim) [cos | sin] features."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = timestep_frequency_embedding(t, self.freq_size).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_0")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_2")(x)


class DiTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadSelfAttention(self.num_heads, dtype=self.dtype,
                                       use_pallas=self.use_pallas, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="norm2")(x)
        x = x + MlpBlock(int(d * self.mlp_ratio), act=gelu_tanh,
                         dtype=self.dtype, name="mlp")(h)
        return x


class DiT(nn.Module):
    """Conditional DiT over action chunks. x: (N,T,C); t: (N,); z: (N,T,Z)."""

    in_channels: int = 7
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    token_size: int = 1024  # trunk hidden dim (condition feature size)
    action_horizon: int = 3  # action_pred_steps (= future_window + 1)
    class_dropout_prob: float = 0.1
    learn_sigma: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def setup(self):
        self.x_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.history_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.t_embedder = TimestepEmbedder(self.hidden_size, dtype=self.dtype)
        self.z_embedder = nn.Dense(self.hidden_size, dtype=self.dtype)
        if self.class_dropout_prob > 0:
            self.uncondition = self.param(
                "uncondition", nn.initializers.normal(0.02), (1, self.token_size)
            )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(self.hidden_size**-0.5),
            (2 * self.action_horizon, self.hidden_size),
        )
        self.blocks = [
            DiTBlock(self.num_heads, self.mlp_ratio, dtype=self.dtype,
                     use_pallas=self.use_pallas, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.final_norm = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                       use_scale=False, dtype=self.dtype)
        self.final_linear = nn.Dense(self.out_channels, dtype=self.dtype,
                                     kernel_init=nn.initializers.zeros)

    def _token_drop(self, z, rng):
        drop = jax.random.uniform(rng, (z.shape[0],)) < self.class_dropout_prob
        uncond = jnp.broadcast_to(self.uncondition.astype(z.dtype), z.shape)
        return jnp.where(drop[:, None, None], uncond, z)

    def __call__(self, x, t, z, train: bool = False, drop_rng=None):
        if train and self.class_dropout_prob > 0:
            z = self._token_drop(z, drop_rng)
        x = self.x_embedder(x.astype(self.dtype))
        t_emb = self.t_embedder(t)
        z_emb = self.z_embedder(z.astype(self.dtype))
        c = t_emb[:, None, :] + z_emb  # (N, T, D)
        h = jnp.concatenate([c, x], axis=1) + self.positional_embedding.astype(x.dtype)
        for blk in self.blocks:
            h = blk(h)
        h = self.final_linear(self.final_norm(h))
        return h[:, c.shape[1]:, :]

    def forward_with_cfg(self, x, t, z, cfg_scale: float):
        """Batched CFG: x/z are [cond ; uncond] stacked on batch."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, t, z)
        eps, rest = out[..., : self.in_channels], out[..., self.in_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


@dataclasses.dataclass(frozen=True)
class ActionDiffusionConfig:
    dit_type: str = "DiT-B"
    in_channels: int = 7
    action_horizon: int = 3
    token_size: int = 1024
    diffusion_steps: int = 100
    noise_schedule: str = "squaredcos_cap_v2"
    ddim_steps: int = 10
    cfg_scale: float = 1.5
    flow_matching: bool = False
    flow_steps: int = 10  # ActionModelFM uses diffusion_steps=10
    repeated_diffusion_steps: int = 8


def build_dit(cfg: ActionDiffusionConfig, dtype=jnp.float32, use_pallas=None) -> DiT:
    size = DIT_SIZES[cfg.dit_type]
    return DiT(
        in_channels=cfg.in_channels,
        token_size=cfg.token_size,
        action_horizon=cfg.action_horizon,
        dtype=dtype,
        use_pallas=use_pallas,
        **size,
    )


def quantize_dit_params(action_params):
    """Host-side, one-time: per-output-channel int8 quantization of the DiT
    param subtree's large dense kernels (block qkv/proj/fc1/fc2 and the
    z_embedder). The small embedders, the zero-init final linear and the
    non-matmul leaves stay as-is. Consumed by the quantized sampling path
    in ActionDiffusionHead.sample (ops.quant.qdot); the win at small batch
    is halved weight HBM traffic across the DDIM steps."""
    from dreamvla_tpu.ops.quant import quantize_dense

    p = {k: v for k, v in action_params.items()}
    p["z_embedder"] = {"kernel": quantize_dense(p["z_embedder"]["kernel"]),
                       "bias": p["z_embedder"]["bias"]}
    for name in list(p):
        if not name.startswith("blocks_"):
            continue
        b = p[name]
        p[name] = {
            "attn": {
                "qkv": {"kernel": quantize_dense(b["attn"]["qkv"]["kernel"]),
                        "bias": b["attn"]["qkv"]["bias"]},
                "proj": {"kernel": quantize_dense(b["attn"]["proj"]["kernel"]),
                         "bias": b["attn"]["proj"]["bias"]},
            },
            "mlp": {
                "fc1": {"kernel": quantize_dense(b["mlp"]["fc1"]["kernel"]),
                        "bias": b["mlp"]["fc1"]["bias"]},
                "fc2": {"kernel": quantize_dense(b["mlp"]["fc2"]["kernel"]),
                        "bias": b["mlp"]["fc2"]["bias"]},
            },
        }
    return p


def _qdense(p, x):
    """Dense apply that accepts either a plain kernel or quantize_dense's
    (int8, scale) pair; x is f32."""
    from dreamvla_tpu.ops.quant import is_quantized, qdot

    k = p["kernel"]
    y = qdot(x, k[0], k[1]) if is_quantized(k) else x @ k.astype(x.dtype)
    return y + p["bias"] if "bias" in p else y


def _ln_np(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def dit_forward_quant(dit: DiT, p, x, t, z):
    """Pure-function mirror of DiT.__call__ (inference, f32) that runs
    quantize_dit_params trees: block dense matmuls via ops.quant.qdot, the
    rest in f32. Kept in lockstep with __call__; parity is pinned by
    tests/test_dit_int8.py."""
    x = _qdense(p["x_embedder"], x.astype(jnp.float32))
    te = timestep_frequency_embedding(t, 256)
    te = _qdense(p["t_embedder"]["mlp_0"], te)
    te = _qdense(p["t_embedder"]["mlp_2"], nn.silu(te))
    c = te[:, None, :] + _qdense(p["z_embedder"], z.astype(jnp.float32))
    h = jnp.concatenate([c, x], axis=1) + p["positional_embedding"]
    hd = dit.hidden_size // dit.num_heads
    for i in range(dit.depth):
        bp = p[f"blocks_{i}"]
        n1 = _ln_np(h)
        qkv = _qdense(bp["attn"]["qkv"], n1)
        b_, l_, _ = qkv.shape
        qkv = qkv.reshape(b_, l_, 3, dit.num_heads, hd)
        q, k, v = (jnp.moveaxis(qkv[:, :, j], 1, 2) for j in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
        o = jnp.moveaxis(o, 1, 2).reshape(b_, l_, dit.hidden_size)
        h = h + _qdense(bp["attn"]["proj"], o)
        n2 = _ln_np(h)
        m = gelu_tanh(_qdense(bp["mlp"]["fc1"], n2))
        h = h + _qdense(bp["mlp"]["fc2"], m)
    h = _qdense(p["final_linear"], _ln_np(h))
    return h[:, c.shape[1]:, :]


def dit_forward_quant_cfg(dit: DiT, p, x, t, z, cfg_scale):
    """forward_with_cfg over dit_forward_quant (same batched-CFG math)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = dit_forward_quant(dit, p, combined, t, z)
    eps, rest = out[..., : dit.in_channels], out[..., dit.in_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)


def densify_zero_init(action_params, key, scale: float = 0.02):
    """Copy of a DiT param subtree with the zero-init eps head re-randomised.

    At init the DiT's final linear is all-zero (matching the reference's
    zero-init, models/action_model/models.py), so it predicts exactly 0 for
    ANY input and sampled actions are independent of the conditioning
    features. Any test or drift measurement that needs actions to RESPOND
    to the feature path must densify first, or it passes trivially.
    """
    p = dict(action_params)
    fl = dict(p["final_linear"])
    k = fl["kernel"]
    fl["kernel"] = (scale * jax.random.normal(key, k.shape, jnp.float32)
                    ).astype(k.dtype)
    p["final_linear"] = fl
    return p


class ActionDiffusionHead:
    """Functional train-loss / sampling around a DiT (no flax state of its
    own; the DiT params live inside the parent model's tree)."""

    def __init__(self, cfg: ActionDiffusionConfig, dit: DiT):
        self.cfg = cfg
        self.dit = dit
        steps = cfg.flow_steps if cfg.flow_matching else cfg.diffusion_steps
        self.schedule = make_schedule(cfg.noise_schedule, steps)
        self.ddim_schedule = respace_schedule(
            self.schedule, ddim_timestep_map(steps, cfg.ddim_steps)
        )

    # -- training ---------------------------------------------------------
    def loss(self, dit_call, x, z, rng, noise=None, t=None):
        """Mean MSE diffusion (or FM) loss; x: (N,T,C) actions, z: (N,T,Z).

        dit_call(x_t, t, z, drop_rng) -> prediction, running the DiT in train
        mode (label dropout active). The reference repeats each sample
        `repeated_diffusion_steps`x with fresh timesteps
        (dreamvla_model.py:930-933); we draw that many independent (noise, t)
        pairs per element via a leading repeat, identical in expectation.

        noise/t: explicit (N*reps, T, C) noise and (N*reps,) integer
        timesteps, overriding the rng draws — used by the reference-parity
        tests to feed BOTH frameworks identical randomness
        (action_model.py:59-60 draws them with torch RNG).
        """
        reps = self.cfg.repeated_diffusion_steps
        x = jnp.tile(x, (reps, 1, 1))
        z = jnp.tile(z, (reps, 1, 1))
        n = x.shape[0]
        r_noise, r_t, r_drop = jax.random.split(rng, 3)
        if noise is None:
            noise = jax.random.normal(r_noise, x.shape, x.dtype)
        if t is None:
            t = jax.random.randint(r_t, (n,), 0, self.schedule.num_timesteps)
        t = jnp.asarray(t)
        if self.cfg.flow_matching:
            t = t.astype(jnp.float32) / self.schedule.num_timesteps
            x_t = t[:, None, None] * x + (1 - t[:, None, None]) * noise
            ut = dit_call(x_t, t, z, r_drop)
            return jnp.mean((ut - (x - noise)) ** 2)
        x_t = q_sample(self.schedule, x, t, noise)
        pred = dit_call(x_t, t.astype(jnp.float32), z, r_drop)
        return jnp.mean((pred - noise) ** 2)

    # -- inference --------------------------------------------------------
    def sample(self, params, z, rng, use_ddim: bool = True,
               noise_rows=None, noise_n: int = 0, noise=None):
        """DDIM/DDPM/FM sampling. params: the DiT param subtree; z: (N, T, Z)
        trunk condition tokens. Returns (N, T, in_channels).

        noise_rows/noise_n: draw the initial noise at shape (noise_n, T, C)
        and keep rows `noise_rows` (N of them). Lets a caller that samples
        only selected positions stay bit-identical to an all-positions
        sample of the same rng (the DDIM/FM loops are deterministic given
        the initial noise) — see eval/policy.py trunk_step.

        noise: explicit (N, T, C) initial noise overriding the rng draw —
        used by the reference-parity tests to feed BOTH frameworks the same
        torch.randn draw (dreamvla_model.py:944); the DDIM loop at eta=0 is
        deterministic given it. Mutually exclusive with noise_rows.
        """
        if noise is not None and noise_rows is not None:
            raise ValueError("pass either noise or noise_rows, not both")
        n, t_len, _ = z.shape
        c = self.cfg.in_channels
        r_noise, r_loop = jax.random.split(rng)

        def draw(r, lead):
            if noise is not None:
                x = jnp.asarray(noise, jnp.float32)
                return jnp.concatenate([x, x], axis=0) if lead == 2 else x
            if noise_rows is None:
                return jax.random.normal(r, (lead * n, t_len, c), jnp.float32)
            x = jax.random.normal(r, (lead * noise_n, t_len, c), jnp.float32)
            rows = jnp.asarray(noise_rows)
            if lead == 2:
                rows = jnp.concatenate([rows, noise_n + rows])
            return x[rows]

        from dreamvla_tpu.ops.quant import is_quantized

        quant = is_quantized(params["blocks_0"]["attn"]["qkv"]["kernel"]) \
            if "blocks_0" in params else False

        def apply(x, t):
            if quant:
                return dit_forward_quant(self.dit, params, x, t, z)
            return self.dit.apply({"params": params}, x, t, z)

        def apply_cfg(x, t, z_full, scale):
            if quant:
                return dit_forward_quant_cfg(self.dit, params, x, t, z_full,
                                             scale)
            return self.dit.apply(
                {"params": params}, x, t, z_full, scale,
                method=DiT.forward_with_cfg,
            )

        if self.cfg.flow_matching:
            z_full = jnp.concatenate([z, z], axis=0)  # CFG neutralised (scale 1)
            out = flow_matching_sample_loop(
                lambda x, t: apply_cfg(x, t, z_full, 1.0),
                self.schedule.num_timesteps, (2 * n, t_len, c), r_loop,
                x0=(draw(r_loop, 2)
                    if (noise_rows is not None or noise is not None)
                    else None),
            )
            return out[:n]

        x0 = draw(r_noise, 1)
        if self.cfg.cfg_scale > 1.0:
            noise2 = jnp.concatenate([x0, x0], axis=0)
            uncond = jnp.broadcast_to(
                params["uncondition"].astype(z.dtype), (n, t_len, z.shape[-1])
            )
            z_full = jnp.concatenate([z, uncond], axis=0)
            samples = ddim_sample_loop(
                lambda x, t: apply_cfg(x, t, z_full, self.cfg.cfg_scale),
                self.ddim_schedule, noise2,
            )
            return jnp.split(samples, 2, axis=0)[0]
        if use_ddim:
            return ddim_sample_loop(apply, self.ddim_schedule, x0)
        # DDPM draws fresh per-step noise at batch n inside the loop, so the
        # row-sliced-initial-noise parity trick (noise_rows) does not extend
        # to this branch — it only holds for the deterministic DDIM/FM loops.
        if noise_rows is not None:
            raise ValueError(
                "noise_rows bit-parity is only defined for use_ddim=True or "
                "flow_matching; DDPM per-step noise is drawn at batch n")
        return p_sample_loop(apply, self.schedule, x0, r_loop)
