"""CoTracker3 (offline) point tracker — full JAX/Flax inference port.

The reference's flow labels come from the released CoTracker3-offline
checkpoint (`scaled_offline.pth`) run over (frame t, t+frame_gap) pairs on
a 28x28 query grid (reference data_process/cotrack_extractor.py:296-330;
docs/CALVIN_ABC-D_RUN.md:19-25). This module re-implements the public
CoTracker3 inference graph (facebookresearch/co-tracker, model
`cotracker3_offline`) TPU-first:

  * `BasicEncoder` — stride-4 FPN-style conv feature net (4 residual
    stages at strides 2/4/8/16, all bilinearly resized to stride 4 and
    fused by a 3x3 conv), instance-norm without affine params;
  * 4-level correlation pyramid: per query point, a (2r+1)^2 support
    window of track features correlated against a (2r+1)^2 window around
    the current estimate -> 49x49 volume -> MLP embedding per level;
  * `EfficientUpdateFormer` — factorised time/space transformer over
    point tracks with 64 learned "virtual track" tokens; 6 refinement
    iterations run under `lax.scan` (one compiled body);
  * the predictor wrapper: bilinear align-corners resize of the video to
    the 384x512 model resolution, query rescaling, visibility =
    sigmoid(vis) * sigmoid(conf) > 0.6, query-frame correction, rescale
    back (co-tracker predictor semantics).

All sampling matches `torch.nn.functional.grid_sample(align_corners=True,
padding_mode="border")` exactly (weights from the clamped coordinate's
fractional part, clamped gather indices). Convolutions use explicit
torch-style padding so feature maps align bit-for-bit.

Weight import: `import_cotracker3` maps the released checkpoint layout
(`fnet.*`, `corr_mlp.*`, `updateformer.*`, `time_emb`) onto this module's
param tree; parity is pinned by a transcribed torch oracle in
tests/test_cotracker3.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dreamvla_tpu.ops.posemb import get_1d_sincos_pos_embed_from_grid


# --------------------------------------------------------------------------
# config
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class CoTracker3Config:
    """Shape hyper-params of the released cotracker3_offline model."""

    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    latent_dim: int = 128          # fnet output channels
    hidden_size: int = 384         # updateformer width
    num_heads: int = 8
    mlp_ratio: float = 4.0
    time_depth: int = 3
    space_depth: int = 3
    num_virtual_tracks: int = 64
    corr_hidden: int = 384         # corr_mlp hidden width
    corr_out: int = 256            # corr_mlp output per level
    window_len: int = 60
    model_resolution: Tuple[int, int] = (384, 512)  # (H, W)

    @property
    def input_dim(self) -> int:
        # per-level corr embedding + vis + conf + posenc(rel fwd/bwd coords)
        return self.corr_levels * self.corr_out + 2 + 84


def tiny_config(**kw) -> CoTracker3Config:
    """Small config for CPU tests (same structure, tiny widths)."""
    base = dict(latent_dim=16, hidden_size=32, num_heads=2, corr_hidden=24,
                corr_out=12, num_virtual_tracks=4, window_len=8,
                model_resolution=(48, 64))
    base.update(kw)
    return CoTracker3Config(**base)


# --------------------------------------------------------------------------
# grid_sample-parity sampling / resize primitives
# --------------------------------------------------------------------------
def bilinear_sample_border(fmap: jnp.ndarray, coords: jnp.ndarray
                           ) -> jnp.ndarray:
    """Sample fmap (H, W, C) at coords (..., 2) [x, y] in pixel units.

    Matches grid_sample(align_corners=True, padding_mode="border"): the
    coordinate is clamped to the image rect, corner indices are clamped
    for the gather, interpolation weights come from the clamped coord.
    """
    h, w, _ = fmap.shape
    x = jnp.clip(coords[..., 0], 0.0, float(w - 1))
    y = jnp.clip(coords[..., 1], 0.0, float(h - 1))
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _resize_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """Interpolation matrix R (n_out, n_in): align_corners=True bilinear
    resize along one axis as a matmul (MXU-friendly, exact)."""
    if n_out == 1 or n_in == 1:
        src = np.zeros(n_out)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    frac = src - i0
    mat = np.zeros((n_out, n_in))
    mat[np.arange(n_out), i0] += 1.0 - frac
    mat[np.arange(n_out), i1] += frac
    return jnp.asarray(mat, dtype)


def resize_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]
                         ) -> jnp.ndarray:
    """x (..., H, W, C) -> (..., H2, W2, C), bilinear align_corners=True
    (F.interpolate parity), expressed as two einsum contractions."""
    h, w = x.shape[-3], x.shape[-2]
    rh = _resize_matrix(h, out_hw[0], x.dtype)
    rw = _resize_matrix(w, out_hw[1], x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", rh, x)
    return jnp.einsum("pw,...hwc->...hpc", rw, x)


def interp_linear_half_pixel(emb: jnp.ndarray, t_out: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) along axis 0:
    emb (T, D) -> (t_out, D). Used for the time embedding."""
    t_in = emb.shape[0]
    if t_in == t_out:
        return emb
    src = (np.arange(t_out) + 0.5) * (t_in / t_out) - 0.5
    src = np.clip(src, 0.0, t_in - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, t_in - 1)
    i1 = np.minimum(i0 + 1, t_in - 1)
    frac = jnp.asarray((src - i0)[:, None], emb.dtype)
    return emb[i0] * (1 - frac) + emb[i1] * frac


def posenc(x: jnp.ndarray, min_deg: int = 0, max_deg: int = 10
           ) -> jnp.ndarray:
    """CoTracker positional encoding: cat([x, sin(xb), cos(xb)]) with
    scale-major flattening of xb = x * 2^[min_deg, max_deg)."""
    scales = jnp.asarray([2.0 ** i for i in range(min_deg, max_deg)], x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    four = jnp.sin(jnp.concatenate([xb, xb + 0.5 * math.pi], axis=-1))
    return jnp.concatenate([x, four], axis=-1)


def get_points_on_a_grid(patch_size: int, image_size: Tuple[int, int]
                         ) -> np.ndarray:
    """Reference extractor's query grid: patch-cell centers [x, y]
    (cotrack_extractor.py:51-66). 28x28=784 points for patch 8 @ 224."""
    h, w = image_size
    y_centers = np.arange(patch_size // 2, h, patch_size)
    x_centers = np.arange(patch_size // 2, w, patch_size)
    xv, yv = np.meshgrid(x_centers, y_centers)
    return np.stack([xv, yv], axis=-1).reshape(-1, 2).astype(np.float32)


# --------------------------------------------------------------------------
# feature encoder (fnet)
# --------------------------------------------------------------------------
def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial norm
    over NHWC."""
    mu = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _conv(features: int, kernel: int, stride: int = 1, pad: Optional[int]
          = None, name: str = "") -> nn.Conv:
    if pad is None:
        pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name)


class ResidualBlock(nn.Module):
    """co-tracker blocks.py ResidualBlock (instance norm, no affine)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_instance_norm(_conv(self.features, 3, self.stride,
                                         name="conv1")(x)))
        y = nn.relu(_instance_norm(_conv(self.features, 3, name="conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _instance_norm(
                nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        name="downsample")(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-4 FPN conv encoder (co-tracker blocks.py BasicEncoder):
    (B, H, W, 3) NHWC in [-1, 1] -> (B, H/4, W/4, latent_dim)."""

    latent_dim: int = 128
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        d = self.latent_dim
        h_out = x.shape[-3] // self.stride
        w_out = x.shape[-2] // self.stride
        x = _conv(d // 2, 7, 2, pad=3, name="conv1")(x)
        x = nn.relu(_instance_norm(x))
        a = ResidualBlock(d // 2, name="layer1_1")(
            ResidualBlock(d // 2, name="layer1_0")(x))            # stride 2
        b = ResidualBlock(d // 4 * 3, name="layer2_1")(
            ResidualBlock(d // 4 * 3, stride=2, name="layer2_0")(a))  # s4
        c = ResidualBlock(d, name="layer3_1")(
            ResidualBlock(d, stride=2, name="layer3_0")(b))       # stride 8
        e = ResidualBlock(d, name="layer4_1")(
            ResidualBlock(d, stride=2, name="layer4_0")(c))       # stride 16
        cat = jnp.concatenate(
            [resize_align_corners(t, (h_out, w_out)) for t in (a, b, c, e)],
            axis=-1)
        x = _conv(d * 2, 3, name="conv2")(cat)
        x = nn.relu(_instance_norm(x))
        return nn.Conv(d, (1, 1), name="conv3")(x)


# --------------------------------------------------------------------------
# update transformer
# --------------------------------------------------------------------------
class Attention(nn.Module):
    """co-tracker Attention: to_q / to_kv / to_out, pre-scaled dot product."""

    num_heads: int

    @nn.compact
    def __call__(self, x, context=None):
        c = x.shape[-1]
        ctx = x if context is None else context
        h = self.num_heads
        d = c // h
        q = nn.Dense(c, name="to_q")(x)
        kv = nn.Dense(2 * c, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        b, n1 = x.shape[0], x.shape[1]
        n2 = ctx.shape[1]
        q = q.reshape(b, n1, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n2, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n2, h, d).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n1, c)
        return nn.Dense(c, name="to_out")(out)


def _ln_noaffine(x, eps=1e-6):
    return nn.LayerNorm(epsilon=eps, use_scale=False, use_bias=False)(x)


class Mlp(nn.Module):
    hidden: int
    out: int
    approx_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=self.approx_gelu)
        return nn.Dense(self.out, name="fc2")(x)


class AttnBlock(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        x = x + Attention(self.num_heads, name="attn")(_ln_noaffine(x))
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio),
                    self.hidden_size, name="mlp")(_ln_noaffine(x))
        return x


class CrossAttnBlock(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, context):
        ctx = nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
        x = x + Attention(self.num_heads, name="cross_attn")(
            _ln_noaffine(x), context=ctx)
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio),
                    self.hidden_size, name="mlp")(_ln_noaffine(x))
        return x


class EfficientUpdateFormer(nn.Module):
    """Factorised track transformer (co-tracker blocks.py). Input
    (B, N, T, input_dim) -> per-track deltas (B, N, T, 4):
    [dx, dy, dvis, dconf]."""

    cfg: CoTracker3Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        tokens = nn.Dense(cfg.hidden_size, name="input_transform")(x)
        b, n_pts, t, _ = tokens.shape
        virtual = self.param(
            "virtual_tracks", nn.initializers.normal(1.0),
            (1, cfg.num_virtual_tracks, 1, cfg.hidden_size))
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(
                virtual, (b, cfg.num_virtual_tracks, t, cfg.hidden_size))],
            axis=1)
        n = n_pts + cfg.num_virtual_tracks

        stride = len(range(cfg.time_depth)) // cfg.space_depth
        j = 0
        for i in range(cfg.time_depth):
            time_tokens = tokens.reshape(b * n, t, cfg.hidden_size)
            time_tokens = AttnBlock(cfg.hidden_size, cfg.num_heads,
                                    cfg.mlp_ratio,
                                    name=f"time_blocks_{i}")(time_tokens)
            tokens = time_tokens.reshape(b, n, t, cfg.hidden_size)
            if i % stride == 0 and j < cfg.space_depth:
                space = tokens.transpose(0, 2, 1, 3).reshape(
                    b * t, n, cfg.hidden_size)
                pts, virt = space[:, :n_pts], space[:, n_pts:]
                virt = CrossAttnBlock(
                    cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                    name=f"space_virtual2point_blocks_{j}")(virt, pts)
                virt = AttnBlock(cfg.hidden_size, cfg.num_heads,
                                 cfg.mlp_ratio,
                                 name=f"space_virtual_blocks_{j}")(virt)
                pts = CrossAttnBlock(
                    cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                    name=f"space_point2virtual_blocks_{j}")(pts, virt)
                space = jnp.concatenate([pts, virt], axis=1)
                tokens = space.reshape(b, t, n, cfg.hidden_size
                                       ).transpose(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, :n_pts]
        flow = nn.Dense(2, name="flow_head")(tokens)
        vis_conf = nn.Dense(2, name="vis_conf_head")(tokens)
        return jnp.concatenate([flow, vis_conf], axis=-1)


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------
def default_time_emb(cfg: CoTracker3Config) -> np.ndarray:
    """The model's registered time_emb buffer: 1-D sincos over
    linspace(0, window_len-1)."""
    pos = np.linspace(0.0, cfg.window_len - 1, cfg.window_len)
    return get_1d_sincos_pos_embed_from_grid(
        cfg.input_dim, pos).astype(np.float32)


def init_cotracker3(cfg: CoTracker3Config, seed: int = 0) -> Dict:
    """Random-init variables {fnet, corr_mlp, updateformer, time_emb}."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    h, w = cfg.model_resolution
    r = 2 * cfg.corr_radius + 1
    fnet = BasicEncoder(cfg.latent_dim, cfg.stride).init(
        k1, jnp.zeros((1, h, w, 3)))["params"]
    corr_mlp = Mlp(cfg.corr_hidden, cfg.corr_out, approx_gelu=False).init(
        k2, jnp.zeros((1, r * r * r * r)))["params"]
    upd = EfficientUpdateFormer(cfg).init(
        k3, jnp.zeros((1, 2, 2, cfg.input_dim)))["params"]
    return {"fnet": fnet, "corr_mlp": corr_mlp, "updateformer": upd,
            "time_emb": jnp.asarray(default_time_emb(cfg))}


def _support_offsets(radius: int, dtype=jnp.float32) -> jnp.ndarray:
    """(2r+1, 2r+1, 2) offsets; [a, b] = (delta_x=lin[a], delta_y=lin[b]) —
    the reference's get_support_points axis convention (x varies along the
    first window axis)."""
    lin = jnp.linspace(-radius, radius, 2 * radius + 1, dtype=dtype)
    dx = lin[:, None]  # varies along axis 0
    dy = lin[None, :]  # varies along axis 1
    shape = (2 * radius + 1, 2 * radius + 1)
    return jnp.stack([jnp.broadcast_to(dx, shape),
                      jnp.broadcast_to(dy, shape)], axis=-1)


def _sample_windows(fmaps: jnp.ndarray, centers: jnp.ndarray,
                    radius: int) -> jnp.ndarray:
    """fmaps (M, H, W, C), centers (M, N, 2) -> (M, N, r, r, C): bilinear
    window samples around each center (border padding)."""
    offs = _support_offsets(radius, centers.dtype)      # (r, r, 2)
    grid = centers[:, :, None, None, :] + offs[None, None]
    return jax.vmap(bilinear_sample_border)(fmaps, grid)


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def cotracker3_forward(variables: Dict, video: jnp.ndarray,
                       queries: jnp.ndarray, cfg: CoTracker3Config,
                       iters: int = 6
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CoTrackerThreeOffline.forward.

    video   (B, T, H, W, 3) float in [0, 255] at model_resolution (NHWC)
    queries (B, N, 3) — (frame, x, y) in model-resolution pixels
    returns (tracks (B, T, N, 2) px, vis (B, T, N), conf (B, T, N)),
    vis/conf already sigmoided.
    """
    b, t, h, w, _ = video.shape
    n = queries.shape[1]
    s = cfg.stride
    r = 2 * cfg.corr_radius + 1
    video = 2.0 * (video / 255.0) - 1.0

    fmaps = BasicEncoder(cfg.latent_dim, s).apply(
        {"params": variables["fnet"]}, video.reshape(b * t, h, w, 3))
    # unit-normalise feature channels
    fmaps = fmaps * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(fmaps ** 2, axis=-1, keepdims=True), 1e-12))
    hs, ws = h // s, w // s

    # pyramid of 2x average pools
    pyramid: List[jnp.ndarray] = [fmaps]
    for _ in range(cfg.corr_levels - 1):
        f = pyramid[-1]
        ph, pw = f.shape[1] // 2, f.shape[2] // 2
        pyramid.append(f[:, :ph * 2, :pw * 2].reshape(
            f.shape[0], ph, 2, pw, 2, -1).mean(axis=(2, 4)))

    queried_frames = queries[:, :, 0].astype(jnp.int32)       # (B, N)
    queried_coords = queries[..., 1:3] / s                    # (B, N, 2)

    # per-level track support features at the query frame:
    # sample every frame, then one-hot select the queried frame (T is tiny)
    frame_onehot = jax.nn.one_hot(queried_frames, t, dtype=fmaps.dtype)
    track_support = []
    for lvl in range(cfg.corr_levels):
        fl = pyramid[lvl].reshape(b, t, *pyramid[lvl].shape[1:])
        centers = queried_coords / (2.0 ** lvl)
        win = _sample_windows(
            fl.reshape(b * t, *fl.shape[2:]),
            jnp.repeat(centers, t, axis=0).reshape(b * t, n, 2),
            cfg.corr_radius)                                   # (BT,N,r,r,C)
        win = win.reshape(b, t, n, r, r, -1)
        track_support.append(jnp.einsum("btnijc,bnt->bnijc", win,
                                        frame_onehot))

    corr_apply = functools.partial(
        Mlp(cfg.corr_hidden, cfg.corr_out, approx_gelu=False).apply,
        {"params": variables["corr_mlp"]})
    upd_apply = functools.partial(
        EfficientUpdateFormer(cfg).apply,
        {"params": variables["updateformer"]})

    time_emb = interp_linear_half_pixel(
        jnp.asarray(variables["time_emb"]).reshape(-1, cfg.input_dim), t)
    rel_scale = jnp.asarray(
        [cfg.model_resolution[1] / s, cfg.model_resolution[0] / s],
        video.dtype)

    coords0 = jnp.broadcast_to(queried_coords[:, None], (b, t, n, 2))

    def body(carry, _):
        coords, vis, conf = carry
        embs = []
        for lvl in range(cfg.corr_levels):
            win = _sample_windows(
                pyramid[lvl],
                coords.reshape(b * t, n, 2) / (2.0 ** lvl),
                cfg.corr_radius)                              # (BT,N,r,r,C)
            win = win.reshape(b, t, n, r, r, -1)
            vol = jnp.einsum("btnuvc,bnijc->btnuvij", win,
                             track_support[lvl])
            embs.append(corr_apply(vol.reshape(b * t * n, r * r * r * r)))
        corr_embs = jnp.concatenate(embs, axis=-1).reshape(b, t, n, -1)

        rel_fwd = jnp.pad(coords[:, :-1] - coords[:, 1:],
                          ((0, 0), (0, 1), (0, 0), (0, 0))) / rel_scale
        rel_bwd = jnp.pad(coords[:, 1:] - coords[:, :-1],
                          ((0, 0), (1, 0), (0, 0), (0, 0))) / rel_scale
        rel_emb = posenc(jnp.concatenate([rel_fwd, rel_bwd], axis=-1))

        x = jnp.concatenate(
            [vis[..., None], conf[..., None], corr_embs, rel_emb], axis=-1)
        x = x + time_emb[None, :, None, :]
        x = x.transpose(0, 2, 1, 3)                           # (B, N, T, D)

        delta = upd_apply(x)                                  # (B, N, T, 4)
        coords = coords + delta[..., :2].transpose(0, 2, 1, 3)
        vis = vis + delta[..., 2].transpose(0, 2, 1)
        conf = conf + delta[..., 3].transpose(0, 2, 1)
        return (coords, vis, conf), None

    init = (coords0, jnp.zeros((b, t, n), video.dtype),
            jnp.zeros((b, t, n), video.dtype))
    (coords, vis, conf), _ = jax.lax.scan(body, init, None, length=iters)
    return (coords * float(s), jax.nn.sigmoid(vis), jax.nn.sigmoid(conf))


# --------------------------------------------------------------------------
# predictor wrapper (CoTrackerPredictor._compute_sparse_tracks semantics)
# --------------------------------------------------------------------------
VIS_THRESHOLD = 0.6


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def predict_tracks(variables: Dict, video: jnp.ndarray,
                   queries: jnp.ndarray, cfg: CoTracker3Config,
                   iters: int = 6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """co-tracker predictor semantics for query-point tracking (the
    reference always passes explicit queries, so no support grid is added
    — predictor.forward with queries + grid_size>0).

    video   (B, T, H, W, 3) float 0-255, any resolution
    queries (B, N, 3) (frame, x, y) in input pixels
    returns (tracks (B, T, N, 2) in input pixels, visible (B, T, N) bool)
    """
    b, t, h, w, _ = video.shape
    mh, mw = cfg.model_resolution
    video_rs = resize_align_corners(
        video.reshape(b * t, h, w, 3), (mh, mw)).reshape(b, t, mh, mw, 3)
    qscale = jnp.asarray([(mw - 1) / (w - 1), (mh - 1) / (h - 1)],
                         queries.dtype)
    queries_rs = jnp.concatenate(
        [queries[..., :1], queries[..., 1:3] * qscale], axis=-1)

    tracks, vis, conf = cotracker3_forward(variables, video_rs, queries_rs,
                                           cfg, iters)
    visibility = vis * conf

    # query-frame correction: predictions at the query frame are replaced
    # by the query coords and marked visible
    frame_onehot = jax.nn.one_hot(queries[:, :, 0].astype(jnp.int32), t,
                                  dtype=tracks.dtype)          # (B, N, T)
    at_query = frame_onehot.transpose(0, 2, 1)                 # (B, T, N)
    tracks = (tracks * (1 - at_query[..., None])
              + queries_rs[:, None, :, 1:3] * at_query[..., None])
    visibility = jnp.maximum(visibility, at_query)

    tracks = tracks / qscale
    return tracks, visibility > VIS_THRESHOLD


# --------------------------------------------------------------------------
# weight import (scaled_offline.pth layout)
# --------------------------------------------------------------------------
def _conv_w(im, tp: str, path: Tuple[str, ...]) -> None:
    w = im.take(f"{tp}.weight")
    if w is not None:
        im.assign(path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
    if im.has(f"{tp}.bias"):
        im.assign(path + ("bias",), im.take(f"{tp}.bias"))


def _residual(im, tp: str, path: Tuple[str, ...]) -> None:
    _conv_w(im, f"{tp}.conv1", path + ("conv1",))
    _conv_w(im, f"{tp}.conv2", path + ("conv2",))
    if im.has(f"{tp}.downsample.0.weight"):
        _conv_w(im, f"{tp}.downsample.0", path + ("downsample",))


def _attn(im, tp: str, path: Tuple[str, ...]) -> None:
    im.dense(f"{tp}.to_q", path + ("to_q",))
    im.dense(f"{tp}.to_kv", path + ("to_kv",))
    im.dense(f"{tp}.to_out", path + ("to_out",))


def _mlp(im, tp: str, path: Tuple[str, ...]) -> None:
    im.dense(f"{tp}.fc1", path + ("fc1",))
    im.dense(f"{tp}.fc2", path + ("fc2",))


def _attn_block(im, tp: str, path: Tuple[str, ...]) -> None:
    _attn(im, f"{tp}.attn", path + ("attn",))
    _mlp(im, f"{tp}.mlp", path + ("mlp",))


def _cross_block(im, tp: str, path: Tuple[str, ...]) -> None:
    im.layernorm(f"{tp}.norm_context", path + ("norm_context",))
    _attn(im, f"{tp}.cross_attn", path + ("cross_attn",))
    _mlp(im, f"{tp}.mlp", path + ("mlp",))


def import_cotracker3(sd: Dict[str, np.ndarray],
                      cfg: CoTracker3Config = CoTracker3Config()
                      ) -> Tuple[Dict, List[str], List[str]]:
    """Released cotracker3 checkpoint (`scaled_offline.pth`, optionally
    wrapped in {'model': ...}) -> variables for `cotracker3_forward`.

    Returns (variables, missing_keys, unexpected_keys)."""
    from dreamvla_tpu.utils.torch_import import _Importer

    im = _Importer(sd)
    _conv_w(im, "fnet.conv1", ("fnet", "conv1"))
    for li, _ in enumerate(("layer1", "layer2", "layer3", "layer4"), 1):
        for bi in range(2):
            _residual(im, f"fnet.layer{li}.{bi}",
                      ("fnet", f"layer{li}_{bi}"))
    _conv_w(im, "fnet.conv2", ("fnet", "conv2"))
    _conv_w(im, "fnet.conv3", ("fnet", "conv3"))
    _mlp(im, "corr_mlp", ("corr_mlp",))

    up = "updateformer"
    im.dense(f"{up}.input_transform", (up, "input_transform"))
    im.dense(f"{up}.flow_head", (up, "flow_head"))
    im.dense(f"{up}.vis_conf_head", (up, "vis_conf_head"))
    # the released checkpoint spells it "virual_tracks"
    vt_key = (f"{up}.virual_tracks" if im.has(f"{up}.virual_tracks")
              else f"{up}.virtual_tracks")
    im.raw(vt_key, (up, "virtual_tracks"))
    for i in range(cfg.time_depth):
        _attn_block(im, f"{up}.time_blocks.{i}", (up, f"time_blocks_{i}"))
    for j in range(cfg.space_depth):
        _attn_block(im, f"{up}.space_virtual_blocks.{j}",
                    (up, f"space_virtual_blocks_{j}"))
        _cross_block(im, f"{up}.space_point2virtual_blocks.{j}",
                     (up, f"space_point2virtual_blocks_{j}"))
        _cross_block(im, f"{up}.space_virtual2point_blocks.{j}",
                     (up, f"space_virtual2point_blocks_{j}"))

    variables = dict(im.out)
    if im.has("time_emb"):
        variables["time_emb"] = np.asarray(im.take("time_emb")).reshape(
            -1, cfg.input_dim)
    else:
        variables["time_emb"] = default_time_emb(cfg)
    return variables, im.missing, im.unexpected()


# --------------------------------------------------------------------------
# extractor-facing track_fn
# --------------------------------------------------------------------------
class CoTracker3GridTracker:
    """`track_fn` implementation backed by the CoTracker3 port: per frame
    t, grid deltas to t+frame_gap with tail zero-fill — the exact artifact
    the reference extractor writes (cotrack_extractor.py:296-330)."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 cfg: CoTracker3Config = CoTracker3Config(),
                 frame_gap: int = 5, chunk: int = 32, iters: int = 6):
        self.cfg = cfg
        self.frame_gap = frame_gap
        self.chunk = chunk
        self.iters = iters
        if checkpoint_path:
            from dreamvla_tpu.utils.torch_import import (
                load_torch_state_dict, strip_prefix)

            sd = strip_prefix(load_torch_state_dict(checkpoint_path))
            self.variables, missing, _ = import_cotracker3(sd, cfg)
            if missing:
                raise ValueError(
                    f"cotracker3 import missing keys: {missing[:5]}")
        else:  # random weights (pipeline smoke tests)
            self.variables = init_cotracker3(cfg)

    def __call__(self, frames_uint8: np.ndarray, grid: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        t, h, w = frames_uint8.shape[:3]
        n = grid * grid
        tracks = np.zeros((t, n, 2), np.float32)
        vis = np.zeros((t, n), np.float32)
        gap = self.frame_gap
        if t <= gap:
            return tracks, vis
        pts = get_points_on_a_grid(h // grid, (h, w))
        queries = np.concatenate(
            [np.zeros((n, 1), np.float32), pts], axis=-1)[None]  # (1, N, 3)
        pairs = np.stack([frames_uint8[: t - gap], frames_uint8[gap:]],
                         axis=1).astype(np.float32)              # (P,2,H,W,3)
        n_pairs = len(pairs)
        chunk = min(self.chunk, n_pairs)
        q = jnp.asarray(np.repeat(queries, chunk, axis=0))
        for lo in range(0, n_pairs, chunk):
            batch = pairs[lo:lo + chunk]
            pad = chunk - len(batch)  # pad tail to one static jit shape
            if pad:
                batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
            trk, vb = predict_tracks(self.variables, jnp.asarray(batch), q,
                                     self.cfg, self.iters)
            take = chunk - pad
            trk = np.asarray(trk[:take])
            tracks[lo:lo + take] = trk[:, 1] - trk[:, 0]
            vis[lo:lo + take] = np.asarray(vb[:take, 1], np.float32)
        return tracks, vis
