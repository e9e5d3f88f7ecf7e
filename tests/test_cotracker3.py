"""CoTracker3 port parity vs a transcribed torch oracle.

The oracle below transcribes the public facebookresearch/co-tracker
model code (cotracker/models/core/cotracker/cotracker3_offline.py and
blocks.py) — the model the reference runs for its flow labels
(reference data_process/cotrack_extractor.py:296-330, checkpoint
`scaled_offline.pth`). Both sides load the same fabricated torch
state_dict through `import_cotracker3`, so these tests pin the forward
graph *and* the importer key layout at once (same style as the GPT-2 /
DiT parity suites)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from dreamvla_tpu.extract.cotracker3 import (
    BasicEncoder, CoTracker3Config, CoTracker3GridTracker,
    bilinear_sample_border, cotracker3_forward, default_time_emb,
    get_points_on_a_grid, import_cotracker3, init_cotracker3,
    interp_linear_half_pixel, posenc, predict_tracks, resize_align_corners,
    tiny_config)

torch.manual_seed(0)


# ===================================================================
# torch oracle — transcription of co-tracker blocks.py / cotracker3
# ===================================================================
class TResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = nn.InstanceNorm2d(planes)
        self.norm2 = nn.InstanceNorm2d(planes)
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            self.norm3 = nn.InstanceNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TBasicEncoder(nn.Module):
    """co-tracker blocks.py BasicEncoder (stride 4, FPN concat)."""

    def __init__(self, input_dim=3, output_dim=128, stride=4):
        super().__init__()
        self.stride = stride
        self.in_planes = output_dim // 2
        self.conv1 = nn.Conv2d(input_dim, self.in_planes, 7, stride=2,
                               padding=3)
        self.norm1 = nn.InstanceNorm2d(self.in_planes)
        self.layer1 = self._make_layer(output_dim // 2, stride=1)
        self.layer2 = self._make_layer(output_dim // 4 * 3, stride=2)
        self.layer3 = self._make_layer(output_dim, stride=2)
        self.layer4 = self._make_layer(output_dim, stride=2)
        self.conv2 = nn.Conv2d(output_dim * 3 + output_dim // 4,
                               output_dim * 2, 3, padding=1)
        self.norm2 = nn.InstanceNorm2d(output_dim * 2)
        self.conv3 = nn.Conv2d(output_dim * 2, output_dim, 1)

    def _make_layer(self, dim, stride=1):
        layers = nn.Sequential(TResidualBlock(self.in_planes, dim, stride),
                               TResidualBlock(dim, dim, 1))
        self.in_planes = dim
        return layers

    def forward(self, x):
        _, _, H, W = x.shape
        x = F.relu(self.norm1(self.conv1(x)))
        a = self.layer1(x)
        b = self.layer2(a)
        c = self.layer3(b)
        d = self.layer4(c)

        def up(t):
            return F.interpolate(t, (H // self.stride, W // self.stride),
                                 mode="bilinear", align_corners=True)

        x = self.conv2(torch.cat([up(a), up(b), up(c), up(d)], dim=1))
        x = F.relu(self.norm2(x))
        return self.conv3(x)


class TAttention(nn.Module):
    def __init__(self, query_dim, context_dim=None, num_heads=8,
                 dim_head=48, qkv_bias=False):
        super().__init__()
        inner_dim = dim_head * num_heads
        context_dim = context_dim or query_dim
        self.scale = dim_head ** -0.5
        self.heads = num_heads
        self.to_q = nn.Linear(query_dim, inner_dim, bias=qkv_bias)
        self.to_kv = nn.Linear(context_dim, inner_dim * 2, bias=qkv_bias)
        self.to_out = nn.Linear(inner_dim, query_dim)

    def forward(self, x, context=None):
        B, N1, C = x.shape
        h = self.heads
        q = self.to_q(x).reshape(B, N1, h, C // h).permute(0, 2, 1, 3)
        context = x if context is None else context
        k, v = self.to_kv(context).chunk(2, dim=-1)
        N2 = context.shape[1]
        k = k.reshape(B, N2, h, C // h).permute(0, 2, 1, 3)
        v = v.reshape(B, N2, h, C // h).permute(0, 2, 1, 3)
        sim = (q @ k.transpose(-2, -1)) * self.scale
        attn = sim.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N1, C)
        return self.to_out(x)


class TMlp(nn.Module):
    def __init__(self, in_features, hidden_features, out_features,
                 act=None):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act or nn.GELU()
        self.fc2 = nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TAttnBlock(nn.Module):
    def __init__(self, hidden_size, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.attn = TAttention(hidden_size, num_heads=num_heads,
                               dim_head=hidden_size // num_heads,
                               qkv_bias=True)
        self.norm2 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.mlp = TMlp(hidden_size, int(hidden_size * mlp_ratio),
                        hidden_size, nn.GELU(approximate="tanh"))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TCrossAttnBlock(nn.Module):
    def __init__(self, hidden_size, context_dim, num_heads=1,
                 mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.norm_context = nn.LayerNorm(context_dim)
        self.cross_attn = TAttention(hidden_size, context_dim=context_dim,
                                     num_heads=num_heads,
                                     dim_head=hidden_size // num_heads,
                                     qkv_bias=True)
        self.norm2 = nn.LayerNorm(hidden_size, elementwise_affine=False,
                                  eps=1e-6)
        self.mlp = TMlp(hidden_size, int(hidden_size * mlp_ratio),
                        hidden_size, nn.GELU(approximate="tanh"))

    def forward(self, x, context):
        x = x + self.cross_attn(self.norm1(x),
                                context=self.norm_context(context))
        return x + self.mlp(self.norm2(x))


class TEfficientUpdateFormer(nn.Module):
    def __init__(self, cfg: CoTracker3Config):
        super().__init__()
        h = cfg.hidden_size
        self.num_virtual_tracks = cfg.num_virtual_tracks
        self.input_transform = nn.Linear(cfg.input_dim, h)
        self.flow_head = nn.Linear(h, 2)
        self.vis_conf_head = nn.Linear(h, 2)
        self.virual_tracks = nn.Parameter(  # sic — released spelling
            torch.randn(1, cfg.num_virtual_tracks, 1, h))
        self.time_blocks = nn.ModuleList(
            [TAttnBlock(h, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.time_depth)])
        self.space_virtual_blocks = nn.ModuleList(
            [TAttnBlock(h, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.space_depth)])
        self.space_point2virtual_blocks = nn.ModuleList(
            [TCrossAttnBlock(h, h, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.space_depth)])
        self.space_virtual2point_blocks = nn.ModuleList(
            [TCrossAttnBlock(h, h, cfg.num_heads, cfg.mlp_ratio)
             for _ in range(cfg.space_depth)])

    def forward(self, input_tensor):
        tokens = self.input_transform(input_tensor)  # B N T C
        B, _, T, _ = tokens.shape
        virtual = self.virual_tracks.repeat(B, 1, T, 1)
        tokens = torch.cat([tokens, virtual], dim=1)
        _, N, _, _ = tokens.shape
        j = 0
        for i in range(len(self.time_blocks)):
            tt = tokens.contiguous().view(B * N, T, -1)
            tt = self.time_blocks[i](tt)
            tokens = tt.view(B, N, T, -1)
            if i % (len(self.time_blocks)
                    // len(self.space_virtual_blocks)) == 0:
                st = tokens.permute(0, 2, 1, 3).contiguous().view(B * T, N,
                                                                  -1)
                pts = st[:, :N - self.num_virtual_tracks]
                virt = st[:, N - self.num_virtual_tracks:]
                virt = self.space_virtual2point_blocks[j](virt, pts)
                virt = self.space_virtual_blocks[j](virt)
                pts = self.space_point2virtual_blocks[j](pts, virt)
                st = torch.cat([pts, virt], dim=1)
                tokens = st.view(B, T, N, -1).permute(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, :N - self.num_virtual_tracks]
        flow = self.flow_head(tokens)
        vis_conf = self.vis_conf_head(tokens)
        return torch.cat([flow, vis_conf], dim=-1)


def t_bilinear_sampler(inp, coords, padding_mode="border"):
    """co-tracker model_utils.bilinear_sampler (align_corners=True)."""
    sizes = inp.shape[2:]
    if len(sizes) == 3:
        coords = coords[..., [1, 2, 0]]  # t x y -> x y t
    scale = [2 / max(s - 1, 1) for s in reversed(sizes)]
    coords = coords * torch.tensor(scale, device=coords.device) - 1
    return F.grid_sample(inp, coords, align_corners=True,
                         padding_mode=padding_mode)


def t_sample_features5d(inp, coords):
    """input (B, T, C, H, W), coords (B, R1, R2, 3) -> (B, R1, R2, C)."""
    inp = inp.permute(0, 2, 1, 3, 4)
    coords = coords.unsqueeze(3)
    feats = t_bilinear_sampler(inp, coords)
    return feats.permute(0, 2, 3, 1, 4).view(
        feats.shape[0], feats.shape[2], feats.shape[3], feats.shape[1])


def t_posenc(x, min_deg=0, max_deg=10):
    scales = torch.tensor([2 ** i for i in range(min_deg, max_deg)],
                          dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        *x.shape[:-1], -1)
    four = torch.sin(torch.cat([xb, xb + 0.5 * math.pi], dim=-1))
    return torch.cat([x] + [four], dim=-1)


class TCoTracker3Offline(nn.Module):
    """CoTrackerThreeOffline forward (inference path, all queries valid)."""

    def __init__(self, cfg: CoTracker3Config):
        super().__init__()
        self.cfg = cfg
        self.stride = cfg.stride
        self.corr_radius = cfg.corr_radius
        self.corr_levels = cfg.corr_levels
        self.latent_dim = cfg.latent_dim
        self.fnet = TBasicEncoder(3, cfg.latent_dim, cfg.stride)
        self.corr_mlp = TMlp((2 * cfg.corr_radius + 1) ** 4,
                             cfg.corr_hidden, cfg.corr_out)
        self.updateformer = TEfficientUpdateFormer(cfg)
        self.register_buffer(
            "time_emb",
            torch.from_numpy(default_time_emb(cfg)).float()[None])

    def get_support_points(self, coords, r, reshape_back=True):
        B, _, N, _ = coords.shape
        centroid = coords.reshape(B, N, 1, 1, 3)
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        xgrid, ygrid = torch.meshgrid(dy, dx, indexing="ij")
        zgrid = torch.zeros_like(xgrid)
        delta = torch.stack([zgrid, xgrid, ygrid], dim=-1).view(
            1, 1, 2 * r + 1, 2 * r + 1, 3)
        out = centroid + delta
        if reshape_back:
            return out.reshape(B, N, (2 * r + 1) ** 2, 3).permute(0, 2, 1, 3)
        return out

    def get_track_feat(self, fmaps, queried_frames, queried_coords, r):
        sample_frames = queried_frames[:, None, :, None].float()
        sample_coords = torch.cat([sample_frames,
                                   queried_coords[:, None]], dim=-1)
        support_points = self.get_support_points(sample_coords, r)
        feats = t_sample_features5d(fmaps, support_points)
        return feats  # (B, (2r+1)^2, N, C)

    def get_correlation_feat(self, fmaps, queried_coords):
        B, T, D, H, W = fmaps.shape
        N = queried_coords.shape[1]
        r = self.corr_radius
        sample_coords = torch.cat(
            [torch.zeros_like(queried_coords[..., :1]), queried_coords],
            dim=-1)[:, None]
        support = self.get_support_points(sample_coords, r,
                                          reshape_back=False)
        feat = t_bilinear_sampler(fmaps.reshape(B * T, D, 1, H, W),
                                  support, padding_mode="border")
        return feat.view(B, T, D, N, 2 * r + 1, 2 * r + 1).permute(
            0, 1, 3, 4, 5, 2)

    @torch.no_grad()
    def forward(self, video, queries, iters=4):
        B, T, C, H, W = video.shape
        N = queries.shape[1]
        video = 2 * (video / 255.0) - 1.0
        queried_frames = queries[:, :, 0].long()
        queried_coords = queries[..., 1:3] / self.stride

        fmaps = self.fnet(video.reshape(-1, C, H, W))
        fmaps = fmaps.permute(0, 2, 3, 1)
        fmaps = fmaps / torch.sqrt(
            torch.maximum(torch.sum(fmaps ** 2, dim=-1, keepdim=True),
                          torch.tensor(1e-12)))
        fmaps = fmaps.permute(0, 3, 1, 2).reshape(
            B, -1, self.latent_dim, H // self.stride, W // self.stride)

        fmaps_pyramid = [fmaps]
        track_feat_support_pyramid = []
        for i in range(self.corr_levels - 1):
            f_ = fmaps.reshape(B * T, self.latent_dim, fmaps.shape[-2],
                               fmaps.shape[-1])
            f_ = F.avg_pool2d(f_, 2, stride=2)
            fmaps = f_.reshape(B, T, self.latent_dim, f_.shape[-2],
                               f_.shape[-1])
            fmaps_pyramid.append(fmaps)
        for i in range(self.corr_levels):
            support = self.get_track_feat(
                fmaps_pyramid[i], queried_frames, queried_coords / 2 ** i,
                self.corr_radius)
            track_feat_support_pyramid.append(support.unsqueeze(1))

        coords = queried_coords.reshape(B, 1, N, 2).expand(B, T, N, 2
                                                           ).float().clone()
        vis = torch.zeros((B, T, N)).float()
        confidence = torch.zeros((B, T, N)).float()
        r = 2 * self.corr_radius + 1

        for _ in range(iters):
            coords = coords.detach()
            coords_init = coords.view(B * T, N, 2)
            corr_embs = []
            for i in range(self.corr_levels):
                corr_feat = self.get_correlation_feat(
                    fmaps_pyramid[i], coords_init / 2 ** i)
                support = (track_feat_support_pyramid[i]
                           .view(B, 1, r, r, N, self.latent_dim)
                           .squeeze(1).permute(0, 3, 1, 2, 4))
                corr_volume = torch.einsum("btnhwc,bnijc->btnhwij",
                                           corr_feat, support)
                corr_embs.append(self.corr_mlp(
                    corr_volume.reshape(B * T * N, r * r * r * r)))
            corr_embs = torch.cat(corr_embs, dim=-1).view(
                B, T, N, -1)

            rel_fwd = F.pad(coords[:, :-1] - coords[:, 1:],
                            (0, 0, 0, 0, 0, 1))
            rel_bwd = F.pad(coords[:, 1:] - coords[:, :-1],
                            (0, 0, 0, 0, 1, 0))
            scale = torch.tensor(
                [self.cfg.model_resolution[1],
                 self.cfg.model_resolution[0]]) / self.stride
            rel_emb = t_posenc(torch.cat([rel_fwd / scale, rel_bwd / scale],
                                         dim=-1))

            x = torch.cat([vis[..., None], confidence[..., None],
                           corr_embs, rel_emb], dim=-1)
            x = x.permute(0, 2, 1, 3).reshape(B * N, T, -1)
            time_emb = self.time_emb
            if T != time_emb.shape[1]:
                time_emb = F.interpolate(time_emb.permute(0, 2, 1), size=T,
                                         mode="linear").permute(0, 2, 1)
            x = x + time_emb
            x = x.view(B, N, T, -1)

            delta = self.updateformer(x)
            coords = coords + delta[..., :2].permute(0, 2, 1, 3)
            vis = vis + delta[..., 2].permute(0, 2, 1)
            confidence = confidence + delta[..., 3].permute(0, 2, 1)

        return (coords * float(self.stride), torch.sigmoid(vis),
                torch.sigmoid(confidence))


def t_predict_tracks(model, cfg, video, queries, iters=6):
    """CoTrackerPredictor._compute_sparse_tracks (queries given, no
    support grid — the reference's call pattern)."""
    B, T, C, H, W = video.shape
    mh, mw = cfg.model_resolution
    video = F.interpolate(video.reshape(B * T, C, H, W), (mh, mw),
                          mode="bilinear", align_corners=True
                          ).reshape(B, T, C, mh, mw)
    queries = queries.clone()
    queries[:, :, 1:] *= queries.new_tensor([(mw - 1) / (W - 1),
                                             (mh - 1) / (H - 1)])
    tracks, vis, conf = model(video, queries, iters=iters)
    visibility = vis * conf
    for i in range(len(queries)):
        qt = queries[i, :tracks.size(2), 0].to(torch.int64)
        ar = torch.arange(0, len(qt))
        tracks[i, qt, ar] = queries[i, :tracks.size(2), 1:]
        visibility[i, qt, ar] = 1.0
    visibility = visibility > 0.6
    tracks *= tracks.new_tensor([(W - 1) / (mw - 1), (H - 1) / (mh - 1)])
    return tracks, visibility


# ===================================================================
# helpers
# ===================================================================
def make_variables(cfg, seed=0):
    """Fabricated torch weights -> (torch model, jax variables)."""
    torch.manual_seed(seed)
    model = TCoTracker3Offline(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables, missing, unexpected = import_cotracker3(sd, cfg)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    return model, variables


# ===================================================================
# primitive parity
# ===================================================================
def test_resize_align_corners_matches_torch():
    x = torch.randn(2, 3, 10, 14)
    want = F.interpolate(x, (24, 30), mode="bilinear", align_corners=True)
    got = resize_align_corners(jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                               (24, 30))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1),
                               want.numpy(), atol=1e-5)


def test_bilinear_sample_matches_grid_sample_border():
    fmap = torch.randn(1, 5, 9, 11)
    # in-range, boundary, and out-of-range coords
    coords = torch.tensor([[1.3, 2.7], [0.0, 0.0], [10.0, 8.0],
                           [-2.5, 4.2], [12.7, -1.0], [10.0, 8.5]])
    grid = coords.view(1, 1, -1, 2) * torch.tensor(
        [2 / (11 - 1), 2 / (9 - 1)]) - 1
    want = F.grid_sample(fmap, grid, align_corners=True,
                         padding_mode="border")[0, :, 0].T
    got = bilinear_sample_border(
        jnp.asarray(fmap[0].permute(1, 2, 0).numpy()),
        jnp.asarray(coords.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_time_emb_interpolation_matches_torch():
    emb = torch.randn(1, 8, 6)
    want = F.interpolate(emb.permute(0, 2, 1), size=2,
                         mode="linear").permute(0, 2, 1)[0]
    got = interp_linear_half_pixel(jnp.asarray(emb[0].numpy()), 2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_posenc_matches_torch():
    x = torch.randn(3, 4)
    # sin at args up to ~2^9*|x|: argument-reduction differences bound atol
    np.testing.assert_allclose(np.asarray(posenc(jnp.asarray(x.numpy()))),
                               t_posenc(x).numpy(), atol=5e-4)


# ===================================================================
# module parity
# ===================================================================
def test_encoder_parity():
    cfg = tiny_config()
    model, variables = make_variables(cfg)
    x = torch.randn(2, 3, 48, 64)
    want = model.fnet(x).detach().numpy()
    got = BasicEncoder(cfg.latent_dim, cfg.stride).apply(
        {"params": variables["fnet"]},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want,
                               atol=2e-4)


def test_updateformer_parity():
    from dreamvla_tpu.extract.cotracker3 import EfficientUpdateFormer

    cfg = tiny_config()
    model, variables = make_variables(cfg)
    x = torch.randn(2, 5, 3, cfg.input_dim)
    want = model.updateformer(x).detach().numpy()
    got = EfficientUpdateFormer(cfg).apply(
        {"params": variables["updateformer"]}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_full_forward_parity():
    cfg = tiny_config()
    model, variables = make_variables(cfg)
    h, w = cfg.model_resolution
    video = torch.rand(1, 2, 3, h, w) * 255.0
    pts = torch.tensor([[5.0, 7.0], [20.0, 30.0], [40.0, 12.0],
                        [33.3, 41.7]])
    queries = torch.cat([torch.zeros(4, 1), pts], dim=-1)[None]
    want_trk, want_vis, want_conf = model(video, queries, iters=3)
    got_trk, got_vis, got_conf = cotracker3_forward(
        variables, jnp.asarray(video.permute(0, 1, 3, 4, 2).numpy()),
        jnp.asarray(queries.numpy()), cfg, iters=3)
    np.testing.assert_allclose(np.asarray(got_trk), want_trk.numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_vis), want_vis.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(),
                               atol=1e-3)


def test_predictor_parity_with_resize_and_threshold():
    cfg = tiny_config()
    model, variables = make_variables(cfg, seed=3)
    video = torch.rand(2, 2, 3, 32, 40) * 255.0  # needs resize to 48x64
    pts = torch.tensor([[4.0, 6.0], [20.0, 15.0], [31.0, 28.0]])
    queries = torch.cat([torch.zeros(3, 1), pts], dim=-1
                        ).expand(2, 3, 3).contiguous()
    want_trk, want_vis = t_predict_tracks(model, cfg, video, queries,
                                          iters=3)
    got_trk, got_vis = predict_tracks(
        variables, jnp.asarray(video.permute(0, 1, 3, 4, 2).numpy()),
        jnp.asarray(queries.numpy()), cfg, iters=3)
    np.testing.assert_allclose(np.asarray(got_trk), want_trk.numpy(),
                               atol=5e-3)
    assert (np.asarray(got_vis) == want_vis.numpy()).all()
    # query-frame correction pinned frame 0 to the query coords
    np.testing.assert_allclose(
        np.asarray(got_trk)[:, 0],
        np.broadcast_to(pts.numpy(), (2, 3, 2)), atol=5e-3)
    assert np.asarray(got_vis)[:, 0].all()


# ===================================================================
# real-layout importer insurance + extractor contract
# ===================================================================
def test_import_real_layout():
    """The importer consumes every key of a real-dims checkpoint and
    produces exactly the param tree the flax model initialises."""
    cfg = CoTracker3Config()
    torch.manual_seed(0)
    model = TCoTracker3Offline(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert "updateformer.virual_tracks" in sd  # released spelling
    variables, missing, unexpected = import_cotracker3(sd, cfg)
    assert not missing and not unexpected

    import jax

    # same module names at any width -> tiny init is a cheap structure oracle
    want = init_cotracker3(tiny_config())
    got_paths = {"/".join(str(k.key) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     variables)[0]}
    want_paths = {"/".join(str(k.key) for k in p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths
    assert variables["time_emb"].shape == (cfg.window_len, cfg.input_dim)
    assert variables["updateformer"]["virtual_tracks"].shape == (
        1, cfg.num_virtual_tracks, 1, cfg.hidden_size)
    assert variables["fnet"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert variables["corr_mlp"]["fc1"]["kernel"].shape == (49 * 49, 384)


def test_grid_track_fn_contract():
    cfg = tiny_config()
    tracker = CoTracker3GridTracker(None, cfg, frame_gap=2, chunk=4,
                                    iters=2)
    frames = (np.random.RandomState(0).rand(7, 48, 48, 3)
              * 255).astype(np.uint8)
    tracks, vis = tracker(frames, grid=4)
    assert tracks.shape == (7, 16, 2) and vis.shape == (7, 16)
    assert (tracks[-2:] == 0).all() and (vis[-2:] == 0).all()
    assert np.abs(tracks[:5]).max() > 0  # produced something

    short = tracker(frames[:2], grid=4)
    assert (short[0] == 0).all() and (short[1] == 0).all()


def test_query_grid_matches_reference():
    pts = get_points_on_a_grid(8, (224, 224))
    assert pts.shape == (784, 2)
    assert pts[0].tolist() == [4.0, 4.0]
    assert pts[1].tolist() == [12.0, 4.0]  # x-major enumeration
    assert pts[-1].tolist() == [220.0, 220.0]
