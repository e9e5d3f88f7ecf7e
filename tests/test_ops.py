"""Tests for posemb / patchify / attention / augment against torch oracles.

torch (CPU) is used strictly as a *test oracle* for operator semantics
(einsum patch order, pixel_unshuffle channel order, grid_sample shifts,
sdpa attention); the framework itself never imports torch in its compute
path.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from dreamvla_tpu.ops.posemb import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)
from dreamvla_tpu.ops.patchify import (
    normalize_patchified,
    patchify,
    pixel_unshuffle_tracks,
    unpatchify,
)
from dreamvla_tpu.ops.attention import mha_reference, multi_head_attention
from dreamvla_tpu.ops.augment import random_shifts_aug


# ---------------------------------------------------------------- posemb
def test_sincos_2d_basics():
    emb = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert emb.shape == (17, 64)
    assert np.allclose(emb[0], 0.0)  # cls slot is zeros
    # position (0,0): sin(0)=0, cos(0)=1 in both halves
    body = emb[1]
    assert np.allclose(body[:16], 0.0) and np.allclose(body[16:32], 1.0)


def test_sincos_1d_scale():
    a = get_1d_sincos_pos_embed(32, 8, scale=1.0)
    b = get_1d_sincos_pos_embed(32, 8, scale=2.0)
    assert a.shape == (8, 32)
    np.testing.assert_allclose(b[2], a[1], atol=1e-12)  # pos/2


# -------------------------------------------------------------- patchify
def torch_patchify(imgs, p):
    h = w = imgs.shape[2] // p
    x = imgs.reshape(imgs.shape[0], 3, h, p, w, p)
    x = torch.einsum("nchpwq->nhwpqc", x)
    return x.reshape(imgs.shape[0], h * w, p**2 * 3)


def test_patchify_matches_torch_order():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    want = torch_patchify(torch.from_numpy(imgs), 16).numpy()
    got = np.asarray(patchify(jnp.asarray(imgs), 16))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patchify_roundtrip():
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    x = patchify(jnp.asarray(imgs), 16)
    back = unpatchify(x, 16, channels=3)
    np.testing.assert_allclose(np.asarray(back), imgs, atol=1e-6)


def test_normalize_patchified_matches_torch_var():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 196, 768)).astype(np.float32)
    t = torch.from_numpy(x)
    want = ((t - t.mean(-1, keepdim=True)) / (t.var(-1, keepdim=True) + 1e-6) ** 0.5).numpy()
    got = np.asarray(normalize_patchified(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pixel_unshuffle_tracks_matches_torch():
    rng = np.random.default_rng(3)
    tracks = rng.normal(size=(2, 5, 28 * 28, 2)).astype(np.float32)
    t = torch.from_numpy(tracks).reshape(2, 5, 28, 28, 2).permute(0, 1, 4, 2, 3)
    t = F.pixel_unshuffle(t, downscale_factor=2)
    want = t.permute(0, 1, 3, 4, 2).reshape(2, 5, 14 * 14, 8).numpy()
    got = np.asarray(pixel_unshuffle_tracks(jnp.asarray(tracks), grid=28, out_grid=14))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ------------------------------------------------------------- attention
def _rand_qkv(rng, b=2, h=4, lq=70, lk=70, d=32):
    q = rng.normal(size=(b, h, lq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, lk, d)).astype(np.float32)
    return q, k, v


def test_mha_reference_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng)
    bias = np.where(rng.random((70, 70)) < 0.3, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0  # ensure no fully-masked row
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        attn_mask=torch.from_numpy(bias),
    ).numpy()
    got = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_flash_matches_reference_interpret():
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, b=1, h=2, lq=130, lk=130, d=64)
    bias = np.where(rng.random((130, 130)) < 0.4, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    want = mha_reference(*args)
    from dreamvla_tpu.ops.attention import _flash_fwd_impl
    got = _flash_fwd_impl(*args, scale=64**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_grad_matches_reference():
    rng = np.random.default_rng(6)
    q, k, v = _rand_qkv(rng, b=1, h=2, lq=16, lk=16, d=8)
    bias = np.zeros((16, 16), np.float32)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, jnp.asarray(bias)) ** 2)

    def loss_disp(q, k, v):
        return jnp.sum(
            multi_head_attention(jnp.asarray(q), k, v, jnp.asarray(bias),
                                 use_pallas=False) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    g_disp = jax.grad(loss_disp, argnums=(0, 1, 2))(*map(jnp.asarray, (q, k, v)))
    for a, b in zip(g_ref, g_disp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# --------------------------------------------------------------- augment
def test_random_shift_is_crop_of_padded():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 3, 16, 16)).astype(np.float32)
    out = np.asarray(random_shifts_aug(jax.random.PRNGKey(0), jnp.asarray(x), pad=4))
    assert out.shape == x.shape
    padded = np.pad(x, ((0, 0), (0, 0), (4, 4), (4, 4)), mode="edge")
    # each output must equal SOME crop of the padded input
    for n in range(3):
        found = any(
            np.allclose(out[n], padded[n, :, sy : sy + 16, sx : sx + 16])
            for sy in range(9)
            for sx in range(9)
        )
        assert found


def test_random_shift_matches_torch_grid_sample_semantics():
    # integer-shift grid_sample == crop: verify against torch for one shift
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    pad = 2
    t = torch.from_numpy(x)
    tp = F.pad(t, (pad,) * 4, "replicate")
    h = 8
    eps = 1.0 / (h + 2 * pad)
    arange = torch.linspace(-1.0 + eps, 1.0 - eps, h + 2 * pad)[:h]
    arange = arange.unsqueeze(0).repeat(h, 1).unsqueeze(2)
    base_grid = torch.cat([arange, arange.transpose(1, 0)], dim=2).unsqueeze(0)
    shift = torch.tensor([[3.0, 1.0]]).view(1, 1, 1, 2) * 2.0 / (h + 2 * pad)
    want = F.grid_sample(tp, base_grid + shift, padding_mode="zeros",
                         align_corners=False).numpy()
    from dreamvla_tpu.ops.augment import _shift_one
    got = np.asarray(_shift_one(jnp.asarray(x[0]), jnp.asarray([3, 1]), pad))
    np.testing.assert_allclose(got, want[0], atol=1e-5)


def test_pallas_multi_tile_query_path():
    """lq > 512 exercises the multi-q-tile grid (and the bias-resident
    ordering) in interpreter mode."""
    rng = np.random.default_rng(9)
    q, k, v = _rand_qkv(rng, b=1, h=2, lq=600, lk=600, d=64)
    bias = np.where(rng.random((600, 600)) < 0.4, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    want = mha_reference(*args)
    from dreamvla_tpu.ops.attention import _flash_fwd_impl
    got = _flash_fwd_impl(*args, scale=64**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_backward_kernel_matches_autodiff():
    """Pallas flash backward (interpret mode) vs autodiff of the reference.

    lq=600 spans TWO query tiles: the dk/dv accumulation across q-tiles is
    the part that once raced on real hardware (fixed by making the q-tile
    grid axis minor; interpret mode cannot reproduce the race, but this
    pins the multi-tile shapes)."""
    from dreamvla_tpu.ops.attention import _flash_bwd_impl

    rng = np.random.default_rng(10)
    q, k, v = _rand_qkv(rng, b=1, h=3, lq=600, lk=600, d=64)
    bias = np.where(rng.random((600, 600)) < 0.3, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0
    g = rng.normal(size=q.shape).astype(np.float32)
    args = tuple(map(jnp.asarray, (q, k, v, bias)))

    def fwd(q, k, v, bias):
        return jnp.sum(mha_reference(q, k, v, bias) * jnp.asarray(g))

    want = jax.grad(fwd, argnums=(0, 1, 2, 3))(*args)
    got = _flash_bwd_impl(*args, jnp.asarray(g), scale=64**-0.5,
                          interpret=True)
    for a, b, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4,
                                   err_msg=name)


def test_structured_attention_matches_dense():
    """The block-structured decomposition (A+obs rows over A cols, action
    rows over everything) must match full dense attention bit-for-bit under
    every mask-flag combination — the rules guarantee A/obs queries never
    see B-part keys (reference generate_attention_mask,
    dreamvla_model.py:25-66)."""
    from dreamvla_tpu.ops.attention import BlockSplit, structured_attention
    from dreamvla_tpu.ops.masks import MaskSpec, build_attention_bias

    rng = np.random.default_rng(3)
    for flags in (
        dict(),
        dict(atten_only_obs=True, attn_robot_proprio_state=True),
        dict(atten_goal=1, atten_goal_state=True),
    ):
        spec = MaskSpec(k=3, num_a=6, num_obs=4, action_pred_steps=2, **flags)
        bias = build_attention_bias(spec)
        L = spec.seq_len
        q, k, v = _rand_qkv(rng, b=2, h=2, lq=L, lk=L, d=16)
        args = tuple(map(jnp.asarray, (q, k, v)))
        want = mha_reference(*args, jnp.asarray(bias))
        split = BlockSplit(k=spec.k, na=spec.num_a, nobs=spec.num_obs,
                           aps=spec.action_pred_steps)
        got = structured_attention(*args, jnp.asarray(bias), split)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=str(flags))


def test_structured_attention_grads_flow():
    """Grad through the structured path matches dense-attention autodiff."""
    from dreamvla_tpu.ops.attention import BlockSplit, structured_attention
    from dreamvla_tpu.ops.masks import MaskSpec, build_attention_bias

    rng = np.random.default_rng(4)
    spec = MaskSpec(k=2, num_a=4, num_obs=3, action_pred_steps=1)
    bias = jnp.asarray(build_attention_bias(spec))
    L = spec.seq_len
    q, k, v = _rand_qkv(rng, b=1, h=2, lq=L, lk=L, d=8)
    split = BlockSplit(k=spec.k, na=spec.num_a, nobs=spec.num_obs,
                       aps=spec.action_pred_steps)
    args = tuple(map(jnp.asarray, (q, k, v)))

    def f_dense(q, k, v):
        return jnp.sum(mha_reference(q, k, v, bias) ** 2)

    def f_struct(q, k, v):
        return jnp.sum(structured_attention(q, k, v, bias, split,
                                            use_pallas=False) ** 2)

    want = jax.grad(f_dense, argnums=(0, 1, 2))(*args)
    got = jax.grad(f_struct, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=name)


def test_flash_kernels_grouped_bh_path():
    """b*h divisible by 4 exercises the grouped (G>1) program path in both
    kernels (interpret mode)."""
    from dreamvla_tpu.ops.attention import _flash_bwd_impl, _flash_fwd_impl

    rng = np.random.default_rng(11)
    q, k, v = _rand_qkv(rng, b=2, h=4, lq=300, lk=300, d=64)
    bias = np.where(rng.random((300, 300)) < 0.3, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0
    args = tuple(map(jnp.asarray, (q, k, v, bias)))
    want = mha_reference(*args)
    got = _flash_fwd_impl(*args, scale=64**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    g = rng.normal(size=q.shape).astype(np.float32)

    def fwd(q, k, v, bias):
        return jnp.sum(mha_reference(q, k, v, bias) * jnp.asarray(g))

    want_g = jax.grad(fwd, argnums=(0, 1, 2, 3))(*args)
    got_g = _flash_bwd_impl(*args, jnp.asarray(g), scale=64**-0.5,
                            interpret=True)
    for a, b_, name in zip(got_g, want_g, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4,
                                   err_msg=name)


def test_attention_nbg_grads_match_and_skip_dbias():
    """The default bias_grad=False path: dq/dk/dv match autodiff of the
    reference; no dbias is computed (interpret mode)."""
    from dreamvla_tpu.ops.attention import _flash_bwd_impl

    rng = np.random.default_rng(12)
    q, k, v = _rand_qkv(rng, b=1, h=2, lq=300, lk=300, d=64)
    bias = np.where(rng.random((300, 300)) < 0.3, -1e9, 0.0).astype(np.float32)
    bias[:, 0] = 0.0
    g = rng.normal(size=q.shape).astype(np.float32)
    args = tuple(map(jnp.asarray, (q, k, v, bias)))

    def fwd(q, k, v, bias):
        return jnp.sum(mha_reference(q, k, v, bias) * jnp.asarray(g))

    want = jax.grad(fwd, argnums=(0, 1, 2))(*args)
    got = _flash_bwd_impl(*args, jnp.asarray(g), scale=64**-0.5,
                          interpret=True, want_dbias=False)
    assert got[3] is None
    for a, b, name in zip(got[:3], want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=name)
