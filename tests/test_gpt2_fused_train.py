"""Fused GPT-2 TRAIN kernels (ops/gpt2_fused_train): interpret-mode parity.

Checks, all off-TPU (interpret=True):
  * p=0 forward and full gradient parity (dx + every weight grad) vs the
    unfused role-split GPT2Block chain — the fused backward recomputes the
    whole block in VMEM, so this covers LN/attention/MLP backward math;
  * the same at L=520, which engages the L-TILED MLP backward grid;
  * dropout: deterministic per seed, seed-sensitive, and — the property
    nothing else can check — forward/backward MASK CONSISTENCY via central
    finite differences through the custom_vjp at p>0;
  * the hash mask itself: row-slice consistency (an L-tile reproduces its
    slice of the full mask) and keep-rate calibration;
  * module wiring: a non-deterministic fused trunk apply routes through the
    train kernels and yields nonzero grads for every block parameter.

Reference the behaviour anchors: HF-GPT-2 dropout sites as transcribed in
models/gpt2.py (reference models/gpt2.py trains with p=0.1 in .train()
mode); the attention decomposition matches ops/gpt2_fused.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.models.gpt2 import GPT2Block, GPT2Trunk
from dreamvla_tpu.ops.attention import BlockSplit
from dreamvla_tpu.ops.gpt2_fused_train import (_keep_mask, _mlp_tiles,
                                               fused_gpt2_train_layers)

K, NA, NOBS, APS = 4, 16, 12, 4
L = K * (NA + NOBS + APS)        # 128
N_A, N_Q = K * NA, K * (NA + NOBS)
D, H, B, DEPTH = 128, 2, 2, 2


def _role_bias(rng, l, n_a, n_q):
    bias = np.full((l, l), -1e9, np.float32)
    bias[:n_q, :n_a] = np.where(rng.random((n_q, n_a)) < 0.7, 0.0, -1e9)
    bias[n_q:, :] = np.where(rng.random((l - n_q, l)) < 0.7, 0.0, -1e9)
    bias[:, 0] = 0.0
    return jnp.asarray(bias)


def _setup(l=L, n_a=N_A, n_q=N_Q, k=K, na=NA, nobs=NOBS, aps=APS,
           depth=DEPTH, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, l, D)) * 0.3, jnp.float32)
    bias = _role_bias(rng, l, n_a, n_q)
    split = BlockSplit(k, na, nobs, aps)
    blk = GPT2Block(H, dropout=0.0, use_pallas=False, split=split)
    v = blk.init(jax.random.PRNGKey(0), x, bias)
    params = v["params"]
    blocks = tuple(
        jax.tree.map(lambda a: a + 0.01 * i, params)
        for i in range(depth))
    w = jnp.asarray(rng.normal(size=(B, l, D)), jnp.float32)
    return rng, x, bias, split, blk, blocks, w


def _unfused_loss(blk, bias, w):
    def loss(x, blocks):
        h = x
        for p_ in blocks:
            h = blk.apply({"params": p_}, h, bias, True)
        return jnp.sum(h * w)
    return loss


def _fused_loss(bias, w, n_a, n_q, p):
    def loss(x, blocks):
        y = fused_gpt2_train_layers(x, blocks, bias, jnp.array([3, 7],
                                    jnp.int32), n_a, n_q, H, 1e-5, p, True)
        return jnp.sum(y * w)
    return loss


@pytest.fixture(scope="module")
def small():
    return _setup()


def test_p0_forward_and_grads_match_unfused(small):
    _, x, bias, _, blk, blocks, w = small
    with jax.default_matmul_precision("highest"):
        gu = jax.grad(_unfused_loss(blk, bias, w), argnums=(0, 1))(x, blocks)
        gf = jax.grad(_fused_loss(bias, w, N_A, N_Q, 0.0),
                      argnums=(0, 1))(x, blocks)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(gu))
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale, rtol=0)


def test_p0_grads_match_unfused_tiled_mlp_bwd():
    # L=520 -> _mlp_tiles picks nt=5: the tiled backward grid runs
    k, na, nobs, aps = 4, 40, 85, 5
    l = k * (na + nobs + aps)
    n_a, n_q = k * na, k * (na + nobs)
    assert _mlp_tiles(l)[0] > 1
    _, x, bias, _, blk, blocks, w = _setup(l, n_a, n_q, k, na, nobs, aps,
                                           depth=1, seed=1)
    with jax.default_matmul_precision("highest"):
        gu = jax.grad(_unfused_loss(blk, bias, w), argnums=(0, 1))(x, blocks)
        gf = jax.grad(_fused_loss(bias, w, n_a, n_q, 0.0),
                      argnums=(0, 1))(x, blocks)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(gu))
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale, rtol=0)


def test_dropout_deterministic_seed_sensitive(small):
    _, x, bias, _, _, blocks, _ = small
    run = lambda s, p: fused_gpt2_train_layers(  # noqa: E731
        x, blocks, bias, jnp.array(s, jnp.int32), N_A, N_Q, H, 1e-5, p, True)
    y1, y2 = run([3, 7], 0.3), run([3, 7], 0.3)
    y3, y0 = run([4, 7], 0.3), run([3, 7], 0.0)
    assert bool(jnp.all(y1 == y2))
    assert bool(jnp.any(y1 != y3))
    assert bool(jnp.any(y1 != y0))


def test_dropout_finite_difference_consistency(small):
    # central differences through the custom_vjp at p>0: passes ONLY if the
    # backward kernels regenerate the forward's exact dropout masks
    rng, x, bias, _, _, blocks, w = small
    p = 0.3
    loss = _fused_loss(bias, w, N_A, N_Q, p)
    with jax.default_matmul_precision("highest"):
        gx, gb = jax.grad(loss, argnums=(0, 1))(x, blocks)
        leaves, treedef = jax.tree.flatten(blocks)
        gleaves = jax.tree.leaves(gb)
        eps = 1e-3
        checks = [next(i for i, lv in enumerate(leaves)
                       if lv.shape == shp)
                  for shp in ((D, 3 * D), (D, 4 * D), (4 * D, D), (D,))]
        for idx in checks:
            v = jnp.asarray(rng.normal(size=leaves[idx].shape), jnp.float32)

            def withv(nv, idx=idx):
                l2 = list(leaves)
                l2[idx] = nv
                return jax.tree.unflatten(treedef, l2)

            fd = (loss(x, withv(leaves[idx] + eps * v))
                  - loss(x, withv(leaves[idx] - eps * v))) / (2 * eps)
            an = jnp.sum(gleaves[idx] * v)
            assert abs(float(fd - an)) < 2e-3 * max(abs(float(fd)), 1.0), (
                idx, float(fd), float(an))
        # dx: a gradient-ALIGNED direction (a random one can land nearly
        # orthogonal to gx, making |fd| tiny and the relative check pure
        # f32 finite-diff noise; dx is also exactly autodiff-verified at
        # p=0 above — this only adds the mask-consistency hop)
        v = jnp.sign(gx)
        fd = (loss(x + eps * v, blocks) - loss(x - eps * v, blocks)) / (2 * eps)
        an = jnp.sum(gx * v)
        assert abs(float(fd - an)) < 5e-3 * max(abs(float(fd)), 1.0)


def test_keep_mask_tile_slices_and_rate():
    seed = jnp.uint32(0xDEADBEEF)
    full = _keep_mask((520, 128), 0, seed, 0.1)
    for t, tl in ((0, 104), (3, 104)):
        tile = _keep_mask((tl, 128), t * tl, seed, 0.1)
        assert bool(jnp.all(tile == full[t * tl:(t + 1) * tl]))
    rate = float(jnp.mean(full.astype(jnp.float32)))
    assert abs(rate - 0.9) < 0.01
    # different seeds decorrelate
    other = _keep_mask((520, 128), 0, seed + jnp.uint32(1), 0.1)
    agree = float(jnp.mean((full == other).astype(jnp.float32)))
    assert agree < 0.85  # ~0.82 expected for two independent 0.9-rate masks


def test_trunk_module_routes_training_apply_through_train_kernels(
        small, monkeypatch):
    # force the TPU gate open and interpret the kernels: a train-mode
    # (non-deterministic) fused apply must route through
    # fused_gpt2_train_layers and produce nonzero grads for every leaf
    import dreamvla_tpu.models.gpt2 as gpt2_mod
    import dreamvla_tpu.ops.attention as att
    import dreamvla_tpu.ops.gpt2_fused_train as ft

    _, x, bias, split, _, _, w = small
    monkeypatch.setattr(att, "is_tpu_backend", lambda: True)
    orig = ft.fused_gpt2_train_layers
    calls = []

    def spy(x_, blocks, bias_, seeds, n_a, n_q, nh, eps=1e-5, p=0.1,
            interpret=False):
        calls.append(p)
        return orig(x_, blocks, bias_, seeds, n_a, n_q, nh, eps, p, True)

    monkeypatch.setattr(ft, "fused_gpt2_train_layers", spy)
    trunk = GPT2Trunk(num_layers=DEPTH, num_heads=H, dropout=0.1,
                      use_pallas=False, split=split)
    v = trunk.init(jax.random.PRNGKey(0), x, bias)

    def loss(params):
        y = trunk.apply({"params": params}, x, bias, False, True,
                        rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.sum(y * w)

    g = jax.grad(loss)(v["params"])
    assert calls == [0.1]
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.any(leaf != 0.0))
    gpt2_mod  # silence unused-import lint
