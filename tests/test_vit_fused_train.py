"""Fused ViT TRAIN kernels (ops/vit_fused_train): interpret-mode parity.

Checks, all off-TPU (interpret=True):
  * forward and full gradient parity (dx + every weight grad) vs the
    unfused ViTBlock chain — the fused backward recomputes the whole block
    in VMEM, so this covers LN/attention/MLP backward math incl. the
    rational-erf gelu gradient;
  * the same at L=520 (engages the L-TILED MLP backward grid) and at an
    UNALIGNED L (pad rows must receive/contribute zero cotangents);
  * module wiring: a ModalityDecoder apply routes through the train
    kernels and yields nonzero grads for every block parameter.

Behaviour anchor: the reference decoders run timm Blocks in .train() mode
with no dropout (dreamvla_model.py:793-911); numerics follow
models/layers.py::ViTBlock.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.models.layers import ViTBlock
from dreamvla_tpu.ops.gpt2_fused_train import _mlp_tiles
from dreamvla_tpu.ops.vit_fused_train import fused_vit_train_layers

D, H, N = 128, 2, 3


def _setup(l, depth=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, l, D)) * 0.3, jnp.float32)
    blk = ViTBlock(H, ln_eps=1e-5, use_pallas=False)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    blocks = tuple(jax.tree.map(lambda a: a + 0.01 * i, params)
                   for i in range(depth))
    w = jnp.asarray(rng.normal(size=(N, l, D)), jnp.float32)
    return x, blk, blocks, w


def _losses(blk, w):
    def unfused(x, blocks):
        h = x
        for p_ in blocks:
            h = blk.apply({"params": p_}, h)
        return jnp.sum(h * w)

    def fused(x, blocks):
        y = fused_vit_train_layers(x, blocks, H, 1e-5, True)
        return jnp.sum(y * w)
    return unfused, fused


def _assert_grads_match(l, depth=2, seed=0):
    x, blk, blocks, w = _setup(l, depth, seed)
    unfused, fused = _losses(blk, w)
    with jax.default_matmul_precision("highest"):
        gu = jax.grad(unfused, argnums=(0, 1))(x, blocks)
        gf = jax.grad(fused, argnums=(0, 1))(x, blocks)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(gu))
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale, rtol=0)


def test_p0_forward_and_grads_match_unfused():
    x, blk, blocks, w = _setup(l=24)
    unfused, fused = _losses(blk, w)
    with jax.default_matmul_precision("highest"):
        yu = unfused(x, blocks)
        yf = fused(x, blocks)
        np.testing.assert_allclose(float(yf), float(yu), rtol=1e-5)
    _assert_grads_match(l=24)


def test_grads_match_tiled_mlp_bwd():
    assert _mlp_tiles(520)[0] > 1
    _assert_grads_match(l=520, depth=1, seed=1)


def test_grads_match_unaligned_length():
    # L=21 -> lp=24: three padded rows; forward must slice them away and
    # backward must not leak gradient through them
    _assert_grads_match(l=21, seed=2)


def test_decoder_module_routes_through_train_kernels(monkeypatch):
    import dreamvla_tpu.ops.attention as att
    import dreamvla_tpu.ops.vit_fused_train as ft
    from dreamvla_tpu.models.decoders import ModalityDecoder

    monkeypatch.setattr(att, "is_tpu_backend", lambda: True)
    orig = ft.fused_vit_train_layers
    calls = []

    def spy(x_, blocks, nh, eps=1e-5, interpret=False):
        calls.append(eps)
        return orig(x_, blocks, nh, eps, True)

    monkeypatch.setattr(ft, "fused_vit_train_layers", spy)
    rng = np.random.default_rng(3)
    dec = ModalityDecoder(num_query_tokens=4, num_mask_tokens=4, out_dim=12,
                          hidden_dim=D, num_heads=H, use_pallas=False)
    q = jnp.asarray(rng.normal(size=(N, 4, D)), jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), q)

    def loss(params):
        return jnp.sum(jnp.square(dec.apply({"params": params}, q)))

    g = jax.grad(loss)(v["params"])
    assert calls == [1e-5]
    for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]:
        assert bool(jnp.any(leaf != 0.0)), jax.tree_util.keystr(path)


def test_decoder_fused_false_keeps_block_loop(monkeypatch):
    import dreamvla_tpu.ops.attention as att
    import dreamvla_tpu.ops.vit_fused_train as ft
    from dreamvla_tpu.models.decoders import ModalityDecoder

    monkeypatch.setattr(att, "is_tpu_backend", lambda: True)
    monkeypatch.setattr(ft, "fused_vit_train_layers",
                        lambda *a, **k: pytest.fail("fused path engaged"))
    dec = ModalityDecoder(num_query_tokens=4, num_mask_tokens=4, out_dim=12,
                          hidden_dim=D, num_heads=H, use_pallas=False,
                          fused=False)
    q = jnp.zeros((N, 4, D), jnp.float32)
    v = dec.init(jax.random.PRNGKey(0), q)
    dec.apply({"params": v["params"]}, q)
