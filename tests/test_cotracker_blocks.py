"""Point-tracking building blocks: sampling, correlation, encoder shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from dreamvla_tpu.extract.cotracker_blocks import (BasicEncoder,
                                                   bilinear_sample,
                                                   corr_pyramid_features,
                                                   corr_window,
                                                   feature_pyramid)


def test_bilinear_sample_exact_and_interp():
    fmap = jnp.arange(12.0).reshape(3, 4, 1)
    # exact grid points
    out = bilinear_sample(fmap, jnp.asarray([[1.0, 2.0], [3.0, 0.0]]))
    # boundary coords are clamped by 1e-3 for safety -> ~4e-3 value offset
    np.testing.assert_allclose(np.asarray(out)[:, 0], [9.0, 3.0], atol=5e-3)
    # midpoint interpolates
    mid = bilinear_sample(fmap, jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(float(mid[0, 0]), (0 + 1 + 4 + 5) / 4)


def test_corr_window_localises_matching_feature():
    rng = np.random.default_rng(0)
    fmap = rng.normal(size=(16, 16, 8)).astype(np.float32)
    q = fmap[5, 7]  # query feature = the map at (x=7, y=5)
    corr = corr_window(jnp.asarray(q[None]), jnp.asarray(fmap),
                       jnp.asarray([[7.0, 5.0]]), radius=2)
    corr = np.asarray(corr).reshape(5, 5)
    assert corr.argmax() == 12  # center of the window
    np.testing.assert_allclose(corr[2, 2], (q @ q) / np.sqrt(8), rtol=1e-5)


def test_feature_pyramid_and_multilevel_corr():
    rng = np.random.default_rng(1)
    fmap = rng.normal(size=(16, 16, 4)).astype(np.float32)
    pyr = feature_pyramid(jnp.asarray(fmap), levels=3)
    assert [p.shape[:2] for p in pyr] == [(16, 16), (8, 8), (4, 4)]
    np.testing.assert_allclose(
        np.asarray(pyr[1][0, 0]), fmap[:2, :2].mean(axis=(0, 1)), rtol=1e-5)
    q = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    coords = jnp.asarray([[4.0, 4.0], [8.0, 2.0], [1.0, 1.0]])
    feats = corr_pyramid_features(q, pyr, coords, radius=3)
    assert feats.shape == (3, 3 * 49)
    assert np.isfinite(np.asarray(feats)).all()


def test_basic_encoder_stride4():
    enc = BasicEncoder(latent_dim=32)
    imgs = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 3, 64, 64)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), imgs)["params"]
    out = enc.apply({"params": params}, imgs)
    assert out.shape == (2, 16, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
