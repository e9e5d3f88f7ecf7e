"""int8 DiT sampling path: the functional mirror must track DiT.__call__
exactly with plain weights (transcription parity), stay close under int8
quantization, and dispatch transparently inside ActionDiffusionHead.sample.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.models.dit import (ActionDiffusionConfig,
                                     ActionDiffusionHead, DiT, build_dit,
                                     densify_zero_init, dit_forward_quant,
                                     dit_forward_quant_cfg,
                                     quantize_dit_params)
from dreamvla_tpu.ops.quant import is_quantized

CFG = ActionDiffusionConfig(dit_type="DiT-S", token_size=64)


@pytest.fixture(scope="module")
def setup():
    dit = build_dit(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 3, 7)), jnp.float32)
    t = jnp.asarray([3.0, 17.0, 55.0, 90.0], jnp.float32)
    z = jnp.asarray(rng.normal(size=(4, 3, 64)), jnp.float32)
    v = dit.init(jax.random.PRNGKey(0), x, t, z)
    params = densify_zero_init(v["params"], jax.random.PRNGKey(1))
    return dit, params, x, t, z


def test_forward_mirror_matches_module(setup):
    dit, params, x, t, z = setup
    with jax.default_matmul_precision("highest"):
        ref = dit.apply({"params": params}, x, t, z)
        got = dit_forward_quant(dit, params, x, t, z)  # plain kernels
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_cfg_mirror_matches_module(setup):
    dit, params, x, t, z = setup
    with jax.default_matmul_precision("highest"):
        ref = dit.apply({"params": params}, x, t, z, 1.5,
                        method=DiT.forward_with_cfg)
        got = dit_forward_quant_cfg(dit, params, x, t, z, 1.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_quantized_forward_error_bounded(setup):
    dit, params, x, t, z = setup
    pq = quantize_dit_params(params)
    assert is_quantized(pq["blocks_0"]["attn"]["qkv"]["kernel"])
    assert is_quantized(pq["z_embedder"]["kernel"])
    assert not is_quantized(pq["final_linear"]["kernel"])  # zero-init head
    with jax.default_matmul_precision("highest"):
        ref = dit.apply({"params": params}, x, t, z)
        got = dit_forward_quant(dit, pq, x, t, z)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05 * max(scale, 1e-3), (err, scale)


@pytest.mark.parametrize("cfg_scale", [1.5, 1.0])
def test_sample_dispatches_quantized(setup, cfg_scale):
    dit, params, _, _, z = setup
    cfg = dataclasses.replace(CFG, cfg_scale=cfg_scale)
    head = ActionDiffusionHead(cfg, dit)
    with jax.default_matmul_precision("highest"):
        ref = head.sample(params, z, jax.random.PRNGKey(7))
        got = head.sample(quantize_dit_params(params), z,
                          jax.random.PRNGKey(7))
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got - ref)))
    # same rng/noise; only quantization error accumulated over DDIM steps
    assert 0 < err < 0.1 * scale, (err, scale)
