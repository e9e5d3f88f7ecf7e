"""int8 (W8A8) fused trunk: interpret-mode plumbing parity vs a pure-JAX
replica of the same quantized math, plus a quantization-error bound vs the
float32 trunk. End-action drift on real weights is measured on-chip by
tools/fused_action_parity.py --int8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamvla_tpu.models.gpt2 import GPT2Trunk
from dreamvla_tpu.ops.attention import BlockSplit
from dreamvla_tpu.ops.gpt2_fused import (fused_gpt2_layers,
                                         fused_gpt2_layers_int8,
                                         quantize_gpt2_block)

K, NA, NOBS, APS = 4, 16, 12, 4
L = K * (NA + NOBS + APS)        # 128
N_A, N_Q = K * NA, K * (NA + NOBS)
D, H, B, DEPTH = 128, 2, 2, 2


def _role_bias(rng):
    bias = np.full((L, L), -1e9, np.float32)
    bias[:N_Q, :N_A] = np.where(rng.random((N_Q, N_A)) < 0.7, 0.0, -1e9)
    bias[N_Q:, :] = np.where(rng.random((L - N_Q, L)) < 0.7, 0.0, -1e9)
    bias[:, 0] = 0.0
    return jnp.asarray(bias)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)) * 0.3, jnp.float32)
    bias = _role_bias(rng)
    split = BlockSplit(K, NA, NOBS, APS)
    trunk = GPT2Trunk(num_layers=DEPTH, num_heads=H, dropout=0.0,
                      use_pallas=False, split=split)
    v = trunk.init(jax.random.PRNGKey(0), x, bias)
    bp = [v["params"][f"h_{i}"] for i in range(DEPTH)]
    bq = [quantize_gpt2_block(p) for p in bp]
    return x, bias, bp, bq


def _qdot_ref(x, wq, s):
    """Reference W8A8 dot: SAME quant/dequant arithmetic as ops.gpt2_fused
    ._qdot (ulp-identical scaling — a 1-ulp difference flips int8 rounding
    decisions and cascades through layers), but the integer matmul itself
    runs as a plain f32 @ (exact: integer values < 2^24)."""
    amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-30)
    xq = jnp.clip(jnp.round(x * (127.0 / amax)), -127.0, 127.0)
    acc = xq @ wq.astype(jnp.float32)
    return acc * (amax * (1.0 / 127.0)) * s.reshape(1, -1)


def _ln_ref(x, p, eps=1e-5):
    from dreamvla_tpu.ops.gpt2_fused import _ln
    return _ln(x, jnp.asarray(p["scale"]), jnp.asarray(p["bias"]), eps)


def _block_ref_int8(x, pq, bias):
    """Pure-JAX replica of _block_kernel_int8 on ONE batch element (L, D):
    full-bias masked attention instead of the role split (equivalence of the
    split is covered by the bf16 fused tests)."""
    hd = D // H
    xn = _ln_ref(x, pq["ln_1"])
    wq, s = pq["attn"]["c_attn"]["kernel"]
    qkv = _qdot_ref(xn, wq, s) + pq["attn"]["c_attn"]["bias"]
    heads = []
    for hh in range(H):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (H + hh) * hd:(H + hh + 1) * hd]
        v_ = qkv[:, (2 * H + hh) * hd:(2 * H + hh + 1) * hd]
        sc = q @ k.T * hd ** -0.5 + bias
        p = jax.nn.softmax(sc, axis=-1)
        heads.append(p @ v_)
    o = jnp.concatenate(heads, -1)
    wq, s = pq["attn"]["c_proj"]["kernel"]
    x = x + _qdot_ref(o, wq, s) + pq["attn"]["c_proj"]["bias"]
    h = _ln_ref(x, pq["ln_2"])
    from dreamvla_tpu.ops.gpt2_fused import _gelu_tanh
    wq, s = pq["mlp_c_fc"]["kernel"]
    h = _gelu_tanh(_qdot_ref(h, wq, s) + pq["mlp_c_fc"]["bias"])
    wq, s = pq["mlp_c_proj"]["kernel"]
    return x + _qdot_ref(h, wq, s) + pq["mlp_c_proj"]["bias"]


def test_quantize_roundtrip(setup):
    _, _, bp, bq = setup
    wq, s = bq[0]["attn"]["c_attn"]["kernel"]
    assert wq.dtype == jnp.int8 and s.dtype == jnp.float32
    w = np.asarray(bp[0]["attn"]["c_attn"]["kernel"], np.float32)
    deq = np.asarray(wq, np.float32) * np.asarray(s)
    # symmetric per-column quant: |err| <= scale/2 elementwise
    assert np.all(np.abs(deq - w) <= np.asarray(s) / 2 + 1e-8)


def test_int8_kernel_matches_reference_math(setup):
    x, bias, _, bq = setup
    with jax.default_matmul_precision("highest"):
        got = fused_gpt2_layers_int8(x, bq, bias, N_A, N_Q, H,
                                     interpret=True)
        ref = jax.vmap(lambda xe: _block_ref_int8(
            _block_ref_int8(xe, bq[0], bias), bq[1], bias))(x)
    # not bit-exact: reduction-order ulps (role-split vs full-bias matmul
    # shapes) occasionally flip one int8 rounding decision; a genuine wiring
    # bug (swapped scale/operand) errors at >=0.1 here
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_int8_quant_error_bounded_vs_f32(setup):
    x, bias, bp, bq = setup
    with jax.default_matmul_precision("highest"):
        f32 = fused_gpt2_layers(x, bp, bias, N_A, N_Q, H, interpret=True)
        i8 = fused_gpt2_layers_int8(x, bq, bias, N_A, N_Q, H,
                                    interpret=True)
    scale = float(jnp.max(jnp.abs(f32)))
    err = float(jnp.max(jnp.abs(i8 - f32)))
    assert err < 0.05 * scale, (err, scale)
