"""Fused GPT-2 trunk kernel: interpret-mode parity vs the unfused
role-split trunk (reordered_attention path).

On-device evidence (v5e, B16/L930/D1024/24L bf16): fused 67.7 ms vs
unfused 94.9 ms (1.40x); the fused path sits CLOSER to a float32 oracle
than the unfused bf16 path (0.048 vs 0.056 maxerr at scale 4.6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dreamvla_tpu.models.gpt2 import GPT2Trunk
from dreamvla_tpu.ops.attention import BlockSplit
from dreamvla_tpu.ops.gpt2_fused import (build_role_biases, fused_gpt2_layers,
                                         supports_fused_trunk)

K, NA, NOBS, APS = 4, 16, 12, 4
L = K * (NA + NOBS + APS)        # 128
N_A, N_Q = K * NA, K * (NA + NOBS)
D, H, B, DEPTH = 128, 2, 2, 2


def _role_bias(rng):
    """Random additive mask honouring the role-split visibility rules in
    reordered token order (rows < n_q see only keys < n_a)."""
    bias = np.full((L, L), -1e9, np.float32)
    bias[:N_Q, :N_A] = np.where(rng.random((N_Q, N_A)) < 0.7, 0.0, -1e9)
    bias[N_Q:, :] = np.where(rng.random((L - N_Q, L)) < 0.7, 0.0, -1e9)
    bias[:, 0] = 0.0  # every row sees at least one key
    return jnp.asarray(bias)


@pytest.fixture(scope="module")
def trunk_setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)) * 0.3, jnp.float32)
    bias = _role_bias(rng)
    split = BlockSplit(K, NA, NOBS, APS)
    trunk = GPT2Trunk(num_layers=DEPTH, num_heads=H, dropout=0.0,
                      use_pallas=False, split=split)
    v = trunk.init(jax.random.PRNGKey(0), x, bias)
    bp = [v["params"][f"h_{i}"] for i in range(DEPTH)]
    return x, bias, split, trunk, v, bp


def _lnf(v, x):
    return nn.LayerNorm(epsilon=1e-5, name="ln_f").apply(
        {"params": v["params"]["ln_f"]}, x)


def test_fused_trunk_matches_unfused_f32(trunk_setup):
    x, bias, split, trunk, v, bp = trunk_setup
    with jax.default_matmul_precision("highest"):
        ref = trunk.apply(v, x, bias, True)
        got = _lnf(v, fused_gpt2_layers(x, bp, bias, N_A, N_Q, H,
                                        interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=0)


def test_fused_trunk_matches_unfused_bf16(trunk_setup):
    x, bias, split, trunk, v, bp = trunk_setup
    xb = x.astype(jnp.bfloat16)
    trunkb = GPT2Trunk(num_layers=DEPTH, num_heads=H, dropout=0.0,
                       use_pallas=False, split=split, dtype=jnp.bfloat16)
    ref = trunkb.apply(v, xb, bias, True).astype(jnp.float32)
    got = _lnf(v, fused_gpt2_layers(xb, bp, bias, N_A, N_Q, H,
                                    interpret=True).astype(jnp.float32))
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 0.02 * scale


def test_fused_flag_falls_back_off_tpu(trunk_setup):
    # fused=True through the module on CPU must silently use the
    # differentiable unfused path (bit-identical result)
    x, bias, split, trunk, v, bp = trunk_setup
    ref = trunk.apply(v, x, bias, True)
    out = trunk.apply(v, x, bias, True, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_role_bias_construction():
    rng = np.random.default_rng(1)
    bias = _role_bias(rng)
    lp = L  # already 8-aligned
    biasa, biasb, rb0 = build_role_biases(bias, N_A, N_Q, lp)
    assert biasa.shape == (lp, 128) and biasa.shape[1] % 128 == 0
    # pad/query key columns invisible
    assert float(jnp.max(biasa[:, N_A:])) <= -1e9
    assert rb0 == (N_Q // 8) * 8
    # real action-row bias carried through
    np.testing.assert_array_equal(
        np.asarray(biasb[N_Q - rb0:L - rb0, :L]), np.asarray(bias[N_Q:]))


def test_supports_fused_trunk_gate():
    assert supports_fused_trunk(930, 1024, 16, 360, 900)  # flagship
    assert not supports_fused_trunk(930, 1000, 16, 360, 900)  # dim align
    assert not supports_fused_trunk(930, 1024, 16, 361, 900)  # nA align
    assert not supports_fused_trunk(930, 1024, 16, 360, 930)  # no action rows
    assert not supports_fused_trunk(96, 1024, 16, 48, 90)  # nA pad > L

def test_scanned_trunk_bitexact_vs_unrolled(trunk_setup):
    """stack_trunk_params + the lax.scan fused apply is bit-equal to the
    unrolled fused apply (same kernel, same op order per layer)."""
    from dreamvla_tpu.ops.gpt2_fused import (fused_gpt2_layers_scanned,
                                             stack_trunk_params)

    x, bias, split, trunk, v, bp = trunk_setup
    ref = fused_gpt2_layers(x, bp, bias, N_A, N_Q, H, interpret=True)
    full = stack_trunk_params({"transformer_backbone": dict(v["params"])})
    stacked = full["transformer_backbone"]["h_stacked"]
    assert stacked["attn"]["c_attn"]["kernel"].shape[0] == DEPTH
    assert "h_0" not in full["transformer_backbone"]
    got = fused_gpt2_layers_scanned(x, stacked, bias, N_A, N_Q, H,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # scan unroll factors change scheduling only — still bit-equal
    # (incl. unroll > num_layers)
    for u in (2, 3):
        got_u = fused_gpt2_layers_scanned(x, stacked, bias, N_A, N_Q, H,
                                          interpret=True, unroll=u)
        np.testing.assert_array_equal(np.asarray(got_u), np.asarray(ref))


def test_scanned_trunk_int8_bitexact_vs_unrolled(trunk_setup):
    """Same bit-parity for the int8 (W8A8) variant: quantize then stack."""
    from dreamvla_tpu.ops.gpt2_fused import (fused_gpt2_layers_int8,
                                             fused_gpt2_layers_scanned,
                                             quantize_trunk_params,
                                             stack_trunk_params)

    x, bias, split, trunk, v, bp = trunk_setup
    xb = x.astype(jnp.bfloat16)
    q = quantize_trunk_params({"transformer_backbone": dict(v["params"])})
    bq = [q["transformer_backbone"][f"h_{i}"] for i in range(DEPTH)]
    ref = fused_gpt2_layers_int8(xb, bq, bias, N_A, N_Q, H, interpret=True)
    qs = stack_trunk_params(q)
    got = fused_gpt2_layers_scanned(
        xb, qs["transformer_backbone"]["h_stacked"], bias, N_A, N_Q, H,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stacked_params_unfused_apply_raises(trunk_setup):
    """A stacked tree reaching a non-fused apply fails loudly (mirrors the
    int8 guard) instead of silently re-initialising per-layer params."""
    x, bias, split, trunk, v, bp = trunk_setup
    from dreamvla_tpu.ops.gpt2_fused import stack_trunk_params

    full = stack_trunk_params({"transformer_backbone": dict(v["params"])})
    vs = {"params": full["transformer_backbone"]}
    with pytest.raises(RuntimeError, match="layer-stacked"):
        trunk.apply(vs, x, bias, True)
