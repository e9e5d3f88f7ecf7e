"""int8 (W8A8) fused ViT encoder blocks: quantization roundtrip and an
interpret-mode error bound vs the f32 fused path. End-action drift of the
full int8 serving mode is measured on-chip by
tools/fused_action_parity.py --int8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from dreamvla_tpu.models.layers import ViTBlock
from dreamvla_tpu.ops.quant import is_quantized
from dreamvla_tpu.ops.vit_fused import (fused_vit_layers,
                                        fused_vit_layers_int8,
                                        quantize_vit_block)

D, H, L, N, DEPTH = 128, 2, 13, 4, 2


class _Stack(nn.Module):
    dt: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(DEPTH):
            x = ViTBlock(H, dtype=self.dt, use_pallas=False,
                         name=f"blocks_{i}")(x)
        return x


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, L, D)) * 0.3, jnp.float32)
    m = _Stack()
    v = m.init(jax.random.PRNGKey(0), x)
    bp = [v["params"][f"blocks_{i}"] for i in range(DEPTH)]
    bq = [quantize_vit_block(p) for p in bp]
    return x, bp, bq


def test_quantize_roundtrip(stack):
    _, bp, bq = stack
    wq, s = bq[0]["attn"]["qkv"]["kernel"]
    assert is_quantized((wq, s))
    w = np.asarray(bp[0]["attn"]["qkv"]["kernel"], np.float32)
    deq = np.asarray(wq, np.float32) * np.asarray(s)
    assert np.all(np.abs(deq - w) <= np.asarray(s) / 2 + 1e-8)
    # LN leaves pass through untouched
    np.testing.assert_array_equal(np.asarray(bq[0]["norm1"]["scale"]),
                                  np.asarray(bp[0]["norm1"]["scale"]))


def test_int8_quant_error_bounded_vs_f32(stack):
    x, bp, bq = stack
    with jax.default_matmul_precision("highest"):
        f32 = fused_vit_layers(x, bp, H, interpret=True)
        i8 = fused_vit_layers_int8(x, bq, H, interpret=True)
    scale = float(jnp.max(jnp.abs(f32)))
    err = float(jnp.max(jnp.abs(i8 - f32)))
    assert 0 < err < 0.05 * scale, (err, scale)
