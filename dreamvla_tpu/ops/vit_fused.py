"""Fused ViT encoder block: one Pallas kernel per transformer layer.

The frozen MAE ViT-B encoder (reference `models/vit_mae.py:184-206`) is the
policy step's second-largest component after the trunk, and profiling showed
it HBM-bound, not MXU-bound: the unfused XLA path at the flagship serving
shape (32 frames x 197 tokens x 768) spends ~8 of 16 ms on intermediate HBM
round-trips (f32 LN stats, heads-first transposes, attention score spills,
gelu) while its matmul content alone runs in ~7 ms.

This kernel runs a WHOLE pre-LN block — LN1, fused-QKV projection,
multi-head attention (fp32 softmax), output projection, residual, LN2, MLP
with exact gelu, residual — over a group of frames entirely in VMEM. The
only HBM traffic per layer is the activation stream (once in, once out) and
one weight fetch: weight blocks use constant index maps, so Mosaic keeps
them resident across the frame-group grid instead of re-fetching per
program.

Numerics match the unfused Flax path at bf16 resolution: LN statistics in
fp32 (flax `use_fast_variance` formula), dots in the compute dtype with fp32
accumulation, fp32 softmax, exact (erf) gelu. The encoder is frozen
(stop_gradient at the caller, dreamvla.py:255), so no backward kernel is
needed; differentiating through this op raises at trace time.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from dreamvla_tpu.ops.attention import _COMPILER_PARAMS, _round_up

_SUBLANE = 8


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7) — Mosaic
    has no erf/erfc lowering; at bf16 activation resolution this is exact."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax)
    return s * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _ln(x32, scale, bias, eps):
    """LayerNorm in fp32, flax fast-variance semantics."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, o_ref, *, num_heads: int, l_real: int, eps: float):
    """One frame per program. Heads are handled with an unrolled loop over
    64-lane column slices of the fused qkv activation — Mosaic's reshape
    lowering rejects the (Lp, 3D) -> (3, H, Lp, hd) relayout (5-D reshape
    with a 64-wide minor), while lane slicing at head granularity compiles
    and costs nothing measurable (attention is <10% of block FLOPs here)."""
    _, lp, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[0]                                   # (Lp, D) compute dtype
    cdt = x.dtype
    # ---- LN1 + QKV projection
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps).astype(cdt)
    qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)  # (Lp, 3D)
    # ---- attention, fp32 softmax; padded key rows masked out
    if l_real < lp:
        keymask = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1) >= l_real
        keybias = jnp.where(keymask, -1.0e9, 0.0)
    else:
        keybias = None
    heads = []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        if keybias is not None:
            s = s + keybias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)            # (Lp, D)
    # ---- output projection + residual
    o = jax.lax.dot_general(o, wproj_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = x + (o + bproj_ref[0].astype(jnp.float32)).astype(cdt)
    # ---- LN2 + MLP + residual
    h = _ln(x.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps).astype(cdt)
    h = jax.lax.dot_general(h, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_exact(h + b1_ref[0].astype(jnp.float32))
    h = jax.lax.dot_general(h.astype(cdt), w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b2_ref[0].astype(jnp.float32)
    o_ref[0] = x + h.astype(cdt)


def fused_vit_layers(x: jnp.ndarray, layer_params: Sequence[Dict[str, Any]],
                     num_heads: int, eps: float = 1e-6,
                     interpret: bool = False) -> jnp.ndarray:
    """Apply a stack of pre-LN ViT blocks with one fused kernel per layer.

    x: (N, L, D) in the compute dtype (bf16 on TPU). layer_params: one dict
    per block with the Flax ViTBlock tree ({norm1,attn:{qkv,proj},norm2,
    mlp:{fc1,fc2}}). Weights may be fp32 (param dtype); they are cast to
    x.dtype like `nn.Dense(dtype=...)` does.
    """
    n, l, d = x.shape
    cdt = x.dtype
    # The kernel has no JVP/transpose rule; the encoder is frozen, so cut
    # tangent flow here (callers stop_gradient the output anyway,
    # dreamvla.py:255) instead of erroring under value_and_grad.
    sg = jax.lax.stop_gradient
    x = sg(x)
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    f = 1  # one frame per program (~3 GFLOP each — well past the ~10us
    #        Mosaic program-overhead threshold)
    grid = (n // f,)

    row = lambda a: sg(jnp.asarray(a, cdt)).reshape(1, -1)  # noqa: E731
    mat = lambda a: sg(jnp.asarray(a, cdt))                 # noqa: E731
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    kernel = functools.partial(_block_kernel, num_heads=num_heads,
                               l_real=l, eps=eps)
    for p in layer_params:
        ops = [
            row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
            mat(p["attn"]["qkv"]["kernel"]), row(p["attn"]["qkv"]["bias"]),
            mat(p["attn"]["proj"]["kernel"]), row(p["attn"]["proj"]["bias"]),
            row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
            mat(p["mlp"]["fc1"]["kernel"]), row(p["mlp"]["fc1"]["bias"]),
            mat(p["mlp"]["fc2"]["kernel"]), row(p["mlp"]["fc2"]["bias"]),
        ]
        xp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((f, lp, d), lambda i: (i, 0, 0))]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((f, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, *ops)
    return xp[:, :l]


def supports_fused(n: int, l: int, d: int, num_heads: int) -> bool:
    """Shape gate: lane-aligned model dim, head dim multiple of 8."""
    return d % 128 == 0 and (d // num_heads) % _SUBLANE == 0 and n >= 1


def stack_encoder_params(params: Dict[str, Any],
                         scope: str = "vision_encoder") -> Dict[str, Any]:
    """Host-side, one-time SERVING transform (mirror of
    ops.gpt2_fused.stack_trunk_params): stack the encoder's per-layer
    blocks_i trees into one 'blocks_stacked' tree with a leading layer
    axis, removing the per-layer subtrees. The fused encoder apply then
    scans ONE kernel over the layer axis — bit-equal, ~depth-fold smaller
    executable. Works on bf16/f32 and quantize_encoder_params trees."""
    params = dict(params)
    enc = dict(params[scope])
    names = sorted((nm for nm in enc
                    if nm.startswith("blocks_") and nm[7:].isdigit()),
                   key=lambda nm: int(nm[7:]))
    blocks = [enc.pop(nm) for nm in names]
    enc["blocks_stacked"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params[scope] = enc
    return params


def _vit_bf16_layer_ops(p: Dict[str, Any], cdt, sg) -> list:
    """The fused kernel's 12 weight operands for one block (order matches
    _block_kernel's signature)."""
    row = lambda a: sg(jnp.asarray(a, cdt)).reshape(1, -1)  # noqa: E731
    mat = lambda a: sg(jnp.asarray(a, cdt))                 # noqa: E731
    return [
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        mat(p["attn"]["qkv"]["kernel"]), row(p["attn"]["qkv"]["bias"]),
        mat(p["attn"]["proj"]["kernel"]), row(p["attn"]["proj"]["bias"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        mat(p["mlp"]["fc1"]["kernel"]), row(p["mlp"]["fc1"]["bias"]),
        mat(p["mlp"]["fc2"]["kernel"]), row(p["mlp"]["fc2"]["bias"]),
    ]


def _vit_int8_layer_ops(p: Dict[str, Any], cdt, sg) -> list:
    """The int8 kernel's 16 operands for one block (order matches
    _block_kernel_int8's signature)."""
    row = lambda a: sg(jnp.asarray(a, cdt)).reshape(1, -1)  # noqa: E731
    srow = lambda a: sg(jnp.asarray(a, jnp.float32)).reshape(1, -1)  # noqa: E731
    wqkv, sqkv = p["attn"]["qkv"]["kernel"]
    wproj, sproj = p["attn"]["proj"]["kernel"]
    w1, s1 = p["mlp"]["fc1"]["kernel"]
    w2, s2 = p["mlp"]["fc2"]["kernel"]
    return [
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        sg(wqkv), srow(sqkv), row(p["attn"]["qkv"]["bias"]),
        sg(wproj), srow(sproj), row(p["attn"]["proj"]["bias"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        sg(w1), srow(s1), row(p["mlp"]["fc1"]["bias"]),
        sg(w2), srow(s2), row(p["mlp"]["fc2"]["bias"]),
    ]


def fused_vit_layers_scanned(x: jnp.ndarray, stacked: Dict[str, Any],
                             num_heads: int, eps: float = 1e-6,
                             interpret: bool = False,
                             unroll: int = 1) -> jnp.ndarray:
    """fused_vit_layers(_int8) over a `stack_encoder_params` tree: one
    pallas_call traced once, lax.scan over the layer axis. Bit-equal to
    the unrolled applies (tests/test_vit_fused.py). unroll: scan unroll
    factor (scheduling only — outputs bit-equal for any value)."""
    n, l, d = x.shape
    cdt = x.dtype
    sg = jax.lax.stop_gradient
    x = sg(x)
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    grid = (n,)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    quantized = isinstance(stacked["attn"]["qkv"]["kernel"], (tuple, list))
    if quantized:
        kernel = functools.partial(_block_kernel_int8, num_heads=num_heads,
                                   l_real=l, eps=eps)
        ops_fn = _vit_int8_layer_ops
    else:
        kernel = functools.partial(_block_kernel, num_heads=num_heads,
                                   l_real=l, eps=eps)
        ops_fn = _vit_bf16_layer_ops
    stacked = sg(stacked)

    def body(carry, layer):
        ops = ops_fn(layer, cdt, sg)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0))]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(carry, *ops)
        return out, None

    xp, _ = jax.lax.scan(body, xp, stacked, unroll=unroll)
    return xp[:, :l]


# --------------------------------------------------------------------------
# int8 (W8A8) variant — same scheme as ops/gpt2_fused: per-output-channel
# int8 weights (offline), dynamic per-row activation quant in-kernel
# (ops.quant.qdot), attention left in bf16/f32. Opt-in
# (cfg.int8_encoder_inference); end-action drift is part of
# tools/fused_action_parity.py --int8.
# --------------------------------------------------------------------------

from dreamvla_tpu.ops.quant import qdot as _qdot  # noqa: E402
from dreamvla_tpu.ops.quant import quantize_dense as _quantize_dense  # noqa: E402


def _block_kernel_int8(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref,
                       bqkv_ref, wproj_ref, sproj_ref, bproj_ref, ln2s_ref,
                       ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                       b2_ref, o_ref, *, num_heads: int, l_real: int,
                       eps: float):
    _, lp, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[0]
    cdt = x.dtype
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps)
    qkv = _qdot(xn, wqkv_ref[:], sqkv_ref[0])
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)
    if l_real < lp:
        keymask = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1) >= l_real
        keybias = jnp.where(keymask, -1.0e9, 0.0)
    else:
        keybias = None
    heads = []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        if keybias is not None:
            s = s + keybias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.float32))
    o = jnp.concatenate(heads, axis=-1)
    o = _qdot(o, wproj_ref[:], sproj_ref[0])
    x = x + (o + bproj_ref[0].astype(jnp.float32)).astype(cdt)
    h = _ln(x.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps)
    h = _qdot(h, w1_ref[:], s1_ref[0])
    h = _gelu_exact(h + b1_ref[0].astype(jnp.float32))
    h = _qdot(h, w2_ref[:], s2_ref[0])
    h = h + b2_ref[0].astype(jnp.float32)
    o_ref[0] = x + h.astype(cdt)


def quantize_vit_block(p: Dict[str, Any]) -> Dict[str, Any]:
    """Per-output-channel int8 quantization of one ViTBlock tree (the four
    dense kernels become (int8, scale) pairs; LN/bias leaves pass through)."""
    q = _quantize_dense
    return {
        "norm1": p["norm1"], "norm2": p["norm2"],
        "attn": {
            "qkv": {"kernel": q(p["attn"]["qkv"]["kernel"]),
                    "bias": p["attn"]["qkv"]["bias"]},
            "proj": {"kernel": q(p["attn"]["proj"]["kernel"]),
                     "bias": p["attn"]["proj"]["bias"]},
        },
        "mlp": {
            "fc1": {"kernel": q(p["mlp"]["fc1"]["kernel"]),
                    "bias": p["mlp"]["fc1"]["bias"]},
            "fc2": {"kernel": q(p["mlp"]["fc2"]["kernel"]),
                    "bias": p["mlp"]["fc2"]["bias"]},
        },
    }


def quantize_encoder_params(params: Dict[str, Any],
                            scope: str = "vision_encoder") -> Dict[str, Any]:
    """Host-side, one-time: replace the MAE encoder's block dense kernels in
    a full DreamVLA params tree with (int8, scale) pairs. Decoder/patch-proj
    leaves pass through (the policy path never runs the decoder)."""
    params = dict(params)
    enc = dict(params[scope])
    for name in list(enc):
        if name.startswith("blocks_"):
            enc[name] = quantize_vit_block(enc[name])
    params[scope] = enc
    return params


def fused_vit_layers_int8(x: jnp.ndarray,
                          layer_params_q: Sequence[Dict[str, Any]],
                          num_heads: int, eps: float = 1e-6,
                          interpret: bool = False) -> jnp.ndarray:
    """fused_vit_layers over quantize_vit_block trees (int8 dense matmuls)."""
    n, l, d = x.shape
    cdt = x.dtype
    sg = jax.lax.stop_gradient
    x = sg(x)
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    grid = (n,)

    row = lambda a: sg(jnp.asarray(a, cdt)).reshape(1, -1)  # noqa: E731
    srow = lambda a: sg(jnp.asarray(a, jnp.float32)).reshape(1, -1)  # noqa: E731
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    kernel = functools.partial(_block_kernel_int8, num_heads=num_heads,
                               l_real=l, eps=eps)
    for p in layer_params_q:
        wqkv, sqkv = p["attn"]["qkv"]["kernel"]
        wproj, sproj = p["attn"]["proj"]["kernel"]
        w1, s1 = p["mlp"]["fc1"]["kernel"]
        w2, s2 = p["mlp"]["fc2"]["kernel"]
        ops = [
            row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
            sg(wqkv), srow(sqkv), row(p["attn"]["qkv"]["bias"]),
            sg(wproj), srow(sproj), row(p["attn"]["proj"]["bias"]),
            row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
            sg(w1), srow(s1), row(p["mlp"]["fc1"]["bias"]),
            sg(w2), srow(s2), row(p["mlp"]["fc2"]["bias"]),
        ]
        xp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0))]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, *ops)
    return xp[:, :l]
