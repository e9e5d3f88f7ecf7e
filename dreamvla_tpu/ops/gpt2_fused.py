"""Fused GPT-2 trunk block: one Pallas kernel per layer, inference path.

The 24L/1024 trunk dominates the flagship policy step (reference
`models/gpt2.py:267-274` is the eager matmul-softmax attention this
replaces). Its dense matmuls already run ~91% MFU under XLA, but the
unfused layer still pays separate HBM round-trips for LN stats, the
qkv/heads relayouts, the attention kernel's operand re-pads, and the
residual/gelu elementwise passes. This kernel runs the WHOLE pre-LN block
— LN1, fused-QKV, role-split attention (see below), output projection,
residual, LN2, MLP (gelu_new/tanh), residual — in VMEM, one batch element
per program, with every weight block resident across the grid.

Role-split attention: inputs arrive TOKEN-REORDERED ([A | dream-query |
action], ops.attention.token_permutation), so the DreamVLA mask rules
(reference dreamvla_model.py:25-66) decompose exactly into
  * rows [0, nQ): attend keys [0, nA) under biasA;
  * rows [nQ, L): attend all keys under biasB
like `ops.attention.reordered_attention` — but both parts run inside the
same kernel on the already-resident qkv, per head over 64-lane column
slices (Mosaic rejects the (L,3D)->(3,H,L,hd) relayout reshape; lane
slicing compiles, see ops/vit_fused.py).

INFERENCE ONLY: no backward kernel. The caller gates on deterministic
applies (policy/eval paths); differentiating through this op raises at
trace time — the trunk is trainable, so tangents are NOT silently cut.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from dreamvla_tpu.ops.attention import _COMPILER_PARAMS, _round_up

_SUBLANE = 8
_LANE = 128


def _ln(x32, scale, bias, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu_tanh(x):
    # HF gelu_new: 0.5x(1+tanh(sqrt(2/pi)(x+0.044715x^3)))
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _block_kernel(x_ref, biasa_ref, biasb_ref, ln1s_ref, ln1b_ref, wqkv_ref,
                  bqkv_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                  b1_ref, w2_ref, b2_ref, o_ref, *, num_heads: int, nq: int,
                  rb0: int, lp: int, eps: float):
    _, _, d = x_ref.shape
    hd = d // num_heads
    na_pad = biasa_ref.shape[-1]
    x = x_ref[0]                                   # (Lp, D) compute dtype
    cdt = x.dtype
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps).astype(cdt)
    qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)  # (Lp, 3D)
    biasa = biasa_ref[:]                           # (Lp, nA_pad) f32
    biasb = biasb_ref[:, :lp]                      # (rBn, Lp) f32
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), 0) < nq
    scale = hd ** -0.5
    heads = []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        # part A: every row vs the first nA_pad keys (A-token keys; pad and
        # query-key columns carry -1e9 in biasa) — only rows < nq are kept
        s = jax.lax.dot_general(q, k[:na_pad], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + biasa
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oa = jax.lax.dot_general(p.astype(cdt), v[:na_pad],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # part B: the action rows (aligned tile [rb0, Lp)) vs ALL keys
        sb = jax.lax.dot_general(q[rb0:], k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = sb * scale + biasb
        mb = jnp.max(sb, axis=-1, keepdims=True)
        pb = jnp.exp(sb - mb)
        pb = pb / jnp.sum(pb, axis=-1, keepdims=True)
        ob = jax.lax.dot_general(pb.astype(cdt), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob_full = jnp.concatenate(
            [jnp.zeros((rb0, hd), jnp.float32), ob], axis=0)
        heads.append(jnp.where(rowsel, oa, ob_full).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)            # (Lp, D)
    o = jax.lax.dot_general(o, wproj_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = x + (o + bproj_ref[0].astype(jnp.float32)).astype(cdt)
    h = _ln(x.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps).astype(cdt)
    h = jax.lax.dot_general(h, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_tanh(h + b1_ref[0].astype(jnp.float32))
    h = jax.lax.dot_general(h.astype(cdt), w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b2_ref[0].astype(jnp.float32)
    o_ref[0] = x + h.astype(cdt)


def build_role_biases(bias: jnp.ndarray, n_a: int, n_q: int,
                      lp: int) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pre-pad the reordered (L, L) additive mask into the two kernel bias
    operands. Returns (biasA (Lp, nA_pad), biasB (rBn, Lkp), rb0)."""
    l = bias.shape[0]
    na_pad = _round_up(n_a, _LANE)
    biasa = jnp.pad(bias[:, :n_a].astype(jnp.float32),
                    ((0, lp - l), (0, na_pad - n_a)),
                    constant_values=0.0)
    # pad/query key columns [n_a, na_pad) invisible to every row
    col = jax.lax.broadcasted_iota(jnp.int32, (1, na_pad), 1)
    biasa = jnp.where(col >= n_a, -1.0e9, biasa)
    rb0 = (n_q // _SUBLANE) * _SUBLANE
    lkp = _round_up(lp, _LANE)
    rbn = lp - rb0
    # rows rb0..n_q (query rows recomputed in part B then discarded) get 0;
    # real action rows get their bias rows; key columns beyond L are padding
    biasb = jnp.zeros((rbn, lkp), jnp.float32)
    biasb = biasb.at[n_q - rb0:l - rb0, :l].set(
        bias[n_q:].astype(jnp.float32))
    colb = jax.lax.broadcasted_iota(jnp.int32, (1, lkp), 1)
    biasb = jnp.where(colb >= l, -1.0e9, biasb)
    return biasa, biasb, rb0


def fused_gpt2_layers(x: jnp.ndarray, layer_params: Sequence[Dict[str, Any]],
                      bias: jnp.ndarray, n_a: int, n_q: int, num_heads: int,
                      eps: float = 1e-5, interpret: bool = False
                      ) -> jnp.ndarray:
    """Apply a stack of GPT-2 blocks with one fused kernel per layer.

    x: (B, L, D) token-reordered activations; bias: reordered (L, L)
    additive mask; n_a/n_q: A-key and query-row counts (K*na, K*(na+nobs)).
    layer_params: Flax GPT2Block trees ({ln_1, attn:{c_attn,c_proj}, ln_2,
    mlp_c_fc, mlp_c_proj}).
    """
    b, l, d = x.shape
    cdt = x.dtype
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    biasa, biasb, rb0 = build_role_biases(bias, n_a, n_q, lp)
    grid = (b,)

    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    kernel = functools.partial(_block_kernel, num_heads=num_heads, nq=n_q,
                               rb0=rb0, lp=lp, eps=eps)
    for p in layer_params:
        ops = _bf16_layer_ops(p, cdt)
        xp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
                      wspec(biasa.shape), wspec(biasb.shape)]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, biasa, biasb, *ops)
    return xp[:, :l]


def stack_trunk_params(params: Dict[str, Any],
                       scope: str = "transformer_backbone",
                       num_layers: int = None) -> Dict[str, Any]:
    """Host-side, one-time SERVING transform: stack the per-layer trunk
    block trees (h_0..h_{L-1}) into one 'h_stacked' tree whose leaves have
    a leading layer axis, removing the per-layer subtrees.

    The fused serving apply then runs ONE Pallas block kernel inside a
    `lax.scan` over the layer axis instead of L unrolled kernel instances
    — bit-identical math, but the compiled executable shrinks ~L-fold
    (the flagship 24-layer serving program embeds 24 copies of the same
    Mosaic binary when unrolled), which matters wherever compiles are
    expensive (this environment's tunnel: 70 MB bs-1 executable, up to
    817 s to build at the tunnel's slow state).

    Works on bf16/f32 trees AND on `quantize_trunk_params` output (the
    (int8, scale) kernel tuples stack per component). Serving-only, like
    quantization: training/unfused applies need the per-layer tree.
    """
    params = dict(params)
    trunk = dict(params[scope])
    names = sorted((n for n in trunk
                    if n.startswith("h_") and n[2:].isdigit()),
                   key=lambda n: int(n[2:]))
    if num_layers is not None:
        names = names[:num_layers]
    blocks = [trunk.pop(n) for n in names]
    trunk["h_stacked"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params[scope] = trunk
    return params


def _bf16_layer_ops(p: Dict[str, Any], cdt) -> list:
    """The fused kernel's 12 weight operands for one layer (order matches
    _block_kernel's signature)."""
    row = lambda a: jnp.asarray(a, cdt).reshape(1, -1)  # noqa: E731
    mat = lambda a: jnp.asarray(a, cdt)                 # noqa: E731
    return [
        row(p["ln_1"]["scale"]), row(p["ln_1"]["bias"]),
        mat(p["attn"]["c_attn"]["kernel"]),
        row(p["attn"]["c_attn"]["bias"]),
        mat(p["attn"]["c_proj"]["kernel"]),
        row(p["attn"]["c_proj"]["bias"]),
        row(p["ln_2"]["scale"]), row(p["ln_2"]["bias"]),
        mat(p["mlp_c_fc"]["kernel"]), row(p["mlp_c_fc"]["bias"]),
        mat(p["mlp_c_proj"]["kernel"]), row(p["mlp_c_proj"]["bias"]),
    ]


def _int8_layer_ops(p: Dict[str, Any], cdt) -> list:
    """The int8 kernel's 16 operands for one layer (order matches
    _block_kernel_int8's signature)."""
    row = lambda a: jnp.asarray(a, cdt).reshape(1, -1)  # noqa: E731
    srow = lambda a: jnp.asarray(a, jnp.float32).reshape(1, -1)  # noqa: E731
    wqkv, sqkv = p["attn"]["c_attn"]["kernel"]
    wproj, sproj = p["attn"]["c_proj"]["kernel"]
    w1, s1 = p["mlp_c_fc"]["kernel"]
    w2, s2 = p["mlp_c_proj"]["kernel"]
    return [
        row(p["ln_1"]["scale"]), row(p["ln_1"]["bias"]),
        wqkv, srow(sqkv), row(p["attn"]["c_attn"]["bias"]),
        wproj, srow(sproj), row(p["attn"]["c_proj"]["bias"]),
        row(p["ln_2"]["scale"]), row(p["ln_2"]["bias"]),
        w1, srow(s1), row(p["mlp_c_fc"]["bias"]),
        w2, srow(s2), row(p["mlp_c_proj"]["bias"]),
    ]


def fused_gpt2_layers_scanned(x: jnp.ndarray, stacked: Dict[str, Any],
                              bias: jnp.ndarray, n_a: int, n_q: int,
                              num_heads: int, eps: float = 1e-5,
                              interpret: bool = False,
                              unroll: int = 1) -> jnp.ndarray:
    """fused_gpt2_layers(_int8) over a `stack_trunk_params` tree: one
    pallas_call traced once, `lax.scan` over the layer axis. Identical op
    order per layer => bit-equal outputs (tests/test_gpt2_fused.py).

    unroll: lax.scan unroll factor — a compile-size/throughput middle
    ground between the fully scanned (1) and fully unrolled (L) applies;
    bit-equal for any value (scan unrolling changes scheduling only)."""
    b, l, d = x.shape
    cdt = x.dtype
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    biasa, biasb, rb0 = build_role_biases(bias, n_a, n_q, lp)
    grid = (b,)
    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    quantized = isinstance(stacked["attn"]["c_attn"]["kernel"],
                           (tuple, list))
    if quantized:
        kernel = functools.partial(_block_kernel_int8, num_heads=num_heads,
                                   nq=n_q, rb0=rb0, lp=lp, eps=eps)
        ops_fn = _int8_layer_ops
    else:
        kernel = functools.partial(_block_kernel, num_heads=num_heads,
                                   nq=n_q, rb0=rb0, lp=lp, eps=eps)
        ops_fn = _bf16_layer_ops

    def body(carry, layer):
        ops = ops_fn(layer, cdt)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
                      wspec(biasa.shape), wspec(biasb.shape)]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(carry, biasa, biasb, *ops)
        return out, None

    xp, _ = jax.lax.scan(body, xp, stacked, unroll=unroll)
    return xp[:, :l]


def supports_fused_trunk(l: int, d: int, num_heads: int, n_a: int,
                         n_q: int) -> bool:
    """Shape gate: lane-aligned model dim, 8-aligned head dim, an A-block
    boundary on a sublane edge, a real query/action split, and enough
    sequence for the lane-padded A-key slice (k[:round_up(nA,128)])."""
    return (d % _LANE == 0 and (d // num_heads) % _SUBLANE == 0
            and n_a % _SUBLANE == 0 and 0 < n_q < l
            and _round_up(n_a, _LANE) <= _round_up(l, _SUBLANE))


# --------------------------------------------------------------------------
# int8 (W8A8) variant: same block fusion, dense matmuls on the MXU's int8
# path (2x bf16 peak on v5e) with half the weight HBM/VMEM traffic.
# Weights are per-output-channel symmetric int8 (offline, quantize_gpt2_block
# below); activations are quantized per row on the fly inside the kernel.
# Attention itself (scores/AV, <10% of block FLOPs) stays in bf16/f32.
# Opt-in via cfg.int8_trunk_inference; accuracy is bounded empirically by
# tools/fused_action_parity.py --int8 (end-action drift on the real chip).
# --------------------------------------------------------------------------


from dreamvla_tpu.ops.quant import qdot as _qdot  # noqa: E402  (in-kernel safe)
from dreamvla_tpu.ops.quant import quantize_dense as _quantize_dense  # noqa: E402


def _block_kernel_int8(x_ref, biasa_ref, biasb_ref, ln1s_ref, ln1b_ref,
                       wqkv_ref, sqkv_ref, bqkv_ref, wproj_ref, sproj_ref,
                       bproj_ref, ln2s_ref, ln2b_ref, w1_ref, s1_ref, b1_ref,
                       w2_ref, s2_ref, b2_ref, o_ref, *, num_heads: int,
                       nq: int, rb0: int, lp: int, eps: float):
    _, _, d = x_ref.shape
    hd = d // num_heads
    na_pad = biasa_ref.shape[-1]
    x = x_ref[0]                                   # (Lp, D) compute dtype
    cdt = x.dtype
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps)
    qkv = _qdot(xn, wqkv_ref[:], sqkv_ref[0])
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)  # (Lp, 3D)
    biasa = biasa_ref[:]
    biasb = biasb_ref[:, :lp]
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), 0) < nq
    scale = hd ** -0.5
    heads = []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        s = jax.lax.dot_general(q, k[:na_pad], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + biasa
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oa = jax.lax.dot_general(p.astype(cdt), v[:na_pad],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(q[rb0:], k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = sb * scale + biasb
        mb = jnp.max(sb, axis=-1, keepdims=True)
        pb = jnp.exp(sb - mb)
        pb = pb / jnp.sum(pb, axis=-1, keepdims=True)
        ob = jax.lax.dot_general(pb.astype(cdt), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob_full = jnp.concatenate(
            [jnp.zeros((rb0, hd), jnp.float32), ob], axis=0)
        heads.append(jnp.where(rowsel, oa, ob_full).astype(jnp.float32))
    o = jnp.concatenate(heads, axis=-1)            # (Lp, D) f32
    o = _qdot(o, wproj_ref[:], sproj_ref[0])
    x = x + (o + bproj_ref[0].astype(jnp.float32)).astype(cdt)
    h = _ln(x.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps)
    h = _qdot(h, w1_ref[:], s1_ref[0])
    h = _gelu_tanh(h + b1_ref[0].astype(jnp.float32))
    h = _qdot(h, w2_ref[:], s2_ref[0])
    h = h + b2_ref[0].astype(jnp.float32)
    o_ref[0] = x + h.astype(cdt)


def quantize_gpt2_block(p: Dict[str, Any]) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 quantization of one GPT2Block tree.

    Returns {name: (w_int8 (K,N), scale_f32 (1,N))} for the four dense
    kernels plus the passthrough LN/bias leaves. Offline/one-time; the
    result is what fused_gpt2_layers_int8 consumes.
    """

    q = _quantize_dense
    return {
        "ln_1": p["ln_1"], "ln_2": p["ln_2"],
        "attn": {
            "c_attn": {"kernel": q(p["attn"]["c_attn"]["kernel"]),
                       "bias": p["attn"]["c_attn"]["bias"]},
            "c_proj": {"kernel": q(p["attn"]["c_proj"]["kernel"]),
                       "bias": p["attn"]["c_proj"]["bias"]},
        },
        "mlp_c_fc": {"kernel": q(p["mlp_c_fc"]["kernel"]),
                     "bias": p["mlp_c_fc"]["bias"]},
        "mlp_c_proj": {"kernel": q(p["mlp_c_proj"]["kernel"]),
                       "bias": p["mlp_c_proj"]["bias"]},
    }


def quantize_trunk_params(params: Dict[str, Any],
                          scope: str = "transformer_backbone"
                          ) -> Dict[str, Any]:
    """Host-side, one-time: replace the trunk's dense kernels in a full
    DreamVLA params tree with (int8, scale) pairs (quantize_gpt2_block).
    The returned tree is what cfg.int8_trunk_inference applies expect;
    every other leaf is shared (no copy)."""
    params = dict(params)
    trunk = dict(params[scope])
    for name in list(trunk):
        if name.startswith("h_"):
            trunk[name] = quantize_gpt2_block(trunk[name])
    params[scope] = trunk
    return params


def fused_gpt2_layers_int8(x: jnp.ndarray,
                           layer_params_q: Sequence[Dict[str, Any]],
                           bias: jnp.ndarray, n_a: int, n_q: int,
                           num_heads: int, eps: float = 1e-5,
                           interpret: bool = False) -> jnp.ndarray:
    """fused_gpt2_layers with pre-quantized int8 weights (quantize_gpt2_block
    trees). Same token-reordered contract; see the int8 section note above."""
    b, l, d = x.shape
    cdt = x.dtype
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    biasa, biasb, rb0 = build_role_biases(bias, n_a, n_q, lp)
    grid = (b,)

    wspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731

    kernel = functools.partial(_block_kernel_int8, num_heads=num_heads,
                               nq=n_q, rb0=rb0, lp=lp, eps=eps)
    for p in layer_params_q:
        ops = _int8_layer_ops(p, cdt)
        xp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
                      wspec(biasa.shape), wspec(biasb.shape)]
            + [wspec(o.shape) for o in ops],
            out_specs=pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, lp, d), cdt),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, biasa, biasb, *ops)
    return xp[:, :l]
