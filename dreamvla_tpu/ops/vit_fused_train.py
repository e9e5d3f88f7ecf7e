"""Fused ViT block TRAINING kernels: whole-block forward plus a two-kernel
backward per layer, under `jax.custom_vjp`.

Target: the per-modality dream decoders (`models/decoders.py`, reference
dreamvla_model.py:793-911) — at the flagship finetune config the three
active decoders (RGB, depth, SAM) run 2 ViT blocks each at
(B*S*views=160, ~265 tokens, 1024) and their fwd+bwd is ~16 TFLOP at bs8,
co-dominant with the trunk in the train step (XLA cost-analysis ledger).
They are TRAINED (unlike the frozen encoder, whose forward-only fusion
lives in ops/vit_fused.py), so the fused forward must carry a backward.

Design mirrors ops/gpt2_fused_train.py (see docs/KERNELS.md):

  * forward kernel — identical math to ops.vit_fused._block_kernel
    (fp32 LN stats, fp32 softmax, exact-erf gelu via the Abramowitz-
    Stegun 7.1.26 rational — Mosaic has no erf lowering) plus a second
    output: the post-attention residual `x_mid`, saved for backward.
  * backward = two kernels per layer, each RECOMPUTING its half of the
    forward in VMEM from the saved layer input:
      - MLP half (grid (N, row-tiles)): LN2 -> fc1 -> gelu -> fc2, then
        dW/db for both denses, d(LN2), dxmid. gelu' = 0.5(1+erf(a/sqrt2))
        + a exp(-a^2/2)/sqrt(2pi), both factors lowerable.
      - attention half (grid (N,)): LN1 -> fused-QKV -> full softmax
        attention (padded key rows masked) -> proj, then dWqkv/dWproj/
        d(LN1)/dx.
    Weight grads accumulate into constant-index f32 blocks; with the
    batch axis major every revisit is by CONSECUTIVE programs (the
    accumulation-safety rule, docs/KERNELS.md).

No dropout: timm/ViT decoder blocks have none (reference decoders run
plain `Block`s), which also keeps the saved residuals to exactly
(x_in, x_mid) per layer.

Gradients: x and every block weight. Padded query rows receive zero
cotangents (their dy rows are zero and every padded-row contribution
cancels through the zeroed softmax columns), so no un-padding fixup is
needed beyond the output slice.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from dreamvla_tpu.ops.attention import _COMPILER_PARAMS, _round_up
from dreamvla_tpu.ops.gpt2_fused_train import (_cdot, _ln_bwd, _ln_stats,
                                               _mlp_tiles)
from dreamvla_tpu.ops.vit_fused import _erf, _gelu_exact, _ln

_SUBLANE = 8
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _gelu_exact_grad(a):
    return (0.5 * (1.0 + _erf(a * (2.0 ** -0.5)))
            + a * jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI)


def _keybias(lp: int, l_real: int):
    if l_real >= lp:
        return None
    keymask = jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1) >= l_real
    return jnp.where(keymask, -1.0e9, 0.0)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _train_fwd_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                      wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref,
                      b1_ref, w2_ref, b2_ref, y_ref, xmid_ref, *,
                      num_heads: int, l_real: int, eps: float):
    _, lp, d = x_ref.shape
    hd = d // num_heads
    x = x_ref[0]
    cdt = x.dtype
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps).astype(cdt)
    qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)
    kb = _keybias(lp, l_real)
    heads = []
    for hh in range(num_heads):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (hd ** -0.5)
        if kb is not None:
            s = s + kb
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)
    po = jax.lax.dot_general(o, wproj_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    xmid = x + (po + bproj_ref[0].astype(jnp.float32)).astype(cdt)
    xmid_ref[0] = xmid
    h = _ln(xmid.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps)
    h = jax.lax.dot_general(h.astype(cdt), w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_exact(h + b1_ref[0].astype(jnp.float32))
    h = jax.lax.dot_general(h.astype(cdt), w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b2_ref[0].astype(jnp.float32)
    y_ref[0] = xmid + h.astype(cdt)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _mlp_bwd_kernel(xmid_ref, dy_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, dxmid_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, dls_ref, dlb_ref, *, eps: float):
    bidx = pl.program_id(0)
    tidx = pl.program_id(1)

    @pl.when((bidx == 0) & (tidx == 0))
    def _init():
        for r in (dw1_ref, db1_ref, dw2_ref, db2_ref, dls_ref, dlb_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    xm = xmid_ref[0]
    cdt = xm.dtype
    s32 = ln2s_ref[0].astype(jnp.float32)
    xhat, rstd = _ln_stats(xm.astype(jnp.float32), eps)
    h0 = xhat * s32 + ln2b_ref[0].astype(jnp.float32)
    a1 = jax.lax.dot_general(h0.astype(cdt), w1_ref[:],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a1 = a1 + b1_ref[0].astype(jnp.float32)
    g = _gelu_exact(a1)
    dm = dy_ref[0].astype(jnp.float32)
    db2_ref[:] += jnp.sum(dm, axis=0, keepdims=True)
    dw2_ref[:] += _cdot(g, dm, ((0,), (0,)), cdt)              # g^T dm
    dg = _cdot(dm, w2_ref[:], ((1,), (1,)), cdt)               # dm W2^T
    da1 = dg * _gelu_exact_grad(a1)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dw1_ref[:] += _cdot(h0, da1, ((0,), (0,)), cdt)            # h0^T da1
    dh0 = _cdot(da1, w1_ref[:], ((1,), (1,)), cdt)             # da1 W1^T
    dx_ln, ds_rows, db_rows = _ln_bwd(dh0, xhat, rstd, s32)
    dls_ref[:] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(db_rows, axis=0, keepdims=True)
    dxmid_ref[0] = dm + dx_ln


def _attn_bwd_kernel(x_ref, dxm_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                     wproj_ref, bproj_ref, dx_ref, dwqkv_ref, dbqkv_ref,
                     dwproj_ref, dbproj_ref, dls_ref, dlb_ref, *,
                     num_heads: int, l_real: int, eps: float):
    _, lp, d = x_ref.shape
    hd = d // num_heads
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        for r in (dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dls_ref,
                  dlb_ref):
            r[:] = jnp.zeros(r.shape, r.dtype)

    x = x_ref[0]
    cdt = x.dtype
    s32 = ln1s_ref[0].astype(jnp.float32)
    xhat, rstd = _ln_stats(x.astype(jnp.float32), eps)
    xn = (xhat * s32 + ln1b_ref[0].astype(jnp.float32)).astype(cdt)
    qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)
    kb = _keybias(lp, l_real)
    scale = hd ** -0.5

    def head_slices(hh):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        return q, k, v

    def softmax(q, k):
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale
        if kb is not None:
            s = s + kb
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        return p / jnp.sum(p, axis=-1, keepdims=True)

    # pass 1: recompute the attention output o
    heads = []
    for hh in range(num_heads):
        q, k, v = head_slices(hh)
        p = softmax(q, k)
        heads.append(jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)                        # (lp, d) cdt

    dxm = dxm_ref[0].astype(jnp.float32)
    dbproj_ref[:] += jnp.sum(dxm, axis=0, keepdims=True)
    dwproj_ref[:] += _cdot(o, dxm, ((0,), (0,)), cdt)          # o^T dxm
    do = _cdot(dxm, wproj_ref[:], ((1,), (1,)), cdt)           # (lp, d) f32

    # pass 2: per-head attention backward (recompute the softmax)
    dqs, dks, dvs = [], [], []
    for hh in range(num_heads):
        q, k, v = head_slices(hh)
        p = softmax(q, k)
        doh = do[:, hh * hd:(hh + 1) * hd]
        dv = _cdot(p, doh, ((0,), (0,)), cdt)                  # (lp, hd)
        dp = _cdot(doh, v, ((1,), (1,)), cdt)                  # (lp, lp)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dqs.append(_cdot(ds, k, ((1,), (0,)), cdt) * scale)
        dks.append(_cdot(ds, q, ((0,), (0,)), cdt) * scale)
        dvs.append(dv)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)           # (lp, 3d) f32
    dbqkv_ref[:] += jnp.sum(dqkv, axis=0, keepdims=True)
    dwqkv_ref[:] += _cdot(xn, dqkv, ((0,), (0,)), cdt)         # xn^T dqkv
    dxn = _cdot(dqkv, wqkv_ref[:], ((1,), (1,)), cdt)          # (lp, d) f32
    dx_ln, ds_rows, db_rows = _ln_bwd(dxn, xhat, rstd, s32)
    dls_ref[:] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(db_rows, axis=0, keepdims=True)
    dx_ref[0] = dxm + dx_ln


# --------------------------------------------------------------------------
# custom_vjp plumbing
# --------------------------------------------------------------------------


def _block_ops(p: Dict[str, Any], cdt):
    row = lambda a: jnp.asarray(a, cdt).reshape(1, -1)  # noqa: E731
    mat = lambda a: jnp.asarray(a, cdt)                 # noqa: E731
    return [
        row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
        mat(p["attn"]["qkv"]["kernel"]), row(p["attn"]["qkv"]["bias"]),
        mat(p["attn"]["proj"]["kernel"]), row(p["attn"]["proj"]["bias"]),
        row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
        mat(p["mlp"]["fc1"]["kernel"]), row(p["mlp"]["fc1"]["bias"]),
        mat(p["mlp"]["fc2"]["kernel"]), row(p["mlp"]["fc2"]["bias"]),
    ]


def _wspec(shape):
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape))


def _fwd_impl(x, blocks, num_heads, eps, interpret):
    n, l, d = x.shape
    cdt = x.dtype
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    kernel = functools.partial(_train_fwd_kernel, num_heads=num_heads,
                               l_real=l, eps=eps)
    xins, xmids = [], []
    for blk in blocks:
        ops = _block_ops(blk, cdt)
        xins.append(xp)
        xp, xmid = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0))]
            + [_wspec(o.shape) for o in ops],
            out_specs=(pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0)),
                       pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((n, lp, d), cdt),
                       jax.ShapeDtypeStruct((n, lp, d), cdt)),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, *ops)
        xmids.append(xmid)
    return xp[:, :l], (tuple(xins), tuple(xmids))


def _bwd_impl(blocks, xins, xmids, dy, num_heads, eps, interpret):
    n, l, d = dy.shape
    cdt = xins[0].dtype
    lp = xins[0].shape[1]
    nt, tl = _mlp_tiles(lp)
    dcur = jnp.pad(dy.astype(jnp.float32), ((0, 0), (0, lp - l), (0, 0)))
    mlp_kernel = functools.partial(_mlp_bwd_kernel, eps=eps)
    attn_kernel = functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                                    l_real=l, eps=eps)
    dblocks = []
    f32 = jnp.float32
    for i in range(len(blocks) - 1, -1, -1):
        ops = _block_ops(blocks[i], cdt)
        tile = pl.BlockSpec((1, tl, d), lambda i_, t_: (i_, t_, 0))
        dxmid, dw1, db1, dw2, db2, dl2s, dl2b = pl.pallas_call(
            mlp_kernel,
            grid=(n, nt),
            in_specs=[tile, tile] + [_wspec(o.shape) for o in ops[6:]],
            out_specs=(tile, _wspec(ops[8].shape),
                       _wspec((1, ops[8].shape[1])), _wspec(ops[10].shape),
                       _wspec((1, d)), _wspec((1, d)), _wspec((1, d))),
            out_shape=(jax.ShapeDtypeStruct((n, lp, d), f32),
                       jax.ShapeDtypeStruct(ops[8].shape, f32),
                       jax.ShapeDtypeStruct((1, ops[8].shape[1]), f32),
                       jax.ShapeDtypeStruct(ops[10].shape, f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xmids[i], dcur, *ops[6:])
        bspec = pl.BlockSpec((1, lp, d), lambda i_: (i_, 0, 0))
        dcur, dwqkv, dbqkv, dwproj, dbproj, dl1s, dl1b = pl.pallas_call(
            attn_kernel,
            grid=(n,),
            in_specs=[bspec, bspec] + [_wspec(o.shape) for o in ops[:6]],
            out_specs=(bspec, _wspec(ops[2].shape),
                       _wspec((1, ops[2].shape[1])), _wspec(ops[4].shape),
                       _wspec((1, d)), _wspec((1, d)), _wspec((1, d))),
            out_shape=(jax.ShapeDtypeStruct((n, lp, d), f32),
                       jax.ShapeDtypeStruct(ops[2].shape, f32),
                       jax.ShapeDtypeStruct((1, ops[2].shape[1]), f32),
                       jax.ShapeDtypeStruct(ops[4].shape, f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xins[i], dxmid, *ops[:6])
        dblocks.append({
            "norm1": {"scale": dl1s[0], "bias": dl1b[0]},
            "attn": {"qkv": {"kernel": dwqkv, "bias": dbqkv[0]},
                     "proj": {"kernel": dwproj, "bias": dbproj[0]}},
            "norm2": {"scale": dl2s[0], "bias": dl2b[0]},
            "mlp": {"fc1": {"kernel": dw1, "bias": db1[0]},
                    "fc2": {"kernel": dw2, "bias": db2[0]}},
        })
    dblocks = tuple(reversed(dblocks))
    dblocks = jax.tree.map(lambda g, pr: g.astype(pr.dtype),
                           dblocks, tuple(blocks))
    return dcur[:, :l].astype(cdt), dblocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_vit_train_layers(x, blocks, num_heads: int, eps: float = 1e-5,
                           interpret: bool = False):
    """Differentiable fused pre-LN ViT block stack.

    x: (N, L, D) activations in the compute dtype; blocks: tuple of
    ViTBlock param trees ({norm1, attn:{qkv,proj}, norm2, mlp:{fc1,fc2}}).
    Returns the stack output; d/dx and d/dblocks flow through the fused
    backward kernels. No dropout (decoder blocks have none).
    """
    y, _ = _fwd_impl(x, blocks, num_heads, eps, interpret)
    return y


def _vjp_fwd(x, blocks, num_heads, eps, interpret):
    y, (xins, xmids) = _fwd_impl(x, blocks, num_heads, eps, interpret)
    return y, (blocks, xins, xmids)


def _vjp_bwd(num_heads, eps, interpret, res, dy):
    blocks, xins, xmids = res
    dx, dblocks = _bwd_impl(blocks, xins, xmids, dy, num_heads, eps,
                            interpret)
    return dx, dblocks


fused_vit_train_layers.defvjp(_vjp_fwd, _vjp_bwd)


def supports_fused_train(n: int, l: int, d: int, num_heads: int) -> bool:
    """Shape gate: lane-aligned model dim, 64-lane head slices, and a
    token count whose padded square (lp x lp f32 scores per head, plus the
    dW accumulators) stays inside the VMEM budget."""
    lp = _round_up(l, _SUBLANE)
    return (d % 128 == 0 and (d // num_heads) % _SUBLANE == 0 and n >= 1
            and lp <= 1024)
