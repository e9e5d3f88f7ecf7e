"""Fused GPT-2 trunk TRAINING kernels: whole-block forward with in-kernel
dropout plus a two-kernel backward per layer, under `jax.custom_vjp`.

The inference-side whole-block fusion (ops/gpt2_fused.py, replacing the
eager attention of reference `models/gpt2.py:267-274`) bought 1.40x on the
serving trunk by keeping LN stats, head relayouts and elementwise passes in
VMEM. The train step pays the same HBM taxes twice more (backward re-reads
every intermediate XLA materialised). This module extends the fusion to
training:

  * forward kernel — identical math to `ops.gpt2_fused._block_kernel` plus
    the two HF-GPT-2 dropout sites (attn c_proj output and MLP output,
    p=0.1; the reference trains in `.train()` mode so these are live) and a
    second output: the post-attention residual `x_mid`, saved for backward.
  * backward = two kernels per layer, each RECOMPUTING its half of the
    forward in VMEM from the saved layer input (no intermediate ever hits
    HBM):
      - MLP half   (grid (B, row-tiles)): LN2 -> fc -> gelu -> proj -> drop,
        then d(LN2)/dW1/dW2 and dx_mid. L-tiled because dW1+dW2 f32
        accumulators alone are 33.6 MB at D=1024.
      - attention half (grid (B,)): LN1 -> fused-QKV -> role-split attention
        (two softmaxes per head, see gpt2_fused.py docstring) -> c_proj
        -> drop, then dWqkv/dWproj/d(LN1) and dx.
    Weight grads accumulate across the batch grid into f32 VMEM-resident
    blocks with constant-index BlockSpecs. With the batch axis as the only
    (or major) grid axis every revisit of an accumulator block is by
    CONSECUTIVE programs — the accumulation-safety rule learned from the
    round-2 flash-backward dk/dv race.

Dropout masks are regenerated bit-identically in the backward as a pure
HASH of (global row, column, layer/site/batch seed) — a murmur3-style
integer finalizer on the VPU (`_keep_mask`). A counter-based mask (rather
than the stateful on-core PRNG, `pltpu.prng_seed`) is what makes the
design sound: the backward's MLP kernel is L-TILED, and a tile can evaluate
exactly its row range of the same mask with no draw-order bookkeeping; it
is also the only variant testable off-TPU (interpret mode has no lowering
for `prng_seed`, found 2026-08-18).

Gradients: x and every block weight. The additive mask `bias` is
non-trainable (matches ops.attention's bias_grad=False convention) and the
seeds are integers; both get symbolic-zero cotangents.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dreamvla_tpu.ops.attention import _COMPILER_PARAMS, _round_up
from dreamvla_tpu.ops.gpt2_fused import (_gelu_tanh, _ln, build_role_biases)

# The attention-half backward (grid (B,), whole-L recompute + f32 dWqkv/
# dWproj accumulators) sits just over the 100 MB scoped-VMEM cap shared by
# the other kernels when Mosaic schedules it inside the full train step
# (measured 105.25 MB at lp=936/D=1024/H=16 on v5e, 2026-08-19). The chip
# has 128 MB physical; give THAT kernel its own 112 MB cap rather than
# shrinking the fusion. The forward and MLP-half kernels fit under the
# shared 100 MB cap and keep it (headroom for Mosaic double-buffering).
try:
    _TRAIN_COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=112 * 1024 * 1024)
except Exception:  # pragma: no cover - non-TPU installs
    _TRAIN_COMPILER_PARAMS = _COMPILER_PARAMS

_SUBLANE = 8
_LANE = 128
# odd mixing constants for per-(layer, batch) mask seeds (int32 wraparound)
_MIX_B = np.int32(-1640531527)   # 0x9E3779B9
_MIX_L = np.int32(7919)


def _keep_thresh(p: float) -> np.uint32:
    """uint32 threshold with P(bits >= thresh) = 1 - p."""
    return np.uint32(min(int(round(p * 4294967296.0)), 4294967295))


def _mlp_tiles(lp: int, max_rows: int = 384) -> Tuple[int, int]:
    """Row tiling for the MLP backward: smallest tile count nt such that
    nt divides lp/8 (tiles stay sublane-aligned) and lp/nt <= max_rows."""
    sl = lp // _SUBLANE
    for nt in range(1, sl + 1):
        if sl % nt == 0 and lp // nt <= max_rows:
            return nt, lp // nt
    return 1, lp


def _keep_mask(shape, row0, seed_u32, p: float):
    """Counter-based keep mask: murmur3-style fmix of the GLOBAL element
    index (row0 + local row, col) xor a per-(layer, site, batch) seed.
    Evaluating any row range of the same logical mask reproduces the same
    bits — forward (full rows) and L-tiled backward (a row slice) agree by
    construction."""
    r = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
         + jnp.uint32(row0))
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    h = (r * jnp.uint32(65521) + c) ^ seed_u32
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h >= _keep_thresh(p)


def _site_seed(seed_i32, pid):
    """(layer-mixed) site seed + batch-program mix, as uint32."""
    return (seed_i32 + pid * _MIX_B).astype(jnp.uint32)


def _dropout(x32, seed_i32, pid, p: float, row0: int = 0):
    """In-kernel inverted dropout on an f32 tile (rows [row0, row0+n))."""
    keep = _keep_mask(x32.shape, row0, _site_seed(seed_i32, pid), p)
    return jnp.where(keep, x32 * (1.0 / (1.0 - p)), 0.0)


def _gelu_tanh_grad(a):
    c = np.sqrt(2.0 / np.pi).astype(np.float32)
    u = c * (a + 0.044715 * a * a * a)
    th = jnp.tanh(u)
    return 0.5 * (1.0 + th) + 0.5 * a * (1.0 - th * th) * c * (
        1.0 + 3.0 * 0.044715 * a * a)


def _ln_stats(x32, eps: float):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd, rstd


def _ln_bwd(dy32, xhat, rstd, scale32):
    """Backward of y = xhat*scale + bias given dy; returns
    (dx, dscale_rows, dbias_rows) with the row sums left to the caller."""
    dxhat = dy32 * scale32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dy32 * xhat, dy32


def _cdot(a, b, dims, cdt):
    """Contract in compute dtype (MXU path), accumulate f32."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt), (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _train_fwd_kernel(x_ref, biasa_ref, biasb_ref, seed_ref, ln1s_ref,
                      ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      y_ref, xmid_ref, *, num_heads: int, nq: int, rb0: int,
                      lp: int, eps: float, p: float):
    _, _, d = x_ref.shape
    hd = d // num_heads
    na_pad = biasa_ref.shape[-1]
    pid = pl.program_id(0)
    x = x_ref[0]
    cdt = x.dtype
    xn = _ln(x.astype(jnp.float32), ln1s_ref[0].astype(jnp.float32),
             ln1b_ref[0].astype(jnp.float32), eps).astype(cdt)
    qkv = jax.lax.dot_general(xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(cdt)
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
        pa = jnp.exp(s - m)
        pa = pa / jnp.sum(pa, axis=-1, keepdims=True)
        oa = jax.lax.dot_general(pa.astype(cdt), v[:na_pad],
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
        heads.append(jnp.where(rowsel, oa, ob_full).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)
    po = jax.lax.dot_general(o, wproj_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    po = po + bproj_ref[0].astype(jnp.float32)
    if p > 0.0:
        po = _dropout(po, seed_ref[0], pid, p)
    xmid = x + po.astype(cdt)
    xmid_ref[0] = xmid
    h = _ln(xmid.astype(jnp.float32), ln2s_ref[0].astype(jnp.float32),
            ln2b_ref[0].astype(jnp.float32), eps)
    h = jax.lax.dot_general(h, w1_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _gelu_tanh(h + b1_ref[0].astype(jnp.float32))
    h = jax.lax.dot_general(h.astype(cdt), w2_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b2_ref[0].astype(jnp.float32)
    if p > 0.0:
        h = _dropout(h, seed_ref[1], pid, p)
    y_ref[0] = xmid + h.astype(cdt)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _mlp_bwd_kernel(xmid_ref, dy_ref, seed_ref, ln2s_ref, ln2b_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, dxmid_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref, dls_ref, dlb_ref, *, eps: float,
                    p: float):
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
    h0 = xhat * s32 + ln2b_ref[0].astype(jnp.float32)          # f32, as fwd
    a1 = jax.lax.dot_general(h0, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a1 = a1 + b1_ref[0].astype(jnp.float32)
    g = _gelu_tanh(a1)
    dy = dy_ref[0].astype(jnp.float32)
    if p > 0.0:
        tl = dy.shape[0]
        keep = _keep_mask(dy.shape, tidx * tl, _site_seed(seed_ref[1], bidx),
                          p)
        dm = jnp.where(keep, dy * (1.0 / (1.0 - p)), 0.0)
    else:
        dm = dy
    db2_ref[:] += jnp.sum(dm, axis=0, keepdims=True)
    dw2_ref[:] += _cdot(g, dm, ((0,), (0,)), cdt)              # g^T dm
    dg = _cdot(dm, w2_ref[:], ((1,), (1,)), cdt)               # dm W2^T
    da1 = dg * _gelu_tanh_grad(a1)
    db1_ref[:] += jnp.sum(da1, axis=0, keepdims=True)
    dw1_ref[:] += _cdot(h0, da1, ((0,), (0,)), cdt)            # h0^T da1
    dh0 = _cdot(da1, w1_ref[:], ((1,), (1,)), cdt)             # da1 W1^T
    dx_ln, ds_rows, db_rows = _ln_bwd(dh0, xhat, rstd, s32)
    dls_ref[:] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dlb_ref[:] += jnp.sum(db_rows, axis=0, keepdims=True)
    dxmid_ref[0] = dy + dx_ln


def _attn_bwd_kernel(x_ref, dxm_ref, biasa_ref, biasb_ref, seed_ref,
                     ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                     bproj_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                     dbproj_ref, dls_ref, dlb_ref, *, num_heads: int,
                     nq: int, rb0: int, lp: int, eps: float, p: float):
    _, _, d = x_ref.shape
    hd = d // num_heads
    na_pad = biasa_ref.shape[-1]
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
    biasa = biasa_ref[:]
    biasb = biasb_ref[:, :lp]
    rowsel = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), 0) < nq
    rowsel_b = rowsel[rb0:]
    scale = hd ** -0.5

    def head_slices(hh):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, (num_heads + hh) * hd:(num_heads + hh + 1) * hd]
        v = qkv[:, (2 * num_heads + hh) * hd:(2 * num_heads + hh + 1) * hd]
        return q, k, v

    def softmaxes(q, k):
        s = jax.lax.dot_general(q, k[:na_pad], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + biasa
        pa = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        pa = pa / jnp.sum(pa, axis=-1, keepdims=True)
        sb = jax.lax.dot_general(q[rb0:], k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sb = sb * scale + biasb
        pb = jnp.exp(sb - jnp.max(sb, axis=-1, keepdims=True))
        pb = pb / jnp.sum(pb, axis=-1, keepdims=True)
        return pa, pb

    # pass 1: recompute the attention output o (head outputs only)
    heads = []
    for hh in range(num_heads):
        q, k, v = head_slices(hh)
        pa, pb = softmaxes(q, k)
        oa = jax.lax.dot_general(pa.astype(cdt), v[:na_pad],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob = jax.lax.dot_general(pb.astype(cdt), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ob_full = jnp.concatenate(
            [jnp.zeros((rb0, hd), jnp.float32), ob], axis=0)
        heads.append(jnp.where(rowsel, oa, ob_full).astype(cdt))
    o = jnp.concatenate(heads, axis=-1)                        # (lp, d) cdt

    dxm = dxm_ref[0].astype(jnp.float32)
    if p > 0.0:
        keep = _keep_mask(dxm.shape, 0, _site_seed(seed_ref[0], pid), p)
        dpo = jnp.where(keep, dxm * (1.0 / (1.0 - p)), 0.0)
    else:
        dpo = dxm
    dbproj_ref[:] += jnp.sum(dpo, axis=0, keepdims=True)
    dwproj_ref[:] += _cdot(o, dpo, ((0,), (0,)), cdt)          # o^T dpo
    do = _cdot(dpo, wproj_ref[:], ((1,), (1,)), cdt)           # (lp, d) f32

    # pass 2: per-head attention backward (recompute the softmaxes)
    dqs, dks, dvs = [], [], []
    for hh in range(num_heads):
        q, k, v = head_slices(hh)
        pa, pb = softmaxes(q, k)
        doh = do[:, hh * hd:(hh + 1) * hd]
        doa = jnp.where(rowsel, doh, 0.0)
        dob = jnp.where(rowsel_b, 0.0, doh[rb0:])
        dva = _cdot(pa, doa, ((0,), (0,)), cdt)                # (na_pad, hd)
        dpa = _cdot(doa, v[:na_pad], ((1,), (1,)), cdt)        # (lp, na_pad)
        dsa = pa * (dpa - jnp.sum(dpa * pa, axis=-1, keepdims=True))
        dqa = _cdot(dsa, k[:na_pad], ((1,), (0,)), cdt) * scale
        dka = _cdot(dsa, q, ((0,), (0,)), cdt) * scale         # (na_pad, hd)
        dvb = _cdot(pb, dob, ((0,), (0,)), cdt)                # (lp, hd)
        dpb = _cdot(dob, v, ((1,), (1,)), cdt)                 # (rbn, lp)
        dsb = pb * (dpb - jnp.sum(dpb * pb, axis=-1, keepdims=True))
        dqb = _cdot(dsb, k, ((1,), (0,)), cdt) * scale         # (rbn, hd)
        dkb = _cdot(dsb, q[rb0:], ((0,), (0,)), cdt) * scale   # (lp, hd)
        dq = dqa + jnp.concatenate(
            [jnp.zeros((rb0, hd), jnp.float32), dqb], axis=0)
        pad_k = jnp.zeros((lp - na_pad, hd), jnp.float32)
        dqs.append(dq)
        dks.append(dkb + jnp.concatenate([dka, pad_k], axis=0))
        dvs.append(dvb + jnp.concatenate([dva, pad_k], axis=0))
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
        row(p["ln_1"]["scale"]), row(p["ln_1"]["bias"]),
        mat(p["attn"]["c_attn"]["kernel"]), row(p["attn"]["c_attn"]["bias"]),
        mat(p["attn"]["c_proj"]["kernel"]), row(p["attn"]["c_proj"]["bias"]),
        row(p["ln_2"]["scale"]), row(p["ln_2"]["bias"]),
        mat(p["mlp_c_fc"]["kernel"]), row(p["mlp_c_fc"]["bias"]),
        mat(p["mlp_c_proj"]["kernel"]), row(p["mlp_c_proj"]["bias"]),
    ]


def _wspec(shape):
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape))


def _fwd_impl(x, blocks, bias, seeds, n_a, n_q, num_heads, eps, p, interpret):
    b, l, d = x.shape
    cdt = x.dtype
    lp = _round_up(l, _SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    biasa, biasb, rb0 = build_role_biases(bias, n_a, n_q, lp)
    kernel = functools.partial(_train_fwd_kernel, num_heads=num_heads,
                               nq=n_q, rb0=rb0, lp=lp, eps=eps, p=p)
    xins, xmids = [], []
    for i, blk in enumerate(blocks):
        ops = _block_ops(blk, cdt)
        layer_seeds = (seeds + jnp.int32(i) * _MIX_L).astype(jnp.int32)
        xins.append(xp)
        xp, xmid = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, lp, d), lambda i_: (i_, 0, 0)),
                      _wspec(biasa.shape), _wspec(biasb.shape),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [_wspec(o.shape) for o in ops],
            out_specs=(pl.BlockSpec((1, lp, d), lambda i_: (i_, 0, 0)),
                       pl.BlockSpec((1, lp, d), lambda i_: (i_, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((b, lp, d), cdt),
                       jax.ShapeDtypeStruct((b, lp, d), cdt)),
            interpret=interpret,
            # fits under the shared 100 MB cap; keep Mosaic's headroom
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xp, biasa, biasb, layer_seeds, *ops)
        xmids.append(xmid)
    return xp[:, :l], (tuple(xins), tuple(xmids))


def _bwd_impl(blocks, bias, seeds, xins, xmids, dy, n_a, n_q, num_heads,
              eps, p, interpret):
    b, l, d = dy.shape
    cdt = xins[0].dtype
    lp = xins[0].shape[1]
    biasa, biasb, rb0 = build_role_biases(bias, n_a, n_q, lp)
    nt, tl = _mlp_tiles(lp)
    dcur = jnp.pad(dy.astype(jnp.float32), ((0, 0), (0, lp - l), (0, 0)))
    mlp_kernel = functools.partial(_mlp_bwd_kernel, eps=eps, p=p)
    attn_kernel = functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                                    nq=n_q, rb0=rb0, lp=lp, eps=eps, p=p)
    dblocks = []
    f32 = jnp.float32
    for i in range(len(blocks) - 1, -1, -1):
        ops = _block_ops(blocks[i], cdt)
        layer_seeds = (seeds + jnp.int32(i) * _MIX_L).astype(jnp.int32)
        tile = pl.BlockSpec((1, tl, d), lambda i_, t_: (i_, t_, 0))
        dxmid, dw1, db1, dw2, db2, dl2s, dl2b = pl.pallas_call(
            mlp_kernel,
            grid=(b, nt),
            in_specs=[tile, tile, pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [_wspec(o.shape) for o in ops[6:]],
            out_specs=(tile, _wspec(ops[8].shape), _wspec((1, ops[8].shape[1])),
                       _wspec(ops[10].shape), _wspec((1, d)),
                       _wspec((1, d)), _wspec((1, d))),
            out_shape=(jax.ShapeDtypeStruct((b, lp, d), f32),
                       jax.ShapeDtypeStruct(ops[8].shape, f32),
                       jax.ShapeDtypeStruct((1, ops[8].shape[1]), f32),
                       jax.ShapeDtypeStruct(ops[10].shape, f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            interpret=interpret,
            # fits under the shared 100 MB cap; keep Mosaic's headroom
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(xmids[i], dcur, layer_seeds, *ops[6:])
        bspec = pl.BlockSpec((1, lp, d), lambda i_: (i_, 0, 0))
        dcur, dwqkv, dbqkv, dwproj, dbproj, dl1s, dl1b = pl.pallas_call(
            attn_kernel,
            grid=(b,),
            in_specs=[bspec, bspec, _wspec(biasa.shape), _wspec(biasb.shape),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [_wspec(o.shape) for o in ops[:6]],
            out_specs=(bspec, _wspec(ops[2].shape),
                       _wspec((1, ops[2].shape[1])), _wspec(ops[4].shape),
                       _wspec((1, d)), _wspec((1, d)), _wspec((1, d))),
            out_shape=(jax.ShapeDtypeStruct((b, lp, d), f32),
                       jax.ShapeDtypeStruct(ops[2].shape, f32),
                       jax.ShapeDtypeStruct((1, ops[2].shape[1]), f32),
                       jax.ShapeDtypeStruct(ops[4].shape, f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            interpret=interpret,
            compiler_params=None if interpret else _TRAIN_COMPILER_PARAMS,
        )(xins[i], dxmid, biasa, biasb, layer_seeds, *ops[:6])
        grads = {
            "ln_1": {"scale": dl1s[0], "bias": dl1b[0]},
            "attn": {"c_attn": {"kernel": dwqkv, "bias": dbqkv[0]},
                     "c_proj": {"kernel": dwproj, "bias": dbproj[0]}},
            "ln_2": {"scale": dl2s[0], "bias": dl2b[0]},
            "mlp_c_fc": {"kernel": dw1, "bias": db1[0]},
            "mlp_c_proj": {"kernel": dw2, "bias": db2[0]},
        }
        dblocks.append(grads)
    dblocks = tuple(reversed(dblocks))
    # cotangent dtypes must match the primal leaves
    dblocks = jax.tree.map(lambda g, pr: g.astype(pr.dtype),
                           dblocks, tuple(blocks))
    return dcur[:, :l].astype(cdt), dblocks


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_gpt2_train_layers(x, blocks, bias, seeds, n_a: int, n_q: int,
                            num_heads: int, eps: float = 1e-5,
                            p: float = 0.1, interpret: bool = False):
    """Training-mode fused GPT-2 block stack (differentiable).

    x: (B, L, D) token-reordered activations; blocks: tuple of GPT2Block
    param trees; bias: reordered (L, L) additive mask (non-trainable —
    zero cotangent); seeds: (2,) int32 dropout seeds (attn site, MLP site),
    fold in a fresh value per step; p: dropout prob (HF GPT-2 resid sites).
    Returns the stack output; d/dx and d/dblocks flow through the fused
    backward kernels.
    """
    y, _ = _fwd_impl(x, blocks, bias, seeds, n_a, n_q, num_heads, eps, p,
                     interpret)
    return y


def _vjp_fwd(x, blocks, bias, seeds, n_a, n_q, num_heads, eps, p, interpret):
    y, (xins, xmids) = _fwd_impl(x, blocks, bias, seeds, n_a, n_q, num_heads,
                                 eps, p, interpret)
    return y, (blocks, bias, seeds, xins, xmids)


def _vjp_bwd(n_a, n_q, num_heads, eps, p, interpret, res, dy):
    blocks, bias, seeds, xins, xmids = res
    dx, dblocks = _bwd_impl(blocks, bias, seeds, xins, xmids, dy, n_a, n_q,
                            num_heads, eps, p, interpret)
    dbias = jnp.zeros_like(bias)
    dseeds = np.zeros(seeds.shape, jax.dtypes.float0)
    return dx, dblocks, dbias, dseeds


fused_gpt2_train_layers.defvjp(_vjp_fwd, _vjp_bwd)
