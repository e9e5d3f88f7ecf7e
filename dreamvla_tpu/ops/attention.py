"""Attention primitives: a Pallas TPU flash-attention kernel + XLA reference.

Replaces the reference's cuDNN SDPA / eager matmul-softmax attention
(`models/gpt2.py:61-84, :267-274`). The trunk's additive mask arrives as a
(Lq, Lk) bias computed by `dreamvla_tpu.ops.masks` — never materialised per
(batch, head) in HBM: the kernel reads the single shared bias tile per query
block, so HBM traffic is O(B*H*L*D + L*L) instead of O(B*H*L*L).

Sequence lengths in this model family are short (<= ~1.3k tokens), so the
kernel keeps the full K/V for one (batch, head) resident in VMEM and does a
single-pass softmax per query tile — simpler and faster than online-softmax
streaming at these sizes. Gradients flow through a custom VJP whose backward
is also a Pallas kernel (`_flash_bwd_*` below): scores are rematerialised in
VMEM and dQ/dK/dV are accumulated with the dk/dv grid axis minor so each
output block is only touched by consecutive programs (see the round-2 race
fix, commit 69ea6ab). An XLA fallback remains for interpret/CPU runs.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # Mosaic scoped-VMEM default (16MB) is too small for grouped programs
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover - non-TPU installs
    _COMPILER_PARAMS = None

# Measured on TPU v5e at the flagship trunk shape (B2 H16 L930 D64): 512-row
# query tiles beat both 128 (mosaic unroll overhead, pathological compile
# times) and 1024 (VMEM pressure); 0.76ms vs 1.13ms for XLA's fused attention.
_Q_TILE_MAX = 512
_LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _bh_group(bh: int, q_tile: int, lk_pad: int, d_pad: int,
              vmem_budget: int = 24 * 1024 * 1024,
              n_score_bufs: int = 2) -> int:
    """Largest divisor of bh (<= 32) whose per-program VMEM footprint
    (fp32 scores + exp temps dominate) stays under the budget.

    Swept on v5e at the flagship trunk shape (bh=256, TQ=512, Lk=1024):
    G=4 1.62ms, G=2 1.63ms, G=8 2.08ms (blocks too big to double-buffer),
    G=1 2.09ms (program overhead). n_score_bufs: live (TQ, Lk) fp32
    temporaries in the kernel body (2 fwd, ~5 bwd)."""
    per_slice = (q_tile * lk_pad * 4 * n_score_bufs
                 + 2 * lk_pad * d_pad * 2         # K + V (input dtype)
                 + 2 * q_tile * d_pad * 4)        # Q + O
    # small shapes (e.g. the ViT encoders at L=197) are program-overhead
    # bound with small groups — the budget test alone picks G=4 at the
    # trunk shape and large G at encoder shapes
    for g in (32, 16, 8, 4, 2, 1):
        if bh % g == 0 and g * per_slice <= vmem_budget:
            return g
    return 1


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Plain XLA attention; fp32 softmax. q,k,v: (B, H, L, D); bias: (Lq, Lk)."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # A program handles a GROUP of (batch*head) slices via batched dots:
    # per-program work must be ~10µs+ to amortise Mosaic program overhead
    # (profiled: single-bh programs made the flagship trunk kernel
    # overhead-bound — 12k programs/trunk, ~2x the matmul time). QK^T runs
    # in the input dtype with fp32 accumulation (bit-identical to casting
    # bf16 up, but full MXU rate).
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, TQ, Lk)
    s = s * scale + bias_ref[:].astype(jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, TQ, D)
    o_ref[:] = (o / denom).astype(o_ref.dtype)


def _flash_fwd_impl(q, k, v, bias, scale, interpret=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    q_tile = min(_Q_TILE_MAX, _round_up(lq, _LANE))
    lq_pad = _round_up(lq, q_tile)
    lk_pad = _round_up(lk, _LANE)
    d_pad = _round_up(d, _LANE)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    if bias is None:
        bias = jnp.zeros((lq, lk), jnp.float32)
    # padded keys must be invisible to every (real) query row
    bp = jnp.pad(
        bias.astype(jnp.float32),
        ((0, lq_pad - lq), (0, lk_pad - lk)),
        constant_values=-1.0e9,
    )

    qp = qp.reshape(b * h, lq_pad, d_pad)
    kp = kp.reshape(b * h, lk_pad, d_pad)
    vp = vp.reshape(b * h, lk_pad, d_pad)

    bh_block = _bh_group(b * h, q_tile, lk_pad, d_pad)
    # Grid order (q_tile, bh_groups): the innermost axis sweeps bh groups,
    # so the shared bias block's index is unchanged between consecutive
    # programs and Mosaic skips its re-fetch — otherwise the (L, L) fp32
    # bias would be re-DMA'd B*H times per layer (~2.6 GB/step on the
    # flagship trunk).
    grid = (lq_pad // q_tile, (b * h) // bh_block)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh_block, q_tile, d_pad), lambda i, g: (g, i, 0)),
            pl.BlockSpec((bh_block, lk_pad, d_pad), lambda i, g: (g, 0, 0)),
            pl.BlockSpec((bh_block, lk_pad, d_pad), lambda i, g: (g, 0, 0)),
            pl.BlockSpec((q_tile, lk_pad), lambda i, g: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bh_block, q_tile, d_pad),
                               lambda i, g: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(qp, kp, vp, bp)
    return out.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, bias, scale):
    return _flash_fwd_impl(q, k, v, bias, scale)


def _flash_attention_fwd(q, k, v, bias, scale):
    return _flash_fwd_impl(q, k, v, bias, scale), (q, k, v, bias)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref=None, *, scale: float,
                q_tile: int):
    """Flash backward for a GROUP of (batch*head) slices: rematerialise
    scores per q-tile, accumulate dk/dv across q-tiles in VMEM, write dq
    and a per-group dbias contribution per tile. Keeps all L x L
    intermediates in VMEM — the XLA fallback materialises four of them in
    HBM per layer.

    CORRECTNESS: the grid is (groups, q_tiles) with the q-tile axis MINOR,
    so the dk/dv output blocks (indexed by group only) keep a CONSTANT
    index across consecutive programs — the only accumulation pattern
    Mosaic's output pipelining guarantees. The previous layout accumulated
    into blocks revisited across non-consecutive programs, which
    interpret-mode executes correctly but real hardware does not (caught
    by an on-device autodiff comparison at L=930; single-q-tile shapes
    never hit the race). dbias is written once per (group, tile) block and
    reduced over groups outside the kernel for the same reason."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref[:])
        dv_ref[:] = jnp.zeros_like(dv_ref[:])

    q = q_ref[:].astype(jnp.float32)  # (G, TQ, D)
    k = k_ref[:].astype(jnp.float32)  # (G, Lk, D)
    v = v_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)  # (G, TQ, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[:].astype(jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (G, TQ, Lk)
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[:] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[:] += (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale)
    dv_ref[:] += jax.lax.dot_general(
        p, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if dbias_ref is not None:
        # only when the caller trains the bias (bias_grad=True); the trunk
        # mask is non-trainable (reference requires_grad=False), so the
        # default path skips the dbias compute + (groups, L, L) HBM traffic
        dbias_ref[0] = jnp.sum(ds, axis=0)


def _flash_bwd_impl(q, k, v, bias, g, scale, interpret=False,
                    want_dbias=True):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    q_tile = min(_Q_TILE_MAX, _round_up(lq, _LANE))
    lq_pad = _round_up(lq, q_tile)
    lk_pad = _round_up(lk, _LANE)
    d_pad = _round_up(d, _LANE)

    pad3 = lambda t, l: jnp.pad(  # noqa: E731
        t, ((0, 0), (0, 0), (0, l - t.shape[2]), (0, d_pad - d)))
    qp = pad3(q, lq_pad).reshape(b * h, lq_pad, d_pad)
    kp = pad3(k, lk_pad).reshape(b * h, lk_pad, d_pad)
    vp = pad3(v, lk_pad).reshape(b * h, lk_pad, d_pad)
    gp = pad3(g, lq_pad).reshape(b * h, lq_pad, d_pad)
    if bias is None:
        bias = jnp.zeros((lq, lk), jnp.float32)
    bp = jnp.pad(bias.astype(jnp.float32),
                 ((0, lq_pad - lq), (0, lk_pad - lk)),
                 constant_values=-1.0e9)

    bh_block = _bh_group(b * h, q_tile, lk_pad, d_pad, n_score_bufs=5)
    n_groups = (b * h) // bh_block
    # grid (groups, q_tiles): q-tile axis minor so dk/dv block indices are
    # constant across consecutive programs (see _bwd_kernel docstring)
    grid = (n_groups, lq_pad // q_tile)
    in_specs = [
        pl.BlockSpec((bh_block, q_tile, d_pad), lambda g, i: (g, i, 0)),
        pl.BlockSpec((bh_block, lk_pad, d_pad), lambda g, i: (g, 0, 0)),
        pl.BlockSpec((bh_block, lk_pad, d_pad), lambda g, i: (g, 0, 0)),
        pl.BlockSpec((q_tile, lk_pad), lambda g, i: (i, 0)),
        pl.BlockSpec((bh_block, q_tile, d_pad), lambda g, i: (g, i, 0)),
    ]
    out_specs = [
        pl.BlockSpec((bh_block, q_tile, d_pad), lambda g, i: (g, i, 0)),
        pl.BlockSpec((bh_block, lk_pad, d_pad), lambda g, i: (g, 0, 0)),
        pl.BlockSpec((bh_block, lk_pad, d_pad), lambda g, i: (g, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), jnp.float32),
        jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), jnp.float32),
    ]
    if want_dbias:
        out_specs.append(
            pl.BlockSpec((1, q_tile, lk_pad), lambda g, i: (g, i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n_groups, lq_pad, lk_pad), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, q_tile=q_tile),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(qp, kp, vp, bp, gp)
    dq, dk, dv = outs[:3]
    dq = dq.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d].astype(k.dtype)
    dv = dv.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d].astype(v.dtype)
    if not want_dbias:
        return dq, dk, dv, None
    dbias = jnp.sum(outs[3], axis=0)
    return dq, dk, dv, dbias[:lq, :lk]


def _flash_attention_bwd(scale, res, g):
    q, k, v, bias = res
    dq, dk, dv, dbias = _flash_bwd_impl(q, k, v, bias, g, scale)
    return dq, dk, dv, (None if bias is None else dbias.astype(bias.dtype))


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_nbg(q, k, v, bias, scale):
    """Flash attention whose backward treats the bias as a constant (the
    trunk mask is non-trainable, reference dreamvla_model.py:286-298) --
    skips the dbias compute and its (groups, L, L) fp32 HBM traffic."""
    return _flash_fwd_impl(q, k, v, bias, scale)


def _flash_attention_nbg_fwd(q, k, v, bias, scale):
    return _flash_fwd_impl(q, k, v, bias, scale), (q, k, v, bias)


def _flash_attention_nbg_bwd(scale, res, g):
    q, k, v, bias = res
    dq, dk, dv, _ = _flash_bwd_impl(q, k, v, bias, g, scale,
                                    want_dbias=False)
    return dq, dk, dv, (jnp.zeros_like(bias) if bias is not None else None)


_flash_attention_nbg.defvjp(_flash_attention_nbg_fwd,
                            _flash_attention_nbg_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    use_pallas: bool | None = None,
    bias_grad: bool = False,
) -> jnp.ndarray:
    """Dispatching attention: Pallas flash kernel on TPU, XLA elsewhere.

    q, k, v: (B, H, L, D); bias: optional (Lq, Lk) additive, shared over
    B/H. bias_grad=False (default) treats the bias as a constant in the
    backward pass -- no caller in this model trains an attention bias.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    if use_pallas is None:
        # The kernel wins whenever scores are big enough to cost HBM traffic
        # (profiled: XLA's fp32 score materialisation costs ~0.8ms/layer for
        # the MAE encoder at L=197); at tiny Lq (DiT tokens, resampler
        # latents, CLIP) the 128-lane padding wastes MXU and XLA's fusion
        # wins. Threshold: query length >= 128.
        use_pallas = is_tpu_backend() and q.shape[2] >= 128
    if use_pallas:
        if bias_grad:
            return _flash_attention(q, k, v, bias, scale)
        return _flash_attention_nbg(q, k, v, bias, scale)
    return mha_reference(q, k, v, bias, scale)


@dataclasses.dataclass(frozen=True)
class BlockSplit:
    """Static token-layout descriptor for `structured_attention`.

    Mirrors ops.masks.MaskSpec geometry: K timestep blocks of
    `block = na + nobs + aps` tokens; positions [0, na) are A-tokens
    (text/state/images/cls), [na, na+nobs) dream-query tokens, the last
    `aps` action tokens.
    """

    k: int
    na: int
    nobs: int
    aps: int

    @property
    def block(self) -> int:
        return self.na + self.nobs + self.aps


def structured_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    split: BlockSplit,
    scale: float | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Exact trunk attention exploiting the DreamVLA mask structure.

    Every visibility rule (ops/masks.py, mirroring reference
    `generate_attention_mask`, dreamvla_model.py:25-66) lets
      * A-tokens and dream-query tokens see only A-token keys
        (rules 1/2/5: all their visible keys have kj < na);
      * action tokens additionally see their own block's dream-query keys
        (rules 3/4).
    So the (L, L) problem decomposes exactly into a dense
    (K*(na+nobs)) x (K*na) attention plus a tiny (K*aps) x L one — ~2.7x
    fewer attention FLOPs at the flagship shape (na=36, nobs=54, aps=3,
    K=10). Masked-out keys contribute exp(-1e9-m) == 0.0 exactly in fp32,
    so results are bit-identical to the full computation.
    """
    b, h, L, d = q.shape
    K, na, nobs, aps = split.k, split.na, split.nobs, split.aps
    nb = split.block
    assert L == K * nb, (L, split)
    scale = d**-0.5 if scale is None else scale

    q5 = q.reshape(b, h, K, nb, d)
    b4 = bias.reshape(K, nb, K, nb)

    # A + dream-query rows attend to A-columns only
    qa = q5[:, :, :, : na + nobs].reshape(b, h, K * (na + nobs), d)
    kA = k.reshape(b, h, K, nb, d)[:, :, :, :na].reshape(b, h, K * na, d)
    vA = v.reshape(b, h, K, nb, d)[:, :, :, :na].reshape(b, h, K * na, d)
    biasA = b4[:, : na + nobs, :, :na].reshape(K * (na + nobs), K * na)
    oA = multi_head_attention(qa, kA, vA, biasA, scale=scale,
                              use_pallas=use_pallas)

    if aps == 0:
        return oA.reshape(b, h, L, d)

    # action rows (K*aps of them) attend to the full key set — tiny, XLA
    qact = q5[:, :, :, na + nobs:].reshape(b, h, K * aps, d)
    biasact = b4[:, na + nobs:].reshape(K * aps, L)
    oact = mha_reference(qact, k, v, biasact, scale=scale)

    o = jnp.concatenate(
        [oA.reshape(b, h, K, na + nobs, d),
         oact.reshape(b, h, K, aps, d)], axis=3)
    return o.reshape(b, h, L, d)


def token_permutation(split: BlockSplit) -> "np.ndarray":
    """Permutation gathering trunk tokens into [all A | all dream-query |
    all action] order (from the interleaved per-timestep-block layout).

    With this order every role's rows/cols are CONTIGUOUS ranges, so
    `reordered_attention`'s operand slices are cheap (the interleaved
    93-block strided gathers measured ~1.3 ms/layer at the flagship
    serving shape — more than the attention kernel itself)."""
    import numpy as np

    K, na, nobs, aps = split.k, split.na, split.nobs, split.aps
    nb = split.block
    base = np.arange(K)[:, None] * nb
    a_idx = (base + np.arange(na)[None]).reshape(-1)
    o_idx = (base + na + np.arange(nobs)[None]).reshape(-1)
    act_idx = (base + na + nobs + np.arange(aps)[None]).reshape(-1)
    return np.concatenate([a_idx, o_idx, act_idx])


def reordered_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    split: BlockSplit,
    scale: float | None = None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Exact trunk attention over TOKEN-REORDERED inputs ([A | query | act]
    order, see `token_permutation`; `bias` must be permuted the same way).

    Decomposes exactly like `structured_attention` — A/dream-query rows
    only ever attend to A keys (reference generate_attention_mask rules,
    dreamvla_model.py:25-66), action rows to everything — but with
    contiguous slices instead of strided per-block gathers.
    """
    b, h, L, d = q.shape
    K, na, nobs, aps = split.k, split.na, split.nobs, split.aps
    assert L == K * split.block, (L, split)
    scale = d**-0.5 if scale is None else scale
    nA, nQ = K * na, K * (na + nobs)

    oA = multi_head_attention(
        q[:, :, :nQ], k[:, :, :nA], v[:, :, :nA], bias[:nQ, :nA],
        scale=scale, use_pallas=use_pallas)
    if aps == 0:
        return oA
    oact = multi_head_attention(
        q[:, :, nQ:], k, v, bias[nQ:], scale=scale, use_pallas=use_pallas)
    return jnp.concatenate([oA, oact], axis=2)


def is_tpu_backend() -> bool:
    """True on real TPU backends, including tunnelled plugins whose platform
    string is not literally 'tpu' (e.g. 'axon' exposes 'TPU v5 lite' devices)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return "tpu" in dev.platform.lower() or "tpu" in (dev.device_kind or "").lower()
