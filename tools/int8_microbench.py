"""Probe v5e int8 matmul support + speed vs bf16 (XLA and Pallas).

Establishes whether the MXU's 2x int8 peak is reachable from JAX on this
chip before committing to a quantized trunk path. Shapes are the flagship
trunk's dense matmuls at bs16 (B*L rows = 16*930 -> 14880).

Methodology: the tunnel's block_until_ready does not actually block, so
single-dispatch timings here measure RTT, not device time. Each
measurement chains ITERS dependent matmuls inside ONE jitted lax.scan
(the carry feeds the next dot) and reads back a value that depends on
every step — same trick as bench.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/int8_microbench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ITERS = 50
REPEATS = 5


def _chain(dot_fn, x0, w, iters, feedback):
    """Run iters dependent dots in one scan; feedback(out, x) -> next x."""

    @jax.jit
    def run(x0, w):
        def body(x, _):
            out = dot_fn(x, w)
            return feedback(out, x), jnp.float32(out[0, 0])

        _, probes = jax.lax.scan(body, x0, None, length=iters)
        return probes.sum()

    return run


def _time(run, x0, w):
    float(run(x0, w))  # compile + warm
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x0, w))
        ts.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(ts)) * 1e3  # ms per dot


def xla_dot(acc):
    def f(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc)
    return f


def _mm_kernel(x_ref, w_ref, o_ref, *, acc):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc)


def pallas_dot(acc, bm=256):
    from dreamvla_tpu.ops.attention import _COMPILER_PARAMS

    def f(x, w):
        m, k = x.shape
        _, n = w.shape
        return pl.pallas_call(
            functools.partial(_mm_kernel, acc=acc),
            grid=(m // bm,),
            in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                      pl.BlockSpec((k, n), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), acc),
            compiler_params=_COMPILER_PARAMS,
        )(x, w)

    return f


def fb_bf16(out, x):
    k = x.shape[1]
    return (x + out[:, :k].astype(x.dtype) * jnp.asarray(1e-6, x.dtype))


def fb_int8(out, x):
    k = x.shape[1]
    # keep int8 values bounded while depending on out
    return (x ^ (out[:, :k] & 1).astype(jnp.int8))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    M = 14880
    shapes = [(M, 1024, 3072), (M, 1024, 1024), (M, 1024, 4096),
              (M, 4096, 1024)]
    for m, k, n in shapes:
        xf = rng.normal(size=(m, k)).astype(np.float32)
        wf = rng.normal(size=(k, n)).astype(np.float32)
        x16, w16 = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(xf * 30, -127, 127).astype(np.int8))
        w8 = jnp.asarray(np.clip(wf * 30, -127, 127).astype(np.int8))
        tflop = 2 * m * k * n / 1e12
        rows = {}
        for tag, fn, a, b, fb in [
            ("xla bf16", xla_dot(jnp.float32), x16, w16, fb_bf16),
            ("xla int8", xla_dot(jnp.int32), x8, w8, fb_int8),
            ("pallas bf16", pallas_dot(jnp.float32), x16, w16, fb_bf16),
            ("pallas int8", pallas_dot(jnp.int32), x8, w8, fb_int8),
        ]:
            try:
                ms = _time(_chain(fn, a, b, ITERS, fb), a, b)
                rows[tag] = ms
                print(f"  ({m},{k})x({k},{n}) {tag}: {ms:7.3f} ms "
                      f"{tflop / (ms / 1e3):7.1f} TFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  ({m},{k})x({k},{n}) {tag}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
        for pair in (("xla bf16", "xla int8"), ("pallas bf16", "pallas int8")):
            if pair[0] in rows and pair[1] in rows:
                print(f"  -> {pair[1]}/{pair[0]} speedup: "
                      f"{rows[pair[0]] / rows[pair[1]]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
