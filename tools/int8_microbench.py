"""Probe v5e int8 matmul support + speed vs bf16 (XLA and Pallas).

Establishes whether the MXU's 2x int8 peak is reachable from JAX on this
chip before committing to a quantized trunk path. Shapes are the flagship
trunk's three dense matmuls at bs16 (B*L rows = 16*930 -> padded 14880):
fused-QKV (1024->3072), proj (1024->1024), MLP fc1/fc2 (1024<->4096).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/int8_microbench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def xla_dot(x, w, acc):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=acc)


def _mm_kernel(x_ref, w_ref, o_ref, *, acc):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc)


def pallas_dot(x, w, acc, bm=512):
    m, k = x.shape
    _, n = w.shape
    grid = (m // bm,)
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc=acc),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc),
    )(x, w)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    M = 16 * 930 // 8 * 8  # 14880
    shapes = [(M, 1024, 3072), (M, 1024, 1024), (M, 1024, 4096),
              (M, 4096, 1024)]
    for m, k, n in shapes:
        xf = rng.normal(size=(m, k)).astype(np.float32)
        wf = rng.normal(size=(k, n)).astype(np.float32)
        x16, w16 = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
        x8 = jnp.asarray(np.clip(xf * 30, -127, 127).astype(np.int8))
        w8 = jnp.asarray(np.clip(wf * 30, -127, 127).astype(np.int8))
        flops = 2 * m * k * n
        rows = {}
        for tag, fn, a, b, acc in [
            ("xla bf16", jax.jit(lambda x, w: xla_dot(x, w, jnp.float32)),
             x16, w16, None),
            ("xla int8", jax.jit(lambda x, w: xla_dot(x, w, jnp.int32)),
             x8, w8, None),
        ]:
            try:
                ms = bench(fn, a, b)
                rows[tag] = ms
                print(f"  ({m},{k})x({k},{n}) {tag}: {ms:7.3f} ms "
                      f"{flops / ms / 1e9:8.1f} GFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  ({m},{k})x({k},{n}) {tag}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        for tag, a, b, acc in [
            ("pallas bf16", x16, w16, jnp.float32),
            ("pallas int8", x8, w8, jnp.int32),
        ]:
            try:
                fn = jax.jit(functools.partial(pallas_dot, acc=acc))
                ms = bench(fn, a, b)
                rows[tag] = ms
                print(f"  ({m},{k})x({k},{n}) {tag}: {ms:7.3f} ms "
                      f"{flops / ms / 1e9:8.1f} GFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  ({m},{k})x({k},{n}) {tag}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        if "xla bf16" in rows and "xla int8" in rows:
            print(f"  -> int8/bf16 speedup (xla): "
                  f"{rows['xla bf16'] / rows['xla int8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
