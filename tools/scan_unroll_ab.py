"""A/B the lax.scan unroll factor of the layer-stacked fused serving trunk.

Round-5 context: stacking the 24 trunk layers under one scanned Pallas
kernel made the serving executable ~L-fold smaller (CAPABILITIES.md) but
the four full-bench runs measured the int8 bs-32 point consistently ~4%
below the unrolled kernels (254.8-260.5 vs 267.5 chunks/s) and the bf16
bs-16 headline ~1% below (187.2-189.6 vs 190.1). A scan `unroll=k`
compiles k kernel instances per loop iteration — a middle ground that
keeps the executable ~L/k-fold smaller while giving XLA a k-layer window
to overlap weight DMA with compute across layer boundaries.

This tool times the TRUNK ONLY (the dominant cost of both points) at the
flagship serving shapes for unroll in {1, 2, 4} plus the fully unrolled
apply, bf16 at bs-16 and int8 (W8A8) at bs-32. Methodology as bench.py:
ITERS dependent applies chained in one jitted outer scan (the tunnel's
block_until_ready does not block), medians over REPEATS.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/scan_unroll_ab.py
     [--only bf16|int8] [--unrolls 1,2,4] [--skip-unrolled]
(selection flags exist because each build costs 1-13 min through the
tunnel depending on the window — run the sweep in restartable slices)
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.ops.gpt2_fused import (fused_gpt2_layers,
                                         fused_gpt2_layers_int8,
                                         fused_gpt2_layers_scanned,
                                         quantize_gpt2_block,
                                         stack_trunk_params)

# flagship trunk serving shapes (CALVIN finetune preset: K=10 steps,
# tokens_per_step=93, hidden 1024, 16 heads, 24 layers)
L, D, H, DEPTH = 930, 1024, 16, 24
N_A, N_Q = 360, 900
ITERS, REPEATS = 10, 5


def _rand_block(rng) -> dict:
    g = lambda *s: jnp.asarray(rng.normal(size=s) * 0.02, jnp.float32)  # noqa: E731
    return {
        "ln_1": {"scale": jnp.ones((D,), jnp.float32),
                 "bias": jnp.zeros((D,), jnp.float32)},
        "attn": {"c_attn": {"kernel": g(D, 3 * D), "bias": g(3 * D)},
                 "c_proj": {"kernel": g(D, D), "bias": g(D)}},
        "ln_2": {"scale": jnp.ones((D,), jnp.float32),
                 "bias": jnp.zeros((D,), jnp.float32)},
        "mlp_c_fc": {"kernel": g(D, 4 * D), "bias": g(4 * D)},
        "mlp_c_proj": {"kernel": g(4 * D, D), "bias": g(D)},
    }


def _time(apply_fn, x0, params) -> float:
    """ms per 24-layer trunk apply (median of REPEATS, ITERS per dispatch).

    params MUST flow through jit as an argument — closed-over weights get
    baked into the HLO as ~600 MB of constants and the tunnel's compile
    upload rejects the request (HTTP 413)."""

    @jax.jit
    def run(x, p):
        def body(c, _):
            out = apply_fn(c, p)
            # rescale the feedback so 24*ITERS layers of random weights
            # don't saturate bf16 (timing only; keeps values finite)
            return (out * 0.05).astype(c.dtype), jnp.float32(out[0, 0, 0])

        _, probes = jax.lax.scan(body, x, None, length=ITERS)
        return probes.sum()

    t0 = time.perf_counter()
    float(run(x0, params))  # compile + first run
    build = time.perf_counter() - t0
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(x0, params))
        ts.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(ts)) * 1e3, build


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["bf16", "int8"], default=None)
    ap.add_argument("--unrolls", default="1,2,4")
    ap.add_argument("--skip-unrolled", action="store_true")
    args = ap.parse_args()
    unrolls = [int(u) for u in args.unrolls.split(",") if u]

    rng = np.random.default_rng(0)
    blocks = [_rand_block(rng) for _ in range(DEPTH)]
    params = {"transformer_backbone":
              {f"h_{i}": b for i, b in enumerate(blocks)}}
    stacked = stack_trunk_params(params)["transformer_backbone"]["h_stacked"]
    blocks_q = [quantize_gpt2_block(b) for b in blocks]
    params_q = {"transformer_backbone":
                {f"h_{i}": b for i, b in enumerate(blocks_q)}}
    stacked_q = (stack_trunk_params(params_q)
                 ["transformer_backbone"]["h_stacked"])
    bias = jnp.zeros((L, L), jnp.float32)

    for tag, bs, stk, unrolled_fn, layers in (
            ("int8 bs32", 32, stacked_q, fused_gpt2_layers_int8, blocks_q),
            ("bf16 bs16", 16, stacked, fused_gpt2_layers, blocks)):
        if args.only and not tag.startswith(args.only):
            continue
        x = jnp.asarray(rng.normal(size=(bs, L, D)) * 0.3, jnp.bfloat16)
        for u in unrolls:
            ms, build = _time(
                lambda c, p, u=u: fused_gpt2_layers_scanned(
                    c, p, bias, N_A, N_Q, H, unroll=u), x, stk)
            print(f"{tag} scanned unroll={u}: {ms:8.2f} ms/apply "
                  f"(build {build:.0f}s)", flush=True)
        if args.skip_unrolled:
            continue
        ms, build = _time(
            lambda c, p, fn=unrolled_fn: fn(
                c, p, bias, N_A, N_Q, H), x, layers)
        print(f"{tag} unrolled (x{DEPTH}):  {ms:8.2f} ms/apply "
              f"(build {build:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
