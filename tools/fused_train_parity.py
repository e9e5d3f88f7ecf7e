"""On-chip gradient parity + timing for the fused TRAIN trunk kernels.

tests/test_gpt2_fused_train.py proves the math in interpret mode at small
shapes; Mosaic compilation at the flagship shape (24L / D=1024 / L=930 /
16 heads) is a separate risk (lane-ragged intermediates, VMEM budget,
48-slice lane concats) that only the real chip can retire. This tool runs
the flagship trunk both ways and reports:

  parity (default) — gradients (dx + every block weight) from the fused
    train kernels (ops.gpt2_fused_train, bf16 compute, p=0) vs the unfused
    GPT2Block chain at bf16, each measured against an UNFUSED FLOAT32
    oracle: the fused path must sit at (or inside) the unfused bf16 path's
    distance from the oracle — the same "equidistant" criterion the
    inference kernels met (tests/test_gpt2_fused.py methodology).
    Dropout stays 0 here because the two paths draw different masks by
    design (flax nn.Dropout vs the kernels' counter-based hash mask);
    mask forward/backward consistency at p>0 is finite-difference-tested
    in the suite.

  --time — median fwd+bwd step time at p=0.1 (training reality), fused vs
    unfused, N scan steps per dispatch / median of repeats, the bench.py
    methodology (tunnel RTT swamps per-dispatch timing).

  --decoder — the same parity and (with --time) timing for the dream
    decoders' fused ViT-block kernels (ops.vit_fused_train) at the
    flagship decoder shape (B*S*views x 9+256 tokens x 1024): fused-bf16
    vs unfused-bf16 grads vs an unfused f32 oracle.

Measurement validity guards (same rationale as fused_action_parity.py):
  * asserts the backend is TPU — off-TPU both applies take the unfused
    path and every diff reads trivially 0;
  * proves the fused path actually engaged: the fused and unfused bf16
    gradient trees must NOT be bitwise equal (they differ at bf16
    rounding when the kernels run; they are the same program when the
    gate falls through).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/fused_train_parity.py \
       [--time] [--batch 2] [--steps 5] [--repeats 5]
(append, don't clobber PYTHONPATH: on axon hosts the TPU plugin itself is
found via PYTHONPATH, and replacing it silently falls back to CPU)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _grads(trunk, params, x, bias, w, fused, key):
    import jax
    import jax.numpy as jnp

    def loss(p, xx):
        y = trunk.apply({"params": p}, xx, bias, False, fused,
                        rngs={"dropout": key})
        return jnp.sum(y.astype(jnp.float32) * w)

    gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    return jax.device_get((gp, gx))


def _err_table(g_ref, g_bf16, g_fused):
    """Per-leaf max|diff| vs the f32 oracle, bf16-unfused vs bf16-fused."""
    import jax

    rows = []
    ref_l, _ = jax.tree.flatten_with_path(g_ref)
    bf_l = jax.tree.leaves(g_bf16)
    fu_l = jax.tree.leaves(g_fused)
    worst = 0.0
    for (path, r), b, f in zip(ref_l, bf_l, fu_l):
        r = np.asarray(r, np.float32)
        scale = max(float(np.max(np.abs(r))), 1e-12)
        eb = float(np.max(np.abs(np.asarray(b, np.float32) - r))) / scale
        ef = float(np.max(np.abs(np.asarray(f, np.float32) - r))) / scale
        rows.append((jax.tree_util.keystr(path), eb, ef))
        worst = max(worst, ef / max(eb, 1e-12))
    return rows, worst


def _decoder_main(args, bs):
    import time as _time

    import jax
    import jax.numpy as jnp
    import optax

    assert jax.default_backend() == "tpu", (
        f"backend is {jax.default_backend()!r}: run on chip")

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.decoders import ModalityDecoder

    cfg, _ = calvin_finetune()
    h, per = cfg.hidden_dim, cfg.num_obs_token_per_image
    q_in = h // 4 if cfg.share_query else h
    n = bs * cfg.sequence_length * 2
    rng_np = np.random.default_rng(0)
    q = jnp.asarray(rng_np.normal(size=(n, per, q_in)), jnp.float32)
    w = None  # set per-decoder below

    def build(dtype, fused):
        return ModalityDecoder(
            num_query_tokens=per, num_mask_tokens=cfg.num_mask_tokens,
            out_dim=cfg.patch_size ** 2 * 3, hidden_dim=h, in_dim=q_in,
            fused=fused, dtype=dtype)

    dec32 = build(jnp.float32, False)
    params = dec32.init(jax.random.PRNGKey(0), q)["params"]
    out_shape = dec32.apply({"params": params}, q).shape
    w = jnp.asarray(rng_np.normal(size=out_shape), jnp.float32)

    def grads(dec):
        def loss(p):
            return jnp.sum(dec.apply({"params": p}, q).astype(jnp.float32)
                           * w)
        return jax.device_get(jax.jit(jax.grad(loss))(params))

    if not args.time:
        print("building f32 oracle grads...", flush=True)
        go = grads(dec32)
        print("building unfused bf16 grads...", flush=True)
        gu = grads(build(jnp.bfloat16, False))
        print("building fused bf16 grads (first Pallas compile may take "
              "minutes)...", flush=True)
        gf = grads(build(jnp.bfloat16, True))
        same = all(jax.tree.leaves(jax.tree.map(
            lambda a, b: bool(np.all(np.asarray(a, np.float32)
                                     == np.asarray(b, np.float32))),
            gu, gf)))
        assert not same, ("unfused and fused grads BITWISE equal — the "
                          "fused path did not engage")
        rows, worst = _err_table(go, gu, gf)
        print(f"\n{'param':44s} {'bf16-unfused':>13s} {'bf16-fused':>11s}")
        for path, eb, ef in sorted(rows, key=lambda r: -r[2])[:12]:
            print(f"{path:44s} {eb:13.3e} {ef:11.3e}")
        print(f"\nworst fused/unfused oracle-error ratio: {worst:.2f}")
        ok = worst < 3.0
        print("PARITY " + ("OK" if ok else "FAIL"))
        raise SystemExit(0 if ok else 1)

    results = {}
    for tag, fused in (("unfused", False), ("fused", True)):
        dec = build(jnp.bfloat16, fused)

        @jax.jit
        def run(p, qq):
            def step(acc, i):
                def loss(pp):
                    y = dec.apply({"params": pp},  # noqa: B023
                                  qq + (i.astype(jnp.float32) * 1e-4))
                    return jnp.sum(jnp.square(y.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss)(p)
                return acc + l + optax.global_norm(g), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(args.steps))
            return acc

        t0 = _time.time()
        float(run(params, q))
        print(f"{tag}: built (+{_time.time() - t0:.0f}s)", flush=True)
        ts = []
        for _ in range(args.repeats):
            t0 = _time.perf_counter()
            float(run(params, q))
            ts.append((_time.perf_counter() - t0) / args.steps)
        ms = float(np.median(ts)) * 1e3
        results[tag] = ms
        print(f"{tag}: one decoder fwd+bwd {ms:.2f} ms (N{n})", flush=True)
    print(f"speedup: {results['unfused'] / results['fused']:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true",
                    help="timing mode (p=0.1) instead of gradient parity")
    ap.add_argument("--decoder", action="store_true",
                    help="test the decoder ViT-block kernels instead of "
                         "the trunk kernels")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2 for parity, 8 for --time")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    bs = args.batch or (8 if args.time else 2)

    if args.decoder:
        return _decoder_main(args, bs)

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", (
        f"backend is {jax.default_backend()!r}: off-TPU both applies take "
        "the unfused path and the comparison is meaningless — run on chip")

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.models.gpt2 import GPT2Trunk
    from dreamvla_tpu.ops.attention import BlockSplit, token_permutation
    from dreamvla_tpu.ops.masks import build_attention_bias

    cfg, _ = calvin_finetune()
    model = DreamVLA(cfg)
    s, d, L = cfg.sequence_length, cfg.hidden_dim, cfg.trunk_seq_len
    split = BlockSplit(k=s, na=cfg.num_a, nobs=cfg.total_query_tokens,
                       aps=cfg.action_pred_steps)
    perm = token_permutation(split)
    bias = build_attention_bias(model.mask_spec())
    bias = jnp.asarray(bias)[perm][:, perm]

    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    x32 = jnp.asarray(rng_np.normal(size=(bs, L, d)) * 0.3, jnp.float32)
    w = jnp.asarray(rng_np.normal(size=(bs, L, d)), jnp.float32)

    def build(dtype, dropout, init=True):
        trunk = GPT2Trunk(num_layers=cfg.transformer_layers,
                          num_heads=cfg.transformer_heads, dropout=dropout,
                          dtype=dtype, split=split)
        if not init:
            return trunk, None
        params = trunk.init({"params": key}, x32.astype(dtype), bias)["params"]
        return trunk, params

    if not args.time:
        # gradient parity at p=0: fused-bf16 vs unfused-bf16, both vs the
        # unfused f32 oracle
        trunk32, params = build(jnp.float32, 0.0)
        trunkbf, _ = build(jnp.bfloat16, 0.0, init=False)
        print("building f32 oracle grads...", flush=True)
        go_p, go_x = _grads(trunk32, params, x32, bias, w, False, key)
        print("building unfused bf16 grads...", flush=True)
        gu_p, gu_x = _grads(trunkbf, params, x32.astype(jnp.bfloat16), bias,
                            w, False, key)
        print("building fused bf16 grads (first Pallas compile: up to "
              "~9 min through the tunnel)...", flush=True)
        gf_p, gf_x = _grads(trunkbf, params, x32.astype(jnp.bfloat16), bias,
                            w, True, key)
        # the two bf16 programs must actually differ
        same = all(jax.tree.leaves(jax.tree.map(
            lambda a, b: bool(np.all(np.asarray(a, np.float32)
                                     == np.asarray(b, np.float32))),
            gu_p, gf_p)))
        assert not same, ("unfused and fused grads are BITWISE equal — the "
                          "fused path did not engage (check "
                          "supports_fused_trunk / backend)")
        rows, worst = _err_table(go_p, gu_p, gf_p)
        print(f"\n{'param':58s} {'bf16-unfused':>13s} {'bf16-fused':>11s}")
        bad = [r for r in rows if r[2] > 3.0 * max(r[1], 1e-7)]
        for path, eb, ef in sorted(rows, key=lambda r: -r[2])[:12]:
            print(f"{path:58s} {eb:13.3e} {ef:11.3e}")
        exb = float(np.max(np.abs(np.asarray(gu_x, np.float32)
                                  - np.asarray(go_x)))
                    / max(np.max(np.abs(np.asarray(go_x))), 1e-12))
        exf = float(np.max(np.abs(np.asarray(gf_x, np.float32)
                                  - np.asarray(go_x)))
                    / max(np.max(np.abs(np.asarray(go_x))), 1e-12))
        print(f"{'dx':58s} {exb:13.3e} {exf:11.3e}")
        print(f"\nworst fused/unfused oracle-error ratio: {worst:.2f}"
              f" ({len(bad)} leaves beyond 3x)")
        ok = worst < 3.0 and exf < 3.0 * max(exb, 1e-7)
        print("PARITY " + ("OK" if ok else "FAIL"))
        raise SystemExit(0 if ok else 1)

    # timing mode: realistic training apply (p=0.1), fused vs unfused
    import optax

    trunkbf, params = build(jnp.bfloat16, 0.1)
    xbf = x32.astype(jnp.bfloat16)
    n = args.steps

    def make(fused):
        def loss(p, xx, k):
            y = trunkbf.apply({"params": p}, xx, bias, False, fused,
                              rngs={"dropout": k})
            return jnp.sum(y.astype(jnp.float32) * w)

        @jax.jit
        def run(p, xx):
            def step(acc, i):
                l, g = jax.value_and_grad(loss)(p, xx, jax.random.fold_in(
                    key, i))
                return acc + l + optax.global_norm(g), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(n))
            return acc
        return run

    results = {}
    for tag, fused in (("unfused", False), ("fused", True)):
        run = make(fused)
        t0 = time.time()
        float(run(params, xbf))
        print(f"{tag}: built (+{time.time() - t0:.0f}s)", flush=True)
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(params, xbf))
            ts.append((time.perf_counter() - t0) / n)
        ms = float(np.median(ts)) * 1e3
        results[tag] = ms
        print(f"{tag}: trunk fwd+bwd {ms:.2f} ms (B{bs} L{L} p=0.1)",
              flush=True)
    print(f"speedup: {results['unfused'] / results['fused']:.2f}x")


if __name__ == "__main__":
    main()
