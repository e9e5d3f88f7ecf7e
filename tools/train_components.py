"""Per-component train-step cost ledger at CALVIN-finetune shapes.

Times standalone fwd(+bwd) programs for each major step component so the
543 ms bs-8 step (tools/train_breakdown.py) decomposes into named
line-items — the profile that decides whether a fused trunk BACKWARD
kernel (the remaining big train lever) is worth building:

  encoder     frozen MAE fwd on all S frames x 2 views (no bwd — the
              model stop-gradients it, dreamvla.py:255);
  trunk       24L/1024 GPT-2 fwd and fwd+bwd at (B, L=930, D) under the
              role-split mask (reference gpt2.py:267-274);
  dit         DiT-B training loss (q_sample + eps-pred + MSE) fwd+bwd
              (reference action_model losses);
  decoders    dream-head decoders fwd+bwd at query shapes.

Methodology matches bench.py / train_breakdown.py: N steps inside one
on-device lax.scan per timed dispatch (tunnel RTT would swamp
per-dispatch timing), readback depends on every step, each program in
its own process (--only) to avoid cross-program OOM.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_components.py \
       [--batch 8] [--steps 5] [--repeats 5] [--only NAME]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

import numpy as np

COMPONENTS = ("encoder", "trunk_fwd", "trunk_bwd", "dit", "decoders")


def measure(tag, fn, *a, steps, repeats, items):
    import jax  # noqa: F401

    t0 = time.time()
    float(fn(*a))
    print(f"{tag}: built (+{time.time() - t0:.0f}s)", flush=True)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append((time.perf_counter() - t0) / steps)
    ms = float(np.median(ts)) * 1e3
    print(f"{tag}: {ms:.2f} ms ({items / (ms / 1e3):.1f} items/s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--only", choices=COMPONENTS)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny_test shapes on CPU — logic smoke only, "
                         "numbers are meaningless")
    args = ap.parse_args()

    if args.only is None:
        for tag in COMPONENTS:
            subprocess.run(
                [sys.executable, __file__, "--only", tag,
                 "--batch", str(args.batch), "--steps", str(args.steps),
                 "--repeats", str(args.repeats)]
                + (["--tiny"] if args.tiny else []), check=True)
        return

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune, tiny_test
    from dreamvla_tpu.models.dreamvla import DreamVLA

    if args.tiny:
        cfg, tcfg = tiny_test()
    else:
        assert jax.default_backend() == "tpu", (
            f"backend is {jax.default_backend()!r}; run this on the chip")
        cfg, tcfg = calvin_finetune()
    model = DreamVLA(cfg)
    bs, s, n = args.batch, cfg.sequence_length, args.steps
    d, L = cfg.hidden_dim, cfg.trunk_seq_len
    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)

    def scan_n(body):
        @jax.jit
        def run(*a):
            def step(acc, i):
                return acc + body(i, *a), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(n))
            return acc
        return run

    if args.only == "encoder":
        # frozen path: all S frames x 2 views through MAE ViT-B, as the
        # train fwd runs it (encode_views), bf16 like the model's dtype
        hw = cfg.image_size
        imgs = jnp.asarray(rng_np.normal(size=(bs, s, 3, hw, hw)),
                           jnp.float32)
        variables = model.init(
            {"params": key}, method=model.encode_views,
            image_primary=imgs, image_wrist=imgs)

        def body(i, params):
            it, ct = model.apply({"params": params}, method=model.encode_views,
                                 image_primary=imgs + i * 1e-4,
                                 image_wrist=imgs)
            return jnp.sum(it.astype(jnp.float32)) + jnp.sum(
                ct.astype(jnp.float32))

        measure("encoder fwd (frozen)", scan_n(body), variables["params"],
                steps=n, repeats=args.repeats, items=bs)
        return

    # trunk / dit / decoders operate on synthetic trunk-shaped tensors
    from dreamvla_tpu.models.gpt2 import GPT2Trunk
    from dreamvla_tpu.ops.attention import BlockSplit
    from dreamvla_tpu.ops.masks import build_attention_bias
    from dreamvla_tpu.ops.attention import token_permutation

    if args.only.startswith("trunk"):
        split = None
        if cfg.trunk_token_reorder and cfg.total_query_tokens > 0:
            split = BlockSplit(k=s, na=cfg.num_a,
                               nobs=cfg.total_query_tokens,
                               aps=cfg.action_pred_steps)
        trunk = GPT2Trunk(num_layers=cfg.transformer_layers,
                          num_heads=cfg.transformer_heads,
                          dropout=cfg.dropout,
                          dtype=jnp.dtype(cfg.compute_dtype), split=split)
        x = jnp.asarray(rng_np.normal(size=(bs, L, d)),
                        jnp.dtype(cfg.compute_dtype))
        bias = build_attention_bias(model.mask_spec())
        if split is not None:
            perm = token_permutation(split)
            bias = bias[perm][:, perm]
        variables = trunk.init({"params": key}, x, bias)
        params = variables["params"]

        def fwd(i, params):
            y = trunk.apply({"params": params}, x + (i * 1e-4).astype(x.dtype),
                            bias)
            return jnp.sum(y.astype(jnp.float32))

        if args.only == "trunk_fwd":
            measure(f"trunk fwd (B{bs} L{L})", scan_n(fwd), params,
                    steps=n, repeats=args.repeats, items=bs)
        else:
            def fb(i, params):
                l, g = jax.value_and_grad(lambda p: fwd(i, p))(params)
                import optax
                return l + optax.global_norm(g)
            measure(f"trunk fwd+bwd (B{bs} L{L})", scan_n(fb), params,
                    steps=n, repeats=args.repeats, items=bs)
        return

    if args.only == "dit":
        import optax

        from dreamvla_tpu.models.dit import ActionDiffusionHead, build_dit

        dcfg = model.action_diffusion_config()
        dit = build_dit(dcfg, dtype=jnp.dtype(cfg.compute_dtype))
        head = ActionDiffusionHead(dcfg, dit)
        z = jnp.asarray(rng_np.normal(size=(bs * s, cfg.action_pred_steps, d)),
                        jnp.float32)
        act = jnp.asarray(rng_np.normal(size=(bs * s, cfg.action_pred_steps,
                                              7)), jnp.float32)
        t0 = jnp.zeros((bs * s,), jnp.int32)
        params = dit.init({"params": key}, act, t0, z, train=False)["params"]

        def body(i, params):
            def f(p):
                def call(x_t, t, zz, drop_rng):
                    return dit.apply({"params": p}, x_t, t, zz, train=True,
                                     drop_rng=drop_rng)
                return head.loss(call, act + i * 1e-4, z,
                                 jax.random.fold_in(key, i))
            l, g = jax.value_and_grad(f)(params)
            return l + optax.global_norm(g)

        measure(f"dit train loss fwd+bwd (N={bs * s} x{dcfg.repeated_diffusion_steps} reps)",
                scan_n(body), params, steps=n, repeats=args.repeats, items=bs)
        return

    if args.only == "decoders":
        from dreamvla_tpu.models.decoders import ModalityDecoder

        per = cfg.num_obs_token_per_image
        dec = ModalityDecoder(num_query_tokens=per,
                              num_mask_tokens=cfg.num_mask_tokens,
                              out_dim=cfg.patch_size ** 2 * 3, hidden_dim=d,
                              in_dim=d // 4 if cfg.share_query else d,
                              dtype=jnp.dtype(cfg.compute_dtype))
        q = jnp.asarray(
            rng_np.normal(size=(bs * s * 2, per,
                                d // 4 if cfg.share_query else d)),
            jnp.float32)
        params = dec.init(key, q)

        def body(i, params):
            def f(p):
                y = dec.apply(p, q + i * 1e-4)
                return jnp.sum(jnp.square(y.astype(jnp.float32)))
            l, g = jax.value_and_grad(f)(params)
            import optax
            return l + optax.global_norm(g)

        measure(f"image decoder fwd+bwd (x{2})", scan_n(body), params,
                steps=n, repeats=args.repeats, items=bs)
        return


if __name__ == "__main__":
    main()
