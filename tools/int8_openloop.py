"""Open-loop drift of the int8 (W8A8) serving mode vs the bf16 path.

VERDICT r3 #5: the int8 mode's accuracy story was one number at one config
(tools/fused_action_parity.py --int8: end-action drift on a single random
batch). This tool runs the evaluate_open_loop-style replay — recorded-
shaped windows through the full flagship policy step (eval semantics per
reference utils/eval_utils_calvin.py:135-145) — with bf16 and int8 params
on IDENTICAL inputs/rng across several batches and reports:

  * arm-chunk L1 between the two modes (absolute and relative to the
    bf16 action scale),
  * gripper open/close decision flip rate,
  * per-mode arm L1 vs the window's recorded action labels (the
    evaluate_open_loop metric) and its delta.

Exit code is nonzero if the drift exceeds the documented bounds
(--max_rel_drift / --max_flip_rate), so the tool is self-checking; the
same bounds are asserted in CI by tests/test_int8_openloop.py (TPU suite:
DREAMVLA_TPU_TESTS=1) at a smaller fused-path-supported config.

Run on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/int8_openloop.py
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_fn
    from dreamvla_tpu.models.dit import densify_zero_init, quantize_dit_params
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.ops.gpt2_fused import quantize_trunk_params
    from dreamvla_tpu.ops.vit_fused import quantize_encoder_params
    from dreamvla_tpu.parallel.train_step import prepare_model_inputs
    from dreamvla_tpu.utils.testing import make_synthetic_batch

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_rel_drift", type=float, default=0.05,
                    help="bound on mean |int8-bf16| arm drift / bf16 scale")
    ap.add_argument("--max_flip_rate", type=float, default=0.01,
                    help="bound on gripper decision flip rate")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", (
        f"backend is {jax.default_backend()!r}; the int8 serving path is "
        "TPU-only — run this on the chip")

    cfg, tcfg = calvin_finetune()
    model = DreamVLA(cfg)
    batch0 = make_synthetic_batch(cfg, tcfg, batch=args.batch_size, seed=0)
    inputs0 = prepare_model_inputs(cfg, jax.tree.map(jnp.asarray, batch0))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        image_primary=inputs0["image_primary"],
        image_wrist=inputs0["image_wrist"], state=inputs0["state"],
        text_tokens=inputs0.get("text_tokens"),
        action_label=inputs0["action_label"], mode="train", train=False)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables["params"])
    # densify the DiT's zero-init eps head: at raw init sampled actions are
    # conditioning-independent and drift reads trivially 0 (see
    # tools/fused_action_parity.py docstring)
    params = dict(params)
    params["action_model"] = densify_zero_init(params["action_model"],
                                               jax.random.PRNGKey(3))
    params_q = quantize_encoder_params(quantize_trunk_params(params))
    params_q["action_model"] = quantize_dit_params(params_q["action_model"])

    policy = build_policy_fn(model)
    s_eff = cfg.sequence_length - cfg.atten_goal
    drift_sum = drift_max = scale_max = 0.0
    flips = decisions = 0
    l1_b = l1_q = 0.0
    for i in range(args.batches):
        b = make_synthetic_batch(cfg, tcfg, batch=args.batch_size, seed=i)
        inp = prepare_model_inputs(cfg, jax.tree.map(jnp.asarray, b))
        rng = jax.random.PRNGKey(100 + i)
        out = {}
        for tag, p in (("bf16", params), ("int8", params_q)):
            arm, grip = policy(p, inp["image_primary"], inp["image_wrist"],
                               inp["state"], inp.get("text_tokens"), rng)
            out[tag] = (np.asarray(arm, np.float32),
                        np.asarray(grip, np.float32))
        (ab, gb), (aq, gq) = out["bf16"], out["int8"]
        d = np.abs(ab - aq)
        drift_sum += float(d.mean())
        drift_max = max(drift_max, float(d.max()))
        scale_max = max(scale_max, float(np.abs(ab).max()))
        db, dq = gb > 0.5, gq > 0.5
        flips += int((db != dq).sum())
        decisions += db.size
        labels = np.asarray(inp["action_label"], np.float32)
        l1_b += float(np.abs(ab[:, :s_eff]
                             - labels[:, :s_eff, :, :6]).mean())
        l1_q += float(np.abs(aq[:, :s_eff]
                             - labels[:, :s_eff, :, :6]).mean())
        print(f"[batch {i}] drift mean {d.mean():.4e} max {d.max():.4e} "
              f"flips {(db != dq).sum()}/{db.size}", flush=True)

    n = args.batches
    rel_mean = (drift_sum / n) / scale_max
    rel_max = drift_max / scale_max
    flip_rate = flips / max(decisions, 1)
    print(f"arm drift:   mean {drift_sum / n:.4e}  max {drift_max:.4e}  "
          f"(bf16 scale {scale_max:.3f} -> rel mean {rel_mean * 100:.2f}% "
          f"max {rel_max * 100:.2f}%)")
    print(f"gripper decision flip rate: {flip_rate * 100:.3f}% "
          f"({flips}/{decisions})")
    print(f"open-loop arm L1 vs labels: bf16 {l1_b / n:.4f}  "
          f"int8 {l1_q / n:.4f}  delta {abs(l1_q - l1_b) / n:.4e}")
    ok = rel_mean <= args.max_rel_drift and flip_rate <= args.max_flip_rate
    print(f"bounds: rel_mean <= {args.max_rel_drift}, flip_rate <= "
          f"{args.max_flip_rate} -> {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
