"""Measure end-to-end action drift of the fused / int8 trunk kernels.

Runs the flagship policy step twice on the real chip with identical
inputs and sampling rng, and reports the max/mean |action| difference:

  default:  fused trunk kernel vs unfused XLA trunk
            (cfg.fused_trunk_inference escape hatch), both bf16;
  --int8:   the int8 (W8A8) serving mode — quantized trunk, MAE encoder
            blocks and DiT head (quantize_trunk_params /
            quantize_encoder_params / quantize_dit_params) — vs the bf16
            fused path: the accuracy cost of the full quantized serving
            configuration.

The kernels are float32-oracle-anchored individually
(tests/test_gpt2_fused.py, tests/test_gpt2_fused_int8.py); this tool
bounds the COMPOSED effect on the actions the env consumes.

Measurement validity guards (both bitten in practice):
  * asserts the backend is TPU — the fused kernels gate on
    is_tpu_backend(), so off-TPU both runs take the XLA path and the
    diff reads trivially 0;
  * re-randomises the DiT head's zero-init output layer — at random init
    the DiT predicts eps=0 for ANY input (reference
    models/action_model/models.py zero-inits the final layer), so sampled
    actions would be conditioning-independent and drift would read 0;
  * proves the two compiled programs actually differ (HLO op counts).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/fused_action_parity.py
(append, don't clobber: on axon hosts the TPU plugin itself is found via
PYTHONPATH, and replacing it silently falls back to CPU)
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_fn
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.ops.gpt2_fused import quantize_trunk_params

    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="compare int8-fused vs bf16-fused (default: "
                         "bf16-fused vs bf16-unfused)")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", (
        f"backend is {jax.default_backend()!r}; run this on the chip")

    cfg, _ = calvin_finetune()
    rng = np.random.default_rng(0)
    b, s = 2, cfg.sequence_length
    ip = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    iw = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32)
    tt = jnp.asarray(rng.integers(0, 49408, size=(b, 77)), jnp.int32)

    model = DreamVLA(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        image_primary=ip, image_wrist=iw, state=st, text_tokens=tt,
        action_label=jnp.zeros((b, s, cfg.action_pred_steps, 7)),
        mode="train", train=False)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables["params"])
    # densify the DiT's zero-init eps head (see module docstring)
    from dreamvla_tpu.models.dit import densify_zero_init

    params = dict(params)
    params["action_model"] = densify_zero_init(params["action_model"],
                                               jax.random.PRNGKey(3))

    def run(tag, cfg_run, params_run):
        m = DreamVLA(cfg_run)
        compiled = build_policy_fn(m).lower(
            params_run, ip, iw, st, tt, jax.random.PRNGKey(7)).compile()
        hlo = compiled.as_text()
        stats = (hlo.count(" dot(") + hlo.count(" dot."),
                 hlo.count("custom-call"), hlo.count("s8"))
        print(f"{tag}: compiled HLO dots={stats[0]} custom-calls={stats[1]} "
              f"s8-refs={stats[2]}", flush=True)
        arm, grip = compiled(params_run, ip, iw, st, tt, jax.random.PRNGKey(7))
        return stats, (np.asarray(arm), np.asarray(grip))

    sa, a = run("bf16-fused", cfg, params)
    if args.int8:
        from dreamvla_tpu.models.dit import quantize_dit_params
        from dreamvla_tpu.ops.vit_fused import quantize_encoder_params

        params_q = quantize_encoder_params(quantize_trunk_params(params))
        params_q["action_model"] = quantize_dit_params(
            params_q["action_model"])
        sb, bv = run("int8-fused", cfg, params_q)
    else:
        sb, bv = run(
            "bf16-unfused",
            dataclasses.replace(cfg, fused_trunk_inference=False), params)
    assert sa != sb, (
        "identical compiled op counts: the two configurations did not "
        "produce different programs — the switch is not wired")

    arm_d = np.abs(a[0] - bv[0])
    grip_d = np.abs(a[1] - bv[1])
    arm_scale = np.abs(a[0]).max()
    print(f"arm:  max|diff| {arm_d.max():.3e}  mean {arm_d.mean():.3e}  "
          f"(scale {arm_scale:.3f})")
    print(f"grip: max|diff| {grip_d.max():.3e}  mean {grip_d.mean():.3e}")
    # binary gripper decisions must agree
    agree = ((a[1] > 0.5) == (bv[1] > 0.5)).mean()
    print(f"gripper open/close agreement: {agree * 100:.2f}%")


if __name__ == "__main__":
    main()
