"""Measure end-to-end action drift of the fused trunk kernel.

Runs the flagship policy step twice on the real chip — fused trunk kernel
vs unfused XLA trunk (cfg.fused_trunk_inference) — with identical params,
inputs and sampling rng, and reports the max/mean |action| difference.
Both paths are bf16; the kernels are float32-oracle-anchored individually
(tests/test_gpt2_fused.py), and this tool bounds the COMPOSED effect on the
actions the env consumes.

Run: PYTHONPATH=/root/repo python tools/fused_action_parity.py
"""

from __future__ import annotations

import dataclasses

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_fn
    from dreamvla_tpu.models.dreamvla import DreamVLA

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

    outs = {}
    for fused in (True, False):
        m = DreamVLA(dataclasses.replace(cfg, fused_trunk_inference=fused))
        arm, grip = build_policy_fn(m)(params, ip, iw, st, tt,
                                       jax.random.PRNGKey(7))
        outs[fused] = (np.asarray(arm), np.asarray(grip))

    arm_d = np.abs(outs[True][0] - outs[False][0])
    grip_d = np.abs(outs[True][1] - outs[False][1])
    arm_scale = np.abs(outs[False][0]).max()
    print(f"arm:  max|diff| {arm_d.max():.5f}  mean {arm_d.mean():.6f}  "
          f"(scale {arm_scale:.3f})")
    print(f"grip: max|diff| {grip_d.max():.5f}  mean {grip_d.mean():.6f}")
    # binary gripper decisions must agree
    agree = ((outs[True][1] > 0.5) == (outs[False][1] > 0.5)).mean()
    print(f"gripper open/close agreement: {agree * 100:.2f}%")


if __name__ == "__main__":
    main()
