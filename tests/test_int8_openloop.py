"""int8 (W8A8) serving-mode drift bound, end-to-end through the policy.

TPU-suite test (run with DREAMVLA_TPU_TESTS=1 on the chip; skipped on the
CPU suite — the int8 trunk/encoder paths are TPU-only by design,
models/gpt2.py:180-186). Complements the per-kernel int8 oracles
(test_gpt2_fused_int8, test_vit_fused_int8, test_dit_int8) with the
COMPOSED bound VERDICT r3 #5 asked for: quantized trunk + encoder + DiT
through the full policy step at a fused-path-supported config, asserting
the open-loop drift stays within the bounds documented in CAPABILITIES.md
(flagship numbers: tools/int8_openloop.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="int8 serving path is TPU-only (run with DREAMVLA_TPU_TESTS=1)")


def test_int8_policy_drift_bounded():
    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_fn
    from dreamvla_tpu.models.dit import (densify_zero_init,
                                         quantize_dit_params)
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.ops.gpt2_fused import (quantize_trunk_params,
                                             supports_fused_trunk)
    from dreamvla_tpu.ops.vit_fused import quantize_encoder_params
    from dreamvla_tpu.parallel.train_step import prepare_model_inputs
    from dreamvla_tpu.utils.testing import make_synthetic_batch

    cfg, tcfg = calvin_finetune()
    # flagship token layout, small trunk/vision: same fused+int8 dispatch,
    # minutes less tunnel compile time
    cfg = dataclasses.replace(cfg, transformer_layers=2, hidden_dim=256,
                              transformer_heads=4, vision_depth=2,
                              dit_type="DiT-S")
    k = cfg.sequence_length
    assert supports_fused_trunk(k * cfg.tokens_per_step, cfg.hidden_dim,
                                cfg.transformer_heads, k * cfg.num_a,
                                k * (cfg.num_a + cfg.total_query_tokens))

    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=1, seed=0)
    inp = prepare_model_inputs(cfg, jax.tree.map(jnp.asarray, batch))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        image_primary=inp["image_primary"], image_wrist=inp["image_wrist"],
        state=inp["state"], text_tokens=inp.get("text_tokens"),
        action_label=inp["action_label"], mode="train", train=False)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables["params"])
    params = dict(params)
    # zero-init eps head would make drift read trivially 0 (see
    # tools/fused_action_parity.py docstring)
    params["action_model"] = densify_zero_init(params["action_model"],
                                               jax.random.PRNGKey(3))
    params_q = quantize_encoder_params(quantize_trunk_params(params))
    params_q["action_model"] = quantize_dit_params(params_q["action_model"])

    policy = build_policy_fn(model)
    rng = jax.random.PRNGKey(7)
    arm_b, grip_b = policy(params, inp["image_primary"], inp["image_wrist"],
                           inp["state"], inp.get("text_tokens"), rng)
    arm_q, grip_q = policy(params_q, inp["image_primary"],
                           inp["image_wrist"], inp["state"],
                           inp.get("text_tokens"), rng)
    ab, aq = np.asarray(arm_b, np.float32), np.asarray(arm_q, np.float32)
    gb, gq = np.asarray(grip_b, np.float32), np.asarray(grip_q, np.float32)

    scale = np.abs(ab).max()
    assert scale > 0
    rel_mean = np.abs(ab - aq).mean() / scale
    flip_rate = ((gb > 0.5) != (gq > 0.5)).mean()
    # bounds mirror tools/int8_openloop.py defaults (flagship measured:
    # mean 0.35% / max 1.3% of scale, 100% gripper agreement)
    assert rel_mean <= 0.05, f"int8 arm drift {rel_mean:.4f} > 5% of scale"
    assert flip_rate <= 0.01, f"gripper flip rate {flip_rate:.4f} > 1%"


def test_stacked_serving_params_match_unrolled_on_chip():
    """The layer-stacked serving layout (stack_trunk_params +
    stack_encoder_params) produces the same policy outputs as the
    per-layer tree ON THE CHIP, for bf16 and int8 params — the on-chip
    counterpart of the interpret-mode bit-parity tests
    (test_gpt2_fused/test_vit_fused). Guards the transform the bench and
    eval CLI apply at param load."""
    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_fn
    from dreamvla_tpu.models.dit import quantize_dit_params
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.ops.gpt2_fused import (quantize_trunk_params,
                                             stack_trunk_params)
    from dreamvla_tpu.ops.vit_fused import (quantize_encoder_params,
                                            stack_encoder_params)
    from dreamvla_tpu.parallel.train_step import prepare_model_inputs
    from dreamvla_tpu.utils.testing import make_synthetic_batch

    cfg, tcfg = calvin_finetune()
    cfg = dataclasses.replace(cfg, transformer_layers=2, hidden_dim=256,
                              transformer_heads=4, vision_depth=2,
                              dit_type="DiT-S")
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=1, seed=1)
    inp = prepare_model_inputs(cfg, jax.tree.map(jnp.asarray, batch))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "diffusion": jax.random.PRNGKey(3)},
        image_primary=inp["image_primary"], image_wrist=inp["image_wrist"],
        state=inp["state"], text_tokens=inp.get("text_tokens"),
        action_label=inp["action_label"], mode="train", train=False)
    params = dict(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables["params"]))

    policy = build_policy_fn(model)
    rng = jax.random.PRNGKey(11)

    def run(p):
        arm, grip = policy(p, inp["image_primary"], inp["image_wrist"],
                           inp["state"], inp.get("text_tokens"), rng)
        return np.asarray(arm, np.float32), np.asarray(grip, np.float32)

    arm_u, grip_u = run(params)
    arm_s, grip_s = run(stack_encoder_params(stack_trunk_params(params)))
    np.testing.assert_array_equal(arm_s, arm_u)
    np.testing.assert_array_equal(grip_s, grip_u)

    params_q = quantize_encoder_params(quantize_trunk_params(params))
    params_q["action_model"] = quantize_dit_params(params_q["action_model"])
    arm_qu, grip_qu = run(params_q)
    arm_qs, grip_qs = run(
        stack_encoder_params(stack_trunk_params(params_q)))
    np.testing.assert_array_equal(arm_qs, arm_qu)
    np.testing.assert_array_equal(grip_qs, grip_qu)
