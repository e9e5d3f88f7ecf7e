"""Closed-loop policy wrapper tests (no simulator): history padding, action
selection, ensembling — driven with recorded synthetic observations."""

import dataclasses

import jax
import numpy as np
import pytest

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.eval.ensemble import AdaptiveEnsembler, TemporalEnsembler
from dreamvla_tpu.data.tokenizer import get_tokenizer
from dreamvla_tpu.eval.policy import PolicyWrapper
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.utils.testing import cached_init, init_signature


def make_calvin_obs(rng, t):
    return {
        "rgb_obs": {
            "rgb_static": rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
            "rgb_gripper": rng.integers(0, 255, (84, 84, 3), dtype=np.uint8),
        },
        "robot_obs": rng.normal(size=15).astype(np.float32),
    }


@pytest.fixture(scope="module")
def wrapper():
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, include_text_encoder=True)
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 1, cfg.sequence_length
    inputs = dict(
        image_primary=np.zeros((b, s, 3, 32, 32), np.float32),
        image_wrist=np.zeros((b, s, 3, 32, 32), np.float32),
        state=np.zeros((b, s, 7), np.float32),
        text_tokens=np.zeros((b, 77), np.int32),
    )
    variables = cached_init(
        model, lambda: model.init({"params": jax.random.PRNGKey(0)},
                                  mode="test", train=False, **inputs),
        init_signature("test", ["params"], inputs))
    return model, variables["params"]


def test_calvin_step_contract(wrapper):
    model, params = wrapper
    pw = PolicyWrapper(model, params, tokenizer=get_tokenizer(), env="calvin")
    rng = np.random.default_rng(1)
    pw.reset()
    actions = [pw.step(make_calvin_obs(rng, t), "push the button", t)
               for t in range(5)]
    for a in actions:
        assert a.shape == (7,)
        assert a[-1] in (-1.0, 1.0)  # binarised gripper
        assert np.isfinite(a).all()


def test_policy_step_deterministic(wrapper):
    """The MLP-head policy is deterministic: identical histories after reset
    must produce identical actions (the jitted step has no hidden state)."""
    model, params = wrapper
    pw = PolicyWrapper(model, params, tokenizer=get_tokenizer(), env="calvin")
    rng = np.random.default_rng(2)
    obs = [make_calvin_obs(rng, t) for t in range(3)]
    pw.reset()
    run1 = [pw.step(o, "task", t) for t, o in enumerate(obs)]
    pw.reset()
    run2 = [pw.step(o, "task", t) for t, o in enumerate(obs)]
    for a, b in zip(run1, run2):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_temporal_ensembler_math():
    te = TemporalEnsembler(max_steps=10, action_horizon=3, dim=2, temp=0.01)
    c0 = np.array([[1.0, 1], [2, 2], [3, 3]], np.float32)
    a0 = te.update_and_read(0, c0)
    np.testing.assert_allclose(a0, [1, 1])  # only one populated chunk
    c1 = np.array([[10.0, 10], [20, 20], [30, 30]], np.float32)
    a1 = te.update_and_read(1, c1)
    # chunks covering t=1: chunk@0 step1 = [2,2], chunk@1 step0 = [10,10]
    w = np.exp(-0.01 * np.arange(2))
    w = w / w.sum()
    np.testing.assert_allclose(a1, w[0] * np.array([2, 2]) + w[1] * np.array([10, 10]),
                               rtol=1e-6)


def test_adaptive_ensembler_math():
    ae = AdaptiveEnsembler(pred_action_horizon=3, adaptive_ensemble_alpha=0.1)
    c = np.array([[1.0, 0], [0, 1], [1, 1]], np.float32)
    a0 = ae.ensemble_action(c)
    np.testing.assert_allclose(a0, c[0])  # single chunk -> its step 0
    a1 = ae.ensemble_action(c)
    # history: [c(age1), c(age0)] -> preds = [c[1], c[0]]; ref = c[0]
    preds = np.stack([c[1], c[0]])
    ref = preds[1]
    cos = (preds @ ref) / (np.linalg.norm(preds, axis=1) * np.linalg.norm(ref) + 1e-7)
    w = np.exp(0.1 * cos)
    w = w / w.sum()
    np.testing.assert_allclose(a1, (w[:, None] * preds).sum(0), rtol=1e-6)


def test_feature_cache_matches_full_recompute(wrapper):
    """Feature-cached stepping must produce bit-identical actions to the
    reference-style full re-encode of the history every step."""
    model, params = wrapper
    rng = np.random.default_rng(5)
    obs = [make_calvin_obs(rng, t) for t in range(5)]
    pw_full = PolicyWrapper(model, params, tokenizer=get_tokenizer(), env="calvin", feature_cache=False)
    pw_cache = PolicyWrapper(model, params, tokenizer=get_tokenizer(), env="calvin", feature_cache=True)
    pw_full.reset()
    pw_cache.reset()
    for t, o in enumerate(obs):
        a_full = pw_full.step(o, "task", t)
        a_cache = pw_cache.step(o, "task", t)
        np.testing.assert_allclose(a_cache, a_full, atol=1e-5)


def test_batched_wrapper_matches_single(wrapper):
    """K=2 batched slots must reproduce two independent single-env runs."""
    from dreamvla_tpu.eval.policy import BatchedPolicyWrapper

    model, params = wrapper
    rng = np.random.default_rng(7)
    obs_a = [make_calvin_obs(rng, t) for t in range(4)]
    obs_b = [make_calvin_obs(rng, t) for t in range(4)]

    singles = []
    for obs_seq in (obs_a, obs_b):
        pw = PolicyWrapper(model, params, tokenizer=get_tokenizer(), env="calvin")
        pw.reset()
        singles.append([pw.step(o, "task", t) for t, o in enumerate(obs_seq)])

    bw = BatchedPolicyWrapper(model, params, tokenizer=get_tokenizer(),
                              batch=2, env="calvin")
    bw.reset_slot(0)
    bw.reset_slot(1)
    bw.set_goal(0, "task")
    bw.set_goal(1, "task")
    for t in range(4):
        acts = bw.step([obs_a[t], obs_b[t]], np.array([t, t]))
        np.testing.assert_allclose(acts[0], singles[0][t], atol=1e-4)
        np.testing.assert_allclose(acts[1], singles[1][t], atol=1e-4)


def test_batched_libero_rollout_loop(wrapper):
    from dreamvla_tpu.eval.libero import evaluate_tasks_batched

    model, params = wrapper

    class FakeBatchedPolicy:
        def __init__(self):
            self.calls = 0

        def reset_slot(self, i):
            pass

        def set_goal(self, i, g):
            pass

        def step(self, obs_list, steps):
            self.calls += 1
            return np.zeros((len(obs_list), 7), np.float32)

    class FakeEnv:
        def __init__(self, done_at):
            self.t, self.done_at = 0, done_at

        def step(self, a):
            self.t += 1
            return {"t": self.t}, 0.0, self.t >= self.done_at, {}

    envs = [FakeEnv(3), FakeEnv(10**9)]
    succ = evaluate_tasks_batched(envs, FakeBatchedPolicy(), 6,
                                  ["a", "b"], [{"t": 0}, {"t": 0}])
    assert succ == [1, 0]


def test_feature_cache_parity_with_dit_head():
    """With the DiT head, the cached path samples ONLY the selected history
    position — the row-sliced initial noise must keep actions bit-identical
    to the full-recompute path that samples every position."""
    cfg, _ = tiny_test()
    cfg = dataclasses.replace(cfg, include_text_encoder=True,
                              use_dit_head=True, dit_type="DiT-S")
    model = DreamVLA(cfg)
    b, s = 1, cfg.sequence_length
    inputs = dict(
        image_primary=np.zeros((b, s, 3, 32, 32), np.float32),
        image_wrist=np.zeros((b, s, 3, 32, 32), np.float32),
        state=np.zeros((b, s, 7), np.float32),
        text_tokens=np.zeros((b, 77), np.int32),
        action_label=np.zeros((b, s, cfg.action_pred_steps, 7), np.float32),
    )
    variables = cached_init(
        model, lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)},
            mode="train", train=False, **inputs),
        init_signature("train", ["params", "diffusion"], inputs))
    params = dict(variables["params"])
    # at init the DiT's eps head is all-zero and actions ignore the feature
    # path entirely — densify so a feature-cache bug actually shows up here
    from dreamvla_tpu.models.dit import densify_zero_init
    params["action_model"] = densify_zero_init(params["action_model"],
                                               jax.random.PRNGKey(9))
    rng = np.random.default_rng(5)
    obs = [make_calvin_obs(rng, t) for t in range(4)]
    pw_full = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                            env="calvin", feature_cache=False, seed=3)
    pw_cache = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                             env="calvin", feature_cache=True, seed=3)
    for t, o in enumerate(obs):
        a_full = pw_full.step(o, "task", t)
        a_cache = pw_cache.step(o, "task", t)
        np.testing.assert_allclose(a_cache, a_full, atol=1e-5,
                                   err_msg=f"step {t}")
