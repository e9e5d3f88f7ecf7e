"""Recorded-trace replay: PolicyWrapper vs a literal transcription of the
reference ModelWrapper semantics.

The oracle below transcribes the queue / repeat-pad / action-selection /
gripper-binarisation rules of the reference closed-loop drivers
(eval_utils_calvin.py:82-147, eval_utils_libero.py:94-179) as plain numpy
around the same jitted policy network. Driving both over one recorded
observation sequence checks the wrapper logic against data rather than
against a re-implementation of itself."""

import dataclasses
from collections import deque

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dreamvla_tpu.config import tiny_test
from dreamvla_tpu.data.tokenizer import get_tokenizer
from dreamvla_tpu.data.transforms import clip_image_transform
from dreamvla_tpu.eval.policy import PolicyWrapper, build_policy_fn
from dreamvla_tpu.models.dreamvla import DreamVLA
from dreamvla_tpu.utils.testing import cached_init, init_signature


SEQ = 4  # > tiny default so both pad phases (num_step < / >= S) are hit


@pytest.fixture(scope="module")
def policy_net():
    mcfg, _ = tiny_test()
    mcfg = dataclasses.replace(mcfg, sequence_length=SEQ,
                               include_text_encoder=True)
    model = DreamVLA(mcfg)
    b, s = 1, mcfg.sequence_length
    inputs = dict(
        image_primary=np.zeros((b, s, 3, 32, 32), np.float32),
        image_wrist=np.zeros((b, s, 3, 32, 32), np.float32),
        state=np.zeros((b, s, 7), np.float32),
        text_tokens=np.zeros((b, 77), np.int32))
    variables = cached_init(
        model, lambda: model.init({"params": jax.random.PRNGKey(0)},
                                  mode="test", train=False, **inputs),
        init_signature("test", ["params"], inputs))
    return model, variables["params"], mcfg


class ReferenceOracle:
    """eval_utils_calvin.ModelWrapper.step transcription (numpy).

    deques of per-step tensors with maxlen=history_len
    (eval_utils_calvin.py:62-65), repeat-pad of the LAST frame up to
    history_len (:119-126), `num_step - 1` selection while warm
    (:142-145), gripper `(x > 0.5) -> (x - 0.5) * 2` (:136-137)."""

    def __init__(self, model, params, env="calvin", image_size=32):
        self.cfg = model.cfg
        self.policy = build_policy_fn(model)
        self.params = params
        self.env = env
        self.image_size = image_size
        self.history_len = self.cfg.sequence_length
        self.img_queue = deque(maxlen=self.history_len)
        self.gripper_queue = deque(maxlen=self.history_len)
        self.state_queue = deque(maxlen=self.history_len)
        self.text_tokens = None
        self.gripper_state = np.array([-1.0], np.float32)
        self.tokenizer = get_tokenizer()
        self.rng = jax.random.PRNGKey(0)

    def step(self, obs, goal, timestep):
        if self.env == "calvin":
            image = obs["rgb_obs"]["rgb_static"]
            gripper = obs["rgb_obs"]["rgb_gripper"]
            robot = np.asarray(obs["robot_obs"], np.float32)
            state = np.concatenate([robot[:6], robot[-1:]])
        else:  # libero (eval_utils_libero.py:96-117)
            from scipy.spatial.transform import Rotation as R

            image = obs["agentview_image"][::-1]
            gripper = obs["robot0_eye_in_hand_image"]
            pos = np.asarray(obs["robot0_eef_pos"], np.float32)
            eul = R.from_quat(obs["robot0_eef_quat"]).as_euler("xyz")
            state = np.concatenate([pos, eul, self.gripper_state]
                                   ).astype(np.float32)
        self.img_queue.append(clip_image_transform(
            image[None].astype(np.uint8), self.image_size)[0])
        self.gripper_queue.append(clip_image_transform(
            gripper[None].astype(np.uint8), self.image_size)[0])
        self.state_queue.append(state)
        if self.text_tokens is None:
            self.text_tokens = self.tokenizer([goal]).astype(np.int32)

        image_primary = np.stack(self.img_queue)[None]
        image_wrist = np.stack(self.gripper_queue)[None]
        states = np.stack(self.state_queue)[None]
        num_step = image_primary.shape[1]
        if num_step < self.history_len:  # repeat-pad the LAST frame
            rep = self.history_len - num_step
            image_primary = np.concatenate(
                [image_primary, np.repeat(image_primary[:, -1:], rep, 1)], 1)
            image_wrist = np.concatenate(
                [image_wrist, np.repeat(image_wrist[:, -1:], rep, 1)], 1)
            states = np.concatenate(
                [states, np.repeat(states[:, -1:], rep, 1)], 1)

        self.rng, sub = jax.random.split(self.rng)
        arm, grip = self.policy(self.params, jnp.asarray(image_primary),
                                jnp.asarray(image_wrist), jnp.asarray(states),
                                jnp.asarray(self.text_tokens), sub)
        arm = np.asarray(arm)[0]    # (S, steps, 6)
        grip = np.asarray(grip)[0]  # (S, steps, 1)
        # action = cat(arm[:, 0], grip[:, 0] > 0.5); [...,-1] -> +-1
        action = np.concatenate(
            [arm[:, 0], (grip[:, 0] > 0.5).astype(np.float32)], axis=-1)
        action[:, -1] = (action[:, -1] - 0.5) * 2
        action = action[num_step - 1 if num_step < self.history_len else -1]
        self.gripper_state = np.array([action[-1]], np.float32)
        return action.astype(np.float32)


def record_calvin_trace(t=7, seed=3):
    rng = np.random.default_rng(seed)
    return [{"rgb_obs": {"rgb_static": rng.integers(0, 255, (200, 200, 3),
                                                    dtype=np.uint8),
                         "rgb_gripper": rng.integers(0, 255, (84, 84, 3),
                                                     dtype=np.uint8)},
             "robot_obs": rng.normal(size=15).astype(np.float32)}
            for _ in range(t)]


def record_libero_trace(t=7, seed=4):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(t):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        out.append({"agentview_image": rng.integers(0, 255, (128, 128, 3),
                                                    dtype=np.uint8),
                    "robot0_eye_in_hand_image": rng.integers(
                        0, 255, (128, 128, 3), dtype=np.uint8),
                    "robot0_eef_pos": rng.normal(size=3).astype(np.float32),
                    "robot0_eef_quat": q.astype(np.float32),
                    "robot0_gripper_qpos": rng.normal(size=2).astype(
                        np.float32)})
    return out


@pytest.mark.parametrize("feature_cache", [False, True])
def test_calvin_replay_matches_reference_semantics(policy_net,
                                                   feature_cache):
    model, params, mcfg = policy_net
    oracle = ReferenceOracle(model, params, env="calvin")
    pw = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                       env="calvin", feature_cache=feature_cache)
    trace = record_calvin_trace()
    for t, obs in enumerate(trace):
        want = oracle.step(obs, "push the button", t)
        got = pw.step(obs, "push the button", t)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"step {t}")
        assert got[-1] in (-1.0, 1.0)  # binarised gripper


def test_libero_replay_carried_gripper_and_flip(policy_net):
    model, params, mcfg = policy_net
    oracle = ReferenceOracle(model, params, env="libero")
    pw = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                       env="libero", feature_cache=False)
    trace = record_libero_trace()
    for t, obs in enumerate(trace):
        want = oracle.step(obs, "open the drawer", t)
        got = pw.step(obs, "open the drawer", t)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"step {t}")
    # the carried gripper state must equal the last emitted action's
    # gripper (eval_utils_libero.py:178)
    assert pw.gripper_state[0] == want[-1]


def test_libero_flip_changes_inputs(policy_net):
    """The vertical agentview flip is load-bearing
    (eval_utils_libero.py:96)."""
    model, params, _ = policy_net
    pw1 = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                        env="libero", feature_cache=False)
    pw2 = PolicyWrapper(model, params, tokenizer=get_tokenizer(),
                        env="libero", feature_cache=False)
    obs = record_libero_trace(1)[0]
    a1 = pw1.step(obs, "g", 0)
    obs_flipped = dict(obs, agentview_image=obs["agentview_image"][::-1])
    a2 = pw2.step(obs_flipped, "g", 0)
    assert not np.allclose(a1[:6], a2[:6])
