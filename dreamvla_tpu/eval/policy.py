"""Closed-loop policy wrapper: history buffering + one jitted step.

Capability parity with the reference ModelWrappers
(eval_utils_calvin.py:48-147, eval_utils_libero.py:46-179): a rolling
history of the last `sequence_length` observations, repeat-padded to a fixed
length; one trunk forward per env step (plus DDIM sampling with the DiT
head); CALVIN-style action selection (first chunk step of history position
num_step-1, gripper binarised (x>0.5)*2-1) and LIBERO-style temporal
ensembling with a carried gripper state.

TPU design: the device function has a single static shape — history padding
happens host-side in numpy, so jit traces exactly once per config; the DiT
DDIM loop is part of the same compiled function.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dreamvla_tpu.config import DreamVLAConfig
from dreamvla_tpu.data.tokenizer import get_tokenizer
from dreamvla_tpu.data.transforms import clip_image_transform
from dreamvla_tpu.eval.ensemble import AdaptiveEnsembler, TemporalEnsembler
from dreamvla_tpu.models.dit import ActionDiffusionHead, build_dit
from dreamvla_tpu.models.dreamvla import DreamVLA


def build_policy_core(model: DreamVLA) -> Callable:
    """Unjitted (params, frames..., rng) -> (arm (B,S,steps,6), grip
    (B,S,steps,1)): one full policy step (trunk + DiT sampling), composable
    under scan/vmap (bench.py runs it N times per dispatch)."""
    cfg = model.cfg
    head = None
    if cfg.use_dit_head:
        head = ActionDiffusionHead(model.action_diffusion_config(),
                                   build_dit(model.action_diffusion_config()))

    def policy(params, image_primary, image_wrist, state, text_tokens, rng):
        out = model.apply({"params": params}, image_primary, image_wrist,
                          state, text_tokens=text_tokens, mode="test",
                          train=False)
        if cfg.use_dit_head:
            b, s, aps, h = out.action_features.shape
            z = out.action_features.reshape(b * s, aps, h).astype(jnp.float32)
            samples = head.sample(params["action_model"], z, rng)
            arm = samples[..., :6].reshape(b, s, aps, 6)
            grip = samples[..., 6:].reshape(b, s, aps, 1)
        else:
            arm, grip = out.arm_action, out.gripper_action
        return arm.astype(jnp.float32), grip.astype(jnp.float32)

    return policy


def build_policy_fn(model: DreamVLA) -> Callable:
    """jitted single policy step (see build_policy_core)."""
    return jax.jit(build_policy_core(model))


class PolicyWrapper:
    """Host-side closed-loop driver around the jitted policy."""

    def __init__(self, model: DreamVLA, params, tokenizer=None,
                 env: str = "calvin", use_ensembling: bool = False,
                 ensembling_temp: float = 0.01, eval_max_steps: int = 600,
                 adaptive_ensemble: bool = False, gripper_width: bool = False,
                 seed: int = 0):
        self.cfg = model.cfg
        self.params = params
        self.policy = build_policy_fn(model)
        self.tokenizer = tokenizer or get_tokenizer()
        self.env = env
        self.use_ensembling = use_ensembling
        self.gripper_width = gripper_width
        self.history_len = self.cfg.sequence_length
        aps = self.cfg.action_pred_steps
        self.temporal = TemporalEnsembler(eval_max_steps, aps,
                                          temp=ensembling_temp)
        self.adaptive = (AdaptiveEnsembler(aps, 0.1)
                         if adaptive_ensemble else None)
        self.rng = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self) -> None:
        self.frames_primary: list = []
        self.frames_wrist: list = []
        self.states: list = []
        self.text_tokens: Optional[np.ndarray] = None
        self.gripper_state = np.array([-1.0], np.float32)
        self.temporal.reset()
        if self.adaptive:
            self.adaptive.reset()

    # ---------------------------------------------------------------- obs
    def _extract_obs(self, obs: Dict) -> None:
        if self.env == "calvin":
            prim = obs["rgb_obs"]["rgb_static"]
            wrist = obs["rgb_obs"]["rgb_gripper"]
            robot = np.asarray(obs["robot_obs"], np.float32)
            state = np.concatenate([robot[:6], robot[-1:]])
        elif self.env == "libero":
            from scipy.spatial.transform import Rotation as R

            prim = obs["agentview_image"][::-1]
            wrist = obs["robot0_eye_in_hand_image"]
            pos = np.asarray(obs["robot0_eef_pos"], np.float32)
            eul = R.from_quat(obs["robot0_eef_quat"]).as_euler("xyz")
            if self.gripper_width:
                grip = np.asarray(obs["robot0_gripper_qpos"], np.float32)
            else:
                grip = self.gripper_state
            state = np.concatenate([pos, eul, grip]).astype(np.float32)
        else:
            raise ValueError(self.env)
        self.frames_primary.append(
            clip_image_transform(prim[None].astype(np.uint8),
                                 self.cfg.image_size)[0])
        self.frames_wrist.append(
            clip_image_transform(wrist[None].astype(np.uint8),
                                 self.cfg.image_size)[0])
        self.states.append(state)
        if len(self.frames_primary) > self.history_len:
            self.frames_primary.pop(0)
            self.frames_wrist.pop(0)
            self.states.pop(0)

    def _padded(self, seq: list) -> np.ndarray:
        arr = np.stack(seq)
        n = len(seq)
        if n < self.history_len:
            pad = np.repeat(arr[-1:], self.history_len - n, axis=0)
            arr = np.concatenate([arr, pad], axis=0)
        return arr[None]  # (1, S, ...)

    # --------------------------------------------------------------- step
    def step(self, obs: Dict, goal: str, timestep: int) -> np.ndarray:
        self._extract_obs(obs)
        if self.text_tokens is None:
            self.text_tokens = self.tokenizer([goal]).astype(np.int32)
        num_step = len(self.frames_primary)

        self.rng, sub = jax.random.split(self.rng)
        arm, grip = self.policy(
            self.params,
            jnp.asarray(self._padded(self.frames_primary)),
            jnp.asarray(self._padded(self.frames_wrist)),
            jnp.asarray(self._padded(self.states)),
            jnp.asarray(self.text_tokens),
            sub,
        )
        arm = np.asarray(arm)[0]    # (S, steps, 6)
        grip = np.asarray(grip)[0]  # (S, steps, 1)
        sel = num_step - 1 if num_step < self.history_len else -1

        if self.use_ensembling:
            chunk = np.concatenate([arm[sel], grip[sel]], axis=-1)  # (steps, 7)
            action = self.temporal.update_and_read(timestep, chunk)
            action = np.concatenate(
                [action[:6], (action[6:] > 0.5).astype(np.float32)])
            action[-1] = (action[-1] - 0.5) * 2
        elif self.adaptive is not None:
            acts = np.concatenate(
                [arm[:, 0], (grip[:, 0] > 0.5).astype(np.float32)], axis=-1)
            acts[:, -1] = (acts[:, -1] - 0.5) * 2
            action = self.adaptive.ensemble_action(acts[sel])
            action[-1] = 1 if action[-1] > 0 else -1
        else:
            acts = np.concatenate(
                [arm[:, 0], (grip[:, 0] > 0.5).astype(np.float32)], axis=-1)
            acts[:, -1] = (acts[:, -1] - 0.5) * 2
            action = acts[sel]

        self.gripper_state = np.array([action[-1]], np.float32)
        return action.astype(np.float32)
