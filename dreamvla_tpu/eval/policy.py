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

    def policy(params, image_primary, image_wrist, state, text, rng):
        # `text` is tokens (B, 77) when the model owns a text encoder,
        # otherwise precomputed CLIP features (B, 512)
        text_kw = ("text_tokens" if cfg.include_text_encoder
                   else "text_features")
        out = model.apply({"params": params}, image_primary, image_wrist,
                          state, mode="test", train=False,
                          **{text_kw: text})
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


def build_cached_policy_cores(model: DreamVLA):
    """Unjitted (encode_frame, trunk_step) pair for composition (scan/vmap).

    encode_frame(params, img_p (B,T,3,H,W), img_w) -> per-frame projected
    vision tokens; trunk_step consumes the (B,S,...) token history. Vision
    features are position-independent, so caching them across env steps is
    bit-identical to re-encoding the full history every step (which the
    reference does) at ~half the per-step FLOPs.
    """
    cfg = model.cfg
    head = None
    if cfg.use_dit_head:
        head = ActionDiffusionHead(model.action_diffusion_config(),
                                   build_dit(model.action_diffusion_config()))

    def encode_frame(params, img_p, img_w):
        return model.apply({"params": params}, img_p, img_w,
                           method=DreamVLA.encode_views)

    def encode_text(params, text_tokens):
        return model.apply({"params": params}, text_tokens,
                           method=lambda m, t: m.text_encoder(t))

    def trunk_step(params, img_tokens, cls_tokens, state, text_features, rng,
                   sel):
        """One policy step returning only the selected history position.

        `sel` (B,) int32 is the position the driver consumes (reference
        selects `num_step-1`, eval_utils_calvin.py:142-145) — so the DiT
        samples ONE position per env instead of all S (a 1/S cut of DDIM
        cost, the eval hot loop's second-largest term). Initial noise is
        drawn at the all-positions shape and row-sliced, keeping actions
        bit-identical to the full-recompute path (test_policy.py).
        Returns arm (B, steps, 6), grip (B, steps, 1).
        """
        # text features are per-rollout constants (the goal doesn't change):
        # encoded once via encode_text, not re-run through CLIP every step
        out = model.apply({"params": params}, img_tokens, cls_tokens, state,
                          text_features=text_features, mode="test", train=False,
                          method=DreamVLA.forward_from_tokens)
        b, s, aps, h = out.action_features.shape
        sel = jnp.asarray(sel, jnp.int32)
        if cfg.use_dit_head:
            z = jnp.take_along_axis(
                out.action_features, sel[:, None, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            rows = jnp.arange(b, dtype=jnp.int32) * s + sel
            samples = head.sample(params["action_model"], z, rng,
                                  noise_rows=rows, noise_n=b * s)
            arm, grip = samples[..., :6], samples[..., 6:]
        else:
            arm = jnp.take_along_axis(
                out.arm_action, sel[:, None, None, None], axis=1)[:, 0]
            grip = jnp.take_along_axis(
                out.gripper_action, sel[:, None, None, None], axis=1)[:, 0]
        return arm.astype(jnp.float32), grip.astype(jnp.float32)

    return encode_frame, trunk_step, encode_text


def build_cached_policy_fns(model: DreamVLA):
    """jitted (encode_frame, trunk_step, encode_text) triple
    (see build_cached_policy_cores)."""
    encode_frame, trunk_step, encode_text = build_cached_policy_cores(model)
    return jax.jit(encode_frame), jax.jit(trunk_step), jax.jit(encode_text)


class PolicyWrapper:
    """Host-side closed-loop driver around the jitted policy."""

    def __init__(self, model: DreamVLA, params, tokenizer=None,
                 env: str = "calvin", use_ensembling: bool = False,
                 ensembling_temp: float = 0.01, eval_max_steps: int = 600,
                 adaptive_ensemble: bool = False, gripper_width: bool = False,
                 feature_cache: bool = True, seed: int = 0):
        self.cfg = model.cfg
        self.params = params
        self.feature_cache = feature_cache
        if feature_cache:
            (self.encode_frame, self.trunk_step,
             self.encode_text) = build_cached_policy_fns(model)
        else:
            self.policy = build_policy_fn(model)
        # eval must never silently hash-tokenize (garbage embeddings)
        self.tokenizer = tokenizer or get_tokenizer(require_bpe=True)
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
        self.img_tokens: list = []  # feature-cache path: per-frame tokens
        self.cls_tokens: list = []
        self.states: list = []
        self.text_tokens: Optional[np.ndarray] = None
        self.text_features: Optional[np.ndarray] = None
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
        prim_t = clip_image_transform(prim[None].astype(np.uint8),
                                      self.cfg.image_size)[0]
        wrist_t = clip_image_transform(wrist[None].astype(np.uint8),
                                       self.cfg.image_size)[0]
        if self.feature_cache:
            it, ct = self.encode_frame(self.params,
                                       jnp.asarray(prim_t[None, None]),
                                       jnp.asarray(wrist_t[None, None]))
            self.img_tokens.append(np.asarray(it))
            self.cls_tokens.append(np.asarray(ct))
            if len(self.img_tokens) > self.history_len:
                self.img_tokens.pop(0)
                self.cls_tokens.pop(0)
        else:
            self.frames_primary.append(prim_t)
            self.frames_wrist.append(wrist_t)
            if len(self.frames_primary) > self.history_len:
                self.frames_primary.pop(0)
                self.frames_wrist.pop(0)
        self.states.append(state)
        if len(self.states) > self.history_len:
            self.states.pop(0)

    def _padded(self, seq: list, stacked: bool = False) -> np.ndarray:
        arr = np.concatenate(seq, axis=1) if stacked else np.stack(seq)[None]
        n = arr.shape[1]
        if n < self.history_len:
            pad = np.repeat(arr[:, -1:], self.history_len - n, axis=1)
            arr = np.concatenate([arr, pad], axis=1)
        return arr  # (1, S, ...)

    # --------------------------------------------------------------- step
    def step(self, obs: Dict, goal: str, timestep: int) -> np.ndarray:
        self._extract_obs(obs)
        if self.text_tokens is None:
            self.text_tokens = self.tokenizer([goal]).astype(np.int32)
            if self.feature_cache:
                # goal text is constant per rollout: encode once
                self.text_features = np.asarray(self.encode_text(
                    self.params, jnp.asarray(self.text_tokens)))
        num_step = len(self.states)
        sel = (num_step - 1 if num_step < self.history_len
               else self.history_len - 1)

        self.rng, sub = jax.random.split(self.rng)
        if self.feature_cache:
            arm, grip = self.trunk_step(
                self.params,
                jnp.asarray(self._padded(self.img_tokens, stacked=True)),
                jnp.asarray(self._padded(self.cls_tokens, stacked=True)),
                jnp.asarray(self._padded(self.states)),
                jnp.asarray(self.text_features),
                sub,
                jnp.asarray([sel], jnp.int32),
            )
            arm = np.asarray(arm)[0]    # (steps, 6)
            grip = np.asarray(grip)[0]  # (steps, 1)
        else:
            arm, grip = self.policy(
                self.params,
                jnp.asarray(self._padded(self.frames_primary)),
                jnp.asarray(self._padded(self.frames_wrist)),
                jnp.asarray(self._padded(self.states)),
                jnp.asarray(self.text_tokens),
                sub,
            )
            arm = np.asarray(arm)[0, sel]    # (steps, 6)
            grip = np.asarray(grip)[0, sel]  # (steps, 1)

        if self.use_ensembling:
            chunk = np.concatenate([arm, grip], axis=-1)  # (steps, 7)
            action = self.temporal.update_and_read(timestep, chunk)
            action = np.concatenate(
                [action[:6], (action[6:] > 0.5).astype(np.float32)])
            action[-1] = (action[-1] - 0.5) * 2
        else:
            action = np.concatenate(
                [arm[0], (grip[0] > 0.5).astype(np.float32)])
            action[-1] = (action[-1] - 0.5) * 2
            if self.adaptive is not None:
                action = self.adaptive.ensemble_action(action)
                action[-1] = 1 if action[-1] > 0 else -1

        self.gripper_state = np.array([action[-1]], np.float32)
        return action.astype(np.float32)


class BatchedPolicyWrapper:
    """Fixed-width batched closed-loop policy for parallel rollouts.

    The reference evaluates one env per GPU (eval.sh node_num=8); on TPU the
    batch-1 policy step is latency-floor-bound (~300 sequential small ops),
    so stepping K envs through ONE batched forward multiplies chunks/s/chip
    nearly for free (SURVEY §7 'host-sim throughput' hard part). Slots reset
    independently; padding/selection semantics per slot match PolicyWrapper.
    """

    def __init__(self, model: DreamVLA, params, batch: int, tokenizer=None,
                 env: str = "libero", use_ensembling: bool = False,
                 ensembling_temp: float = 0.01, eval_max_steps: int = 600,
                 gripper_width: bool = False, seed: int = 0):
        cfg = model.cfg
        self.cfg = cfg
        self.params = params
        self.batch = batch
        self.env = env
        self.gripper_width = gripper_width
        self.use_ensembling = use_ensembling
        # eval must never silently hash-tokenize (garbage embeddings)
        self.tokenizer = tokenizer or get_tokenizer(require_bpe=True)
        (self.encode_frame, self.trunk_step,
         self.encode_text) = build_cached_policy_fns(model)
        self.history_len = cfg.sequence_length
        aps = cfg.action_pred_steps
        self.temporal = [TemporalEnsembler(eval_max_steps, aps,
                                           temp=ensembling_temp)
                         for _ in range(batch)]
        self.rng = jax.random.PRNGKey(seed)
        s = self.history_len
        r2 = 2 * cfg.num_resampler_query
        self.img_hist = np.zeros((batch, s, r2, cfg.hidden_dim), np.float32)
        self.cls_hist = np.zeros((batch, s, 2, cfg.hidden_dim), np.float32)
        self.state_hist = np.zeros((batch, s, 8 if gripper_width else 7),
                                   np.float32)
        self.counts = np.zeros(batch, np.int32)
        self.text = np.zeros((batch, 77), np.int32)
        self.text_feats = np.zeros((batch, cfg.clip_embed_dim), np.float32)
        self.gripper_state = np.full((batch, 1), -1.0, np.float32)

    def reset_slot(self, i: int) -> None:
        self.counts[i] = 0
        self.gripper_state[i] = -1.0
        self.temporal[i].reset()

    def set_goal(self, i: int, goal: str) -> None:
        self.text[i] = self.tokenizer([goal]).astype(np.int32)[0]
        self.text_feats[i] = np.asarray(self.encode_text(
            self.params, jnp.asarray(self.text[i][None])))[0]

    def _extract(self, obs):
        from scipy.spatial.transform import Rotation as R

        if self.env == "libero":
            prim = obs["agentview_image"][::-1]
            wrist = obs["robot0_eye_in_hand_image"]
        else:
            prim = obs["rgb_obs"]["rgb_static"]
            wrist = obs["rgb_obs"]["rgb_gripper"]
        return prim, wrist, obs

    def step(self, obs_list, timesteps) -> np.ndarray:
        """obs_list: one obs dict per slot; timesteps: per-slot env step ids.
        Returns (batch, 7) actions."""
        from scipy.spatial.transform import Rotation as R

        prims, wrists = [], []
        for i, obs in enumerate(obs_list):
            prim, wrist, obs = self._extract(obs)
            prims.append(clip_image_transform(prim[None].astype(np.uint8),
                                              self.cfg.image_size)[0])
            wrists.append(clip_image_transform(wrist[None].astype(np.uint8),
                                               self.cfg.image_size)[0])
            if self.env == "libero":
                pos = np.asarray(obs["robot0_eef_pos"], np.float32)
                eul = R.from_quat(obs["robot0_eef_quat"]).as_euler("xyz")
                grip = (np.asarray(obs["robot0_gripper_qpos"], np.float32)
                        if self.gripper_width else self.gripper_state[i])
                state = np.concatenate([pos, eul, grip]).astype(np.float32)
            else:
                robot = np.asarray(obs["robot_obs"], np.float32)
                state = np.concatenate([robot[:6], robot[-1:]])
            n = int(self.counts[i])
            if n < self.history_len:
                # fill slot n and repeat-pad the tail
                self.state_hist[i, n:] = state
            else:
                self.state_hist[i] = np.roll(self.state_hist[i], -1, axis=0)
                self.state_hist[i, -1] = state

        it, ct = self.encode_frame(
            self.params,
            jnp.asarray(np.stack(prims)[:, None]),
            jnp.asarray(np.stack(wrists)[:, None]))
        it, ct = np.asarray(it), np.asarray(ct)
        for i in range(self.batch):
            n = int(self.counts[i])
            if n < self.history_len:
                self.img_hist[i, n:] = it[i, 0]
                self.cls_hist[i, n:] = ct[i, 0]
            else:
                self.img_hist[i] = np.roll(self.img_hist[i], -1, axis=0)
                self.cls_hist[i] = np.roll(self.cls_hist[i], -1, axis=0)
                self.img_hist[i, -1] = it[i, 0]
                self.cls_hist[i, -1] = ct[i, 0]
            self.counts[i] = n + 1

        self.rng, sub = jax.random.split(self.rng)
        sels = np.minimum(self.counts - 1,
                          self.history_len - 1).astype(np.int32)
        arm, grip = self.trunk_step(
            self.params, jnp.asarray(self.img_hist),
            jnp.asarray(self.cls_hist), jnp.asarray(self.state_hist),
            jnp.asarray(self.text_feats), sub, jnp.asarray(sels))
        arm, grip = np.asarray(arm), np.asarray(grip)  # (B, steps, 6/1)

        actions = np.zeros((self.batch, 7), np.float32)
        for i in range(self.batch):
            if self.use_ensembling:
                chunk = np.concatenate([arm[i], grip[i]], axis=-1)
                a = self.temporal[i].update_and_read(int(timesteps[i]), chunk)
                a = np.concatenate([a[:6], (a[6:] > 0.5).astype(np.float32)])
                a[-1] = (a[-1] - 0.5) * 2
            else:
                a = np.concatenate(
                    [arm[i, 0],
                     ((grip[i, 0] > 0.5).astype(np.float32) - 0.5) * 2])
            self.gripper_state[i] = a[-1]
            actions[i] = a
        return actions
