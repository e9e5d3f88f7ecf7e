"""Window collator: sample dicts -> the canonical window batch.

Mirrors the reference collator contract (data_utils.py:1308-1397, the
13-slot tuple) as named fields, with the reference's host-side work moved
where it belongs on TPU:

  * images are CLIP-preprocessed here (CPU, parallel over workers) but
    RandomShiftsAug runs on-device in the train step;
  * action chunk unfolding (collator :1360-1373) happens on-device
    (`parallel.train_step.action_chunks`) — the collator just trims frames
    to window_size+pred_num-1 and ships full-length actions;
  * gripper open/close is mapped {-1,1} -> {0,1} here for both states and
    actions (train_utils.py:131-138).

Output (B leading; W = window_size + pred_num - 1; Wa = W + act_step - 1):
  images_primary/images_wrist (B,W,3,224,224) f32
  depth_primary/depth_wrist   (B,W,1,224,224) f32      [if depth present]
  states (B,W,7|8) f32 — [tcp pos+eul(6), gripper{0,1} or widths]
  actions (B,Wa,7) f32 — rel actions, gripper in {0,1}
  text_tokens (B,77) i32
  dino_primary/dino_wrist (B,W,256,768), sam_* (B,W,256,256) [if present]
  tracks/tracks_gripper (B,W,G*G,2), track_vis* (B,W,G*G)    [if present]
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from dreamvla_tpu.data.transforms import (CLIP_MEAN, CLIP_STD,
                                          clip_image_transform,
                                          depth_to_tensor)


class WindowCollator:
    """image_mode='f32' (default): images ship CLIP-normalised float32.
    image_mode='u8': pre-processed samples (packed cache, `_preprocessed`)
    ship uint8 CHW (and float16 features as-is) for on-device decode
    (`parallel.train_step.decode_packed_batch`) — the host does memcpy
    only. Raw samples always take the f32 path regardless of mode."""

    def __init__(self, tokenizer, window_size: int, act_step: int,
                 pred_num: int = 1, image_size: int = 224,
                 gripper_width: bool = False, image_mode: str = "f32"):
        self.tokenizer = tokenizer
        self.window_size = window_size
        self.act_step = act_step
        self.pred_num = pred_num
        self.image_size = image_size
        self.gripper_width = gripper_width
        if image_mode not in ("f32", "u8"):
            raise ValueError(f"unknown image_mode {image_mode!r}")
        self.image_mode = image_mode

    def _prep_image(self, frames_u8: np.ndarray) -> np.ndarray:
        """(W,S,S,3) uint8 pre-cropped -> CHW, u8 or normalised f32."""
        if self.image_mode == "u8":
            return np.ascontiguousarray(frames_u8.transpose(0, 3, 1, 2))
        x = frames_u8.astype(np.float32) / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        return x.transpose(0, 3, 1, 2)

    @property
    def frame_window(self) -> int:
        return self.window_size + self.pred_num - 1

    def _states(self, robot_obs: np.ndarray) -> np.ndarray:
        """(W,15|7|8) raw proprio -> (W,7|8) model states."""
        arm = robot_obs[:, :6]
        if self.gripper_width:
            grip = robot_obs[:, 6:8]
        else:
            grip = (robot_obs[:, -1:] + 1) // 2  # {-1,1} -> {0,1}
        return np.concatenate([arm, grip], axis=-1).astype(np.float32)

    def __call__(self, samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
        w, wa = self.frame_window, self.frame_window + self.act_step - 1
        out: Dict[str, List[np.ndarray]] = {}

        def put(key, value):
            out.setdefault(key, []).append(value)

        for s in samples:
            if s.get("_preprocessed"):
                # packed-cache path: images are the stored uint8 CLIP crop,
                # depth already at model resolution
                put("images_primary", self._prep_image(s["rgb_static"][:w]))
                put("images_wrist", self._prep_image(s["rgb_gripper"][:w]))
                if "depth_static" in s:
                    put("depth_primary",
                        s["depth_static"][:w, None].astype(np.float32))
                    put("depth_wrist",
                        s["depth_gripper"][:w, None].astype(np.float32))
            else:
                put("images_primary",
                    clip_image_transform(s["rgb_static"][:w], self.image_size))
                put("images_wrist",
                    clip_image_transform(s["rgb_gripper"][:w], self.image_size))
                if "depth_static" in s:
                    put("depth_primary", depth_to_tensor(s["depth_static"][:w],
                                                         self.image_size))
                    put("depth_wrist", depth_to_tensor(s["depth_gripper"][:w],
                                                       self.image_size))
            put("states", self._states(s["robot_obs"][:w]))
            actions = s["rel_actions"][:wa].astype(np.float32).copy()
            actions[:, 6:] = (actions[:, 6:] + 1) // 2
            put("actions", actions)
            for key in ("dino_primary", "dino_wrist", "sam_primary",
                        "sam_wrist", "tracks", "tracks_gripper",
                        "track_vis", "track_vis_gripper"):
                if key in s:
                    arr = s[key][:w]
                    # u8 mode ships float16 features as-is (upcast happens
                    # on-device in decode_packed_batch)
                    put(key, arr if self.image_mode == "u8"
                        else arr.astype(np.float32))

        batch = {k: np.stack(v) for k, v in out.items()}
        batch["text_tokens"] = self.tokenizer([s["lang"] for s in samples])
        return batch
