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

from dreamvla_tpu.data.transforms import clip_image_transform, depth_to_tensor


class WindowCollator:
    def __init__(self, tokenizer, window_size: int, act_step: int,
                 pred_num: int = 1, image_size: int = 224,
                 gripper_width: bool = False):
        self.tokenizer = tokenizer
        self.window_size = window_size
        self.act_step = act_step
        self.pred_num = pred_num
        self.image_size = image_size
        self.gripper_width = gripper_width

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
                    put(key, s[key][:w].astype(np.float32))

        batch = {k: np.stack(v) for k, v in out.items()}
        batch["text_tokens"] = self.tokenizer([s["lang"] for s in samples])
        return batch
