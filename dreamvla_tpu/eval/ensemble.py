"""Action ensembling strategies for closed-loop eval.

Capability parity:
  * AdaptiveEnsembler — cosine-similarity-weighted averaging over a deque of
    past chunk predictions (reference models/action_ensemble.py:10-43; used
    off-by-default in eval_utils_calvin.py:68-71).
  * TemporalEnsembler — the LIBERO all_time_actions matrix with exponential
    weights exp(-temp * age) (eval_utils_libero.py:76-90, :159-176).
"""

from __future__ import annotations

from collections import deque

import numpy as np


class AdaptiveEnsembler:
    def __init__(self, pred_action_horizon: int,
                 adaptive_ensemble_alpha: float = 0.0):
        self.pred_action_horizon = pred_action_horizon
        self.alpha = adaptive_ensemble_alpha
        self.history: deque = deque(maxlen=pred_action_horizon)

    def reset(self) -> None:
        self.history.clear()

    def ensemble_action(self, cur_action: np.ndarray) -> np.ndarray:
        """cur_action: (horizon, D) chunk (or (D,) single action)."""
        self.history.append(cur_action)
        n = len(self.history)
        if cur_action.ndim == 1:
            preds = np.stack(self.history)
        else:
            # chunk i steps ago contributes its i-th action for "now"
            preds = np.stack([chunk[age] for age, chunk
                              in zip(range(n - 1, -1, -1), self.history)])
        ref = preds[n - 1]
        cos = (preds @ ref) / (np.linalg.norm(preds, axis=1)
                               * np.linalg.norm(ref) + 1e-7)
        w = np.exp(self.alpha * cos)
        w = w / w.sum()
        return (w[:, None] * preds).sum(axis=0)


class TemporalEnsembler:
    """Exponentially-weighted average over all chunks covering the current
    timestep (ACT-style), matching the LIBERO eval matrix semantics."""

    def __init__(self, max_steps: int, action_horizon: int, dim: int = 7,
                 temp: float = 0.01):
        self.max_steps = max_steps
        self.horizon = action_horizon
        self.dim = dim
        self.temp = temp
        self.reset()

    def reset(self) -> None:
        self.all_time_actions = np.zeros(
            (self.max_steps, self.max_steps + self.horizon, self.dim),
            np.float32)

    def update_and_read(self, timestep: int, chunk: np.ndarray) -> np.ndarray:
        """chunk: (horizon, dim) prediction made at `timestep`; returns the
        ensembled action for `timestep`."""
        self.all_time_actions[timestep, timestep:timestep + self.horizon] = chunk
        cur = self.all_time_actions[:, timestep]
        populated = np.all(cur != 0, axis=1)
        cur = cur[populated]
        w = np.exp(-self.temp * np.arange(len(cur)))
        w = w / w.sum()
        return (cur * w[:, None]).sum(axis=0)
