"""Metrics, meters and (optional) wandb reporting.

Capability parity with the reference's observability (SURVEY §5): step/data
AverageMeters (train_utils.py:77-83), samples/sec + samples/sec/chip
throughput (:614-637), per-term loss postfix, wandb scalars gated behind an
availability check (wandb is optional here; metrics always go to stdout).
jax.profiler hooks replace torch-side timing for device traces.
"""

from __future__ import annotations

import contextlib
import json
from typing import Dict, Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """stdout JSON-lines metrics + optional wandb mirroring."""

    def __init__(self, use_wandb: bool = False, project: str = "",
                 run_name: str = "", config: Optional[Dict] = None):
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, name=run_name, config=config or {})
                self.wandb = wandb
            except Exception as e:  # wandb not installed / offline
                print(f"[metrics] wandb unavailable ({e}); stdout only")

    def log(self, metrics: Dict[str, float], step: int) -> None:
        print(json.dumps({"step": step, **{k: round(float(v), 6)
                                           for k, v in metrics.items()}}),
              flush=True)
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_images(self, panels: Dict, step: int,
                   save_dir: Optional[str] = None) -> None:
        """pred-vs-label spot-check panels (train_utils.py:640-708 parity):
        to wandb when configured, else PNGs under save_dir."""
        if self.wandb is not None:
            self.wandb.log({k: self.wandb.Image(v) for k, v in panels.items()},
                           step=step)
        elif save_dir:
            import os

            from PIL import Image

            os.makedirs(save_dir, exist_ok=True)
            for k, v in panels.items():
                import numpy as np

                arr = (np.clip(v, 0, 1) * 255).astype("uint8")
                Image.fromarray(arr).save(
                    os.path.join(save_dir, f"{step}_{k.replace('/', '_')}.png"))


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    import jax

    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
