"""Host-side image preprocessing.

The reference uses the CLIP package's torchvision preprocess (bicubic resize
to 224, center crop, CLIP mean/std normalisation) via `preprocess_image`
(data_utils.py:175-179) and a nearest-resize for depth
(`depth_image_fn`, data_utils.py:3588-3605). Re-implemented with PIL +
numpy (no torch in the data path). RandomShiftsAug intentionally does NOT
live here — it runs on-device inside the train step
(`dreamvla_tpu.ops.augment`).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_image_transform(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """(T, H, W, 3) uint8 -> (T, 3, size, size) float32, CLIP-normalised.

    Bicubic resize of the shorter side to `size` + center crop, matching
    clip.load's preprocess.
    """
    out = np.empty((len(frames), size, size, 3), np.float32)
    for i, frame in enumerate(frames):
        img = Image.fromarray(frame)
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    out = (out - CLIP_MEAN) / CLIP_STD
    return out.transpose(0, 3, 1, 2)


def depth_to_tensor(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """(T, H, W) float -> (T, 1, size, size) float32 via nearest resize."""
    t, h, w = frames.shape
    yy = (np.arange(size) * h // size).clip(0, h - 1)
    xx = (np.arange(size) * w // size).clip(0, w - 1)
    resized = frames[:, yy[:, None], xx[None, :]]
    return resized[:, None].astype(np.float32)
