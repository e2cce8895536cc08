"""KITTI disparity PNG IO.

Reference: the KITTI branches of dataloader/dataset.py and the submission
writer in predict.py (SURVEY.md §2 #9, #13): KITTI stores disparity as
uint16 PNG with value = disparity * 256 and 0 = invalid.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_image(path: str) -> np.ndarray:
    """Read an RGB image -> float32 (H, W, 3) in [0, 255]."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32)


def read_disparity_png(path: str) -> np.ndarray:
    """Read a KITTI uint16 disparity PNG -> float32 (H, W) in pixels.

    Zero pixels (no ground truth) are returned as 0.0 — the loss masks them
    out via the valid mask (0 < gt < max_disp), as the reference does.
    """
    with Image.open(path) as im:
        arr = np.asarray(im, dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError(f"{path}: expected single-channel disparity PNG")
    return arr / 256.0


def write_disparity_png(path: str, disparity: np.ndarray) -> None:
    """Write a disparity map (H, W) as KITTI-submission uint16 PNG."""
    arr = np.clip(np.asarray(disparity, dtype=np.float32) * 256.0, 0, 65535)
    Image.fromarray(arr.astype(np.uint16)).save(path)
