"""Debug visuals: panel grids and 68-keypoint stickman drawing.

Reference: the ~40-panel debug grid assembled per visuals_freq iters (get_visuals,
va_losses_and_visuals.py:914-1054) and the stickman keypoint rasterizer (:1057-1106),
logged to disk + W&B (utils/logger_wandb.py:191-224). Host-side numpy — visuals never
enter the jitted graph.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# 68-landmark connectivity (iBUG): jaw, brows, nose, eyes, lips
_SEGMENTS: Tuple[Tuple[int, int, bool], ...] = (
    (0, 17, False),    # jaw
    (17, 22, False),   # right brow
    (22, 27, False),   # left brow
    (27, 31, False),   # nose bridge
    (31, 36, False),   # nostrils
    (36, 42, True),    # right eye
    (42, 48, True),    # left eye
    (48, 60, True),    # outer lips
    (60, 68, True),    # inner lips
)


def _draw_line(img: np.ndarray, p0, p1, color) -> None:
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    ys = np.linspace(p0[1], p1[1], n)
    xs = np.linspace(p0[0], p1[0], n)
    yi = np.clip(ys.round().astype(int), 0, h - 1)
    xi = np.clip(xs.round().astype(int), 0, w - 1)
    img[yi, xi] = color


def draw_stickman(keypoints: np.ndarray, image_size: int) -> np.ndarray:
    """(68, 2|3) normalized [-1,1] keypoints -> (S, S, 3) stickman image in [0,1]."""
    img = np.zeros((image_size, image_size, 3), np.float32)
    pts = (keypoints[:, :2] + 1.0) * 0.5 * (image_size - 1)
    colors = [(0, 1, 0), (1, 0, 0), (1, 0, 0), (0, 0, 1), (0, 0, 1),
              (1, 1, 0), (1, 1, 0), (1, 0, 1), (1, 0, 1)]
    for (s, e, closed), color in zip(_SEGMENTS, colors):
        for i in range(s, e - 1):
            _draw_line(img, pts[i], pts[i + 1], color)
        if closed:
            _draw_line(img, pts[e - 1], pts[s], color)
    return img


def draw_stickman_batch(keypoints: np.ndarray, image_size: int) -> np.ndarray:
    return np.stack([draw_stickman(k, image_size) for k in np.asarray(keypoints)])


def make_visuals_grid(panels: Dict[str, np.ndarray],
                      max_items: int = 4) -> np.ndarray:
    """Assemble a row-per-tensor debug grid from named image batches
    (reference get_visuals layout). Each value: (B, H, W, 3) in [0,1]. Returns one
    (rows*H, cols*W, 3) image."""
    names = list(panels)
    rows: List[np.ndarray] = []
    width = None
    for name in names:
        batch = np.asarray(panels[name])[:max_items]
        if batch.ndim == 3:
            batch = batch[None]
        if batch.shape[-1] == 1:
            batch = np.repeat(batch, 3, axis=-1)
        row = np.concatenate(list(batch), axis=1)
        if width is None:
            width = row.shape[1]
        if row.shape[1] != width:
            scale_idx = np.linspace(0, row.shape[1] - 1, width).astype(int)
            scale_idy = np.linspace(0, row.shape[0] - 1,
                                    int(row.shape[0] * width / row.shape[1])).astype(int)
            row = row[scale_idy][:, scale_idx]
        rows.append(np.clip(row, 0.0, 1.0))
    return np.concatenate(rows, axis=0)
