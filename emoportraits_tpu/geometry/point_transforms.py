"""3DMM / camera point transforms for dataset conversion (host-side, numpy).

The reference stores 3DMM params + keypoints in its LMDB shards and converts between
the 3DMM world space and normalized image coordinates during data prep
(utils/point_transforms.py:7 parse_3dmm_param, :31 world_to_camera,
:95 camera_to_world). Anyone converting the original LMDB datasets to our shard
format needs the same math; it lives here as plain numpy (it never enters the jitted
compute path).

Camera params dict: R (B,3,3), offset (B,3,1), roi_box (B,1,4), size (B,1,1) and an
optional crop_box (B,1,4) — the layouts the reference reads straight out of LMDB.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def parse_3dmm_param(param: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, np.ndarray]:
    """(62|72|141,) 3DMM parameter vector -> (R (3,3), offset (3,1),
    alpha_shape, alpha_exp). Matrix-pose form: 12 transform values first."""
    n = param.shape[0]
    dims = {62: (12, 40, 10), 72: (12, 40, 20), 141: (12, 100, 29)}
    if n not in dims:
        raise ValueError(f"undefined 3DMM template length {n}")
    trans_dim, shape_dim, _exp_dim = dims[n]
    r_ = param[:trans_dim].reshape(3, -1)
    rot = r_[:, :3]
    offset = r_[:, -1].reshape(3, 1)
    alpha_shp = param[trans_dim:trans_dim + shape_dim].reshape(-1, 1)
    alpha_exp = param[trans_dim + shape_dim:].reshape(-1, 1)
    return rot, offset, alpha_shp, alpha_exp


def _broadcast(pts: np.ndarray, params: Dict[str, np.ndarray]):
    rot, offset = params["R"], params["offset"]
    roi_box, size = params["roi_box"], params["size"]
    crop_box = params.get("crop_box")
    if crop_box is not None and len(crop_box) == 0:
        crop_box = None
    if pts.shape[0] < rot.shape[0]:
        pts = np.repeat(pts, rot.shape[0] // pts.shape[0], axis=0)
    elif pts.shape[0] > rot.shape[0]:
        n = pts.shape[0] // rot.shape[0]
        rot = np.repeat(rot, n, axis=0)
        offset = np.repeat(offset, n, axis=0)
        roi_box = np.repeat(roi_box, n, axis=0)
        size = np.repeat(size, n, axis=0)
        if crop_box is not None:
            crop_box = np.repeat(crop_box, n, axis=0)
    return pts.astype(np.float64).copy(), rot, offset, roi_box, size, crop_box


def world_to_camera(pts_world: np.ndarray,
                    params: Dict[str, np.ndarray]) -> np.ndarray:
    """3DMM world keypoints (B, N, 3) -> normalized [-1, 1] image coords
    (reference utils/point_transforms.py:31-93)."""
    pts, rot, offset, roi_box, size, crop_box = _broadcast(pts_world, params)
    pts[..., 2] += 0.5
    pts *= 2e5
    pts = pts @ np.swapaxes(rot, 1, 2) + np.swapaxes(offset, 1, 2)
    pts[..., 0] -= 1
    pts[..., 2] -= 1
    pts[..., 1] = 120 - pts[..., 1]

    sx, sy, ex, ey = [roi_box[..., i] for i in range(4)]
    scale_x = (ex - sx) / 120
    scale_y = (ey - sy) / 120
    scale_z = (scale_x + scale_y) / 2
    pts[..., 0] = pts[..., 0] * scale_x + sx
    pts[..., 1] = pts[..., 1] * scale_y + sy
    pts[..., 2] = pts[..., 2] * scale_z

    pts /= size
    pts[..., 0] -= 0.5
    pts[..., 1] -= 0.5
    pts[..., :2] *= 2

    if crop_box is not None:
        shift_x = (crop_box[..., 0] + crop_box[..., 2]) / 2
        shift_y = (crop_box[..., 1] + crop_box[..., 3]) / 2
        pts[..., 0] -= shift_x
        pts[..., 1] -= shift_y
        cs_x = (crop_box[..., 2] - crop_box[..., 0]) / 2
        cs_y = (crop_box[..., 3] - crop_box[..., 1]) / 2
        cs_z = (cs_x + cs_y) / 2
        pts[..., 0] /= cs_x
        pts[..., 1] /= cs_y
        pts[..., 2] /= cs_z
    return pts


def camera_to_world(pts_camera: np.ndarray,
                    params: Dict[str, np.ndarray]) -> np.ndarray:
    """Exact inverse of world_to_camera (reference :95-151)."""
    pts, rot, offset, roi_box, size, crop_box = _broadcast(pts_camera, params)
    if crop_box is not None:
        cs_x = (crop_box[..., 2] - crop_box[..., 0]) / 2
        cs_y = (crop_box[..., 3] - crop_box[..., 1]) / 2
        cs_z = (cs_x + cs_y) / 2
        pts[..., 0] *= cs_x
        pts[..., 1] *= cs_y
        pts[..., 2] *= cs_z
        pts[..., 0] += (crop_box[..., 0] + crop_box[..., 2]) / 2
        pts[..., 1] += (crop_box[..., 1] + crop_box[..., 3]) / 2

    pts[..., :2] /= 2
    pts[..., 0] += 0.5
    pts[..., 1] += 0.5
    pts *= size

    sx, sy, ex, ey = [roi_box[..., i] for i in range(4)]
    scale_x = (ex - sx) / 120
    scale_y = (ey - sy) / 120
    scale_z = (scale_x + scale_y) / 2
    pts[..., 0] = (pts[..., 0] - sx) / scale_x
    pts[..., 1] = (pts[..., 1] - sy) / scale_y
    pts[..., 2] = pts[..., 2] / scale_z

    pts[..., 0] += 1
    pts[..., 2] += 1
    pts[..., 1] = -(pts[..., 1] - 120)

    pts = (pts - np.swapaxes(offset, 1, 2)) @ np.linalg.inv(np.swapaxes(rot, 1, 2))
    pts = pts / 2e5
    pts[..., 2] -= 0.5
    return pts
