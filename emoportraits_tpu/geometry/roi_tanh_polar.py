"""RoI tanh-polar warping (the `ibug.roi_tanh_warping` role).

Reference usage: va.py:24-27 imports `roi_tanh_polar_restore/warp` from the external
ibug package (shipped in `repos/`, not in the reference git tree) and
utils/non_specific.py:262-282 (`FaceParsingBUG.get_lips`) restores RTNet face-parsing
logits from tanh-polar space to the image frame. This module reconstructs the
published transform (Lin et al., "RoI Tanh-polar transformer network for face
parsing in the wild") as pure-jnp grid transforms over our sampler — vmapped over
the batch instead of the reference's per-sample python loop
(va.py:303-318 loops `get_lips` per element).

Geometry: a face RoI box (x1, y1, x2, y2) defines an AREA-PRESERVING ellipse with
semi-axes (w, h) / sqrt(pi) (pi * a * b == w * h). The warp maps the whole image to a
fixed (Ht, Wt) grid where rows sweep the polar angle in [0, 2pi) and columns sweep a
tanh-compressed radius: column q in [0, 1) corresponds to true radius
artanh(q) * r(theta). The tanh compression dedicates ~70% of the representation to
the RoI while still covering the ENTIRE image plane with finite extent — the
property that lets the parser see full context at fixed resolution.

`restore` is the analytic inverse (image pixel -> (theta, tanh(rho)) lookup into the
warped plane) with periodic wrap in the angular rows; warp-then-restore is
identity up to two bilinear resamplings.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d

__all__ = ["roi_tanh_polar_warp", "roi_tanh_polar_restore", "roi_from_keypoints"]


def _roi_geometry(roi: jax.Array):
    """roi (4,) = (x1, y1, x2, y2) in pixels -> center (2,), semi-axes (2,)."""
    center = (roi[:2] + roi[2:]) * 0.5
    radii = (roi[2:] - roi[:2]) / jnp.sqrt(jnp.pi)
    return center, radii


def _ellipse_radius(radii, cos_t, sin_t):
    """Radius of the ellipse with semi-axes (a, b) along direction theta."""
    a, b = radii[0], radii[1]
    return a * b / jnp.sqrt((a * sin_t) ** 2 + (b * cos_t) ** 2)


def _to_norm(x, size):
    """Pixel-center coordinate -> [-1, 1] torch align_corners=False convention."""
    return (2.0 * x + 1.0) / size - 1.0


def roi_tanh_polar_warp(images: jax.Array, rois: jax.Array, target_height: int,
                        target_width: int, keep_aspect_ratio: bool = True,
                        padding_mode: str = "border") -> jax.Array:
    """images (B, H, W, C), rois (B, 4) pixel boxes -> (B, Ht, Wt, C) tanh-polar."""
    B, H, W, _ = images.shape
    theta = jnp.arange(target_height, dtype=jnp.float32) * (
        2.0 * jnp.pi / target_height)
    q = jnp.arange(target_width, dtype=jnp.float32) / target_width
    rho = jnp.arctanh(q)  # (Wt,), finite: q < 1
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    def one_grid(roi):
        center, radii = _roi_geometry(roi)
        if keep_aspect_ratio:
            r = _ellipse_radius(radii, cos_t, sin_t)  # (Ht,)
            x = center[0] + rho[None, :] * (r * cos_t)[:, None]
            y = center[1] + rho[None, :] * (r * sin_t)[:, None]
        else:
            x = center[0] + radii[0] * rho[None, :] * cos_t[:, None]
            y = center[1] + radii[1] * rho[None, :] * sin_t[:, None]
        return jnp.stack([_to_norm(x, W), _to_norm(y, H)], axis=-1)

    grid = jax.vmap(one_grid)(rois.astype(jnp.float32))  # (B, Ht, Wt, 2)
    return grid_sample_2d(images, grid.astype(images.dtype),
                          padding_mode=padding_mode)


def roi_tanh_polar_restore(warped: jax.Array, rois: jax.Array, image_height: int,
                           image_width: int, keep_aspect_ratio: bool = True) -> jax.Array:
    """(B, Ht, Wt, C) tanh-polar plane -> (B, H, W, C) image frame (analytic inverse;
    get_lips restores softmaxed logits this way, non_specific.py:279-281)."""
    B, Ht, Wt, _ = warped.shape
    H, W = image_height, image_width
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)

    # periodic pad in theta: row Ht wraps to row 0
    warped_p = jnp.concatenate([warped, warped[:, :1]], axis=1)

    def one_grid(roi):
        center, radii = _roi_geometry(roi)
        dx, dy = px - center[0], py - center[1]
        if keep_aspect_ratio:
            theta = jnp.arctan2(dy, dx)
            r = _ellipse_radius(radii, jnp.cos(theta), jnp.sin(theta))
            rho = jnp.sqrt(dx * dx + dy * dy) / r
        else:
            u, v = dx / radii[0], dy / radii[1]
            theta = jnp.arctan2(v, u)
            rho = jnp.sqrt(u * u + v * v)
        theta = jnp.mod(theta, 2.0 * jnp.pi)
        # continuous source coords in the PADDED (Ht+1, Wt) plane: warp placed
        # radius artanh(j/Wt) at column j and angle 2*pi*i/Ht at row i, so the
        # inverse lookup is col = tanh(rho)*Wt, row = theta/(2*pi)*Ht in
        # column/row-index units (no half-pixel shift)
        row = theta / (2.0 * jnp.pi) * Ht
        col = jnp.tanh(rho) * Wt
        return jnp.stack([_to_norm(col, Wt),
                          _to_norm(row, Ht + 1)], axis=-1)

    grid = jax.vmap(one_grid)(rois.astype(jnp.float32))
    return grid_sample_2d(warped_p, grid.astype(warped.dtype),
                          padding_mode="border")


def roi_from_keypoints(keypoints: jax.Array, image_size: int,
                       expand: float = 1.4) -> jax.Array:
    """Face RoI boxes from 68 landmarks in [-1, 1] (our batches carry them —
    data/pairs.py); replaces the reference's external RetinaFace detector
    (non_specific.py:259-266) with a deterministic jittable box.

    keypoints (B, 68, 2) -> rois (B, 4) pixel boxes, square-expanded by `expand`.
    """
    kp = (keypoints + 1.0) * 0.5 * image_size  # pixel coords
    lo = jnp.min(kp, axis=1)
    hi = jnp.max(kp, axis=1)
    center = (lo + hi) * 0.5
    half = jnp.max(hi - lo, axis=-1, keepdims=True) * 0.5 * expand
    return jnp.concatenate([center - half, center + half], axis=-1)
