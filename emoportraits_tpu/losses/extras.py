"""Auxiliary losses (present in the reference loss zoo but off in the prod config —
kept for capability parity; SURVEY.md §2.4 'unused extras').

Reference:
  * SegmentationLoss (losses/segmentation.py:9-28): BCE-with-logits on predicted segs,
    target resized to prediction resolution;
  * HeadPoseMatchingLoss (losses/head_pose_matching.py:11-33): L1/L2 between theta
    matrices;
  * AffineLoss (losses/affine_params_matching.py:10-31): MSE between predicted and
    ground-truth thetas, weight 20;
  * WarpReg (losses/warping_regularizer.py:12-60): decayed L1 on the predicted warp
    delta fields (weight 50, x0.9 every 50 iters);
  * EquivarianceLoss (losses/equivariance.py): random affine+TPS transform equivariance
    of keypoints — the TPS sampler is provided here as `random_tps_grid`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d, make_identity_grid_2d


def segmentation_loss(pred_logits: jax.Array, target: jax.Array) -> jax.Array:
    if target.shape[1] != pred_logits.shape[1]:
        target = jax.image.resize(target, pred_logits.shape[:3] + (target.shape[-1],),
                                  method="linear")
    z = pred_logits
    # numerically-stable BCE with logits
    return jnp.mean(jnp.maximum(z, 0) - z * target + jnp.log1p(jnp.exp(-jnp.abs(z))))


def head_pose_matching_loss(pred_theta: jax.Array, target_theta: jax.Array,
                            loss_type: str = "l2") -> jax.Array:
    d = pred_theta - target_theta
    return jnp.mean(jnp.abs(d)) if loss_type == "l1" else jnp.mean(d * d)


def affine_loss(pred_thetas: Sequence[jax.Array], gt_thetas: Sequence[jax.Array],
                weight: float = 20.0) -> jax.Array:
    pred = jnp.concatenate(list(pred_thetas))
    gt = jax.lax.stop_gradient(jnp.concatenate(list(gt_thetas)))
    return weight * jnp.mean((pred - gt) ** 2)


def warp_reg_loss(delta_fields: Sequence[jax.Array], step: jax.Array,
                  base_weight: float = 50.0, decay: float = 0.9,
                  decay_every: int = 50) -> jax.Array:
    """L1 magnitude regularizer on warp deltas with the reference's staircase decay
    (jit-safe: weight computed from the step counter instead of module state)."""
    k = jnp.floor(step / decay_every)
    weight = base_weight * decay ** k
    loss = jnp.zeros(())
    for f in delta_fields:
        loss = loss + jnp.mean(jnp.abs(f))
    return weight * loss / max(len(list(delta_fields)), 1)


def random_tps_grid(rng: jax.Array, batch: int, h: int, w: int,
                    sigma_affine: float = 0.05, sigma_tps: float = 0.005,
                    points_tps: int = 5) -> jax.Array:
    """Random affine + thin-plate-spline sampling grid (reference equivariance.py
    Transform: gaussian affine noise around identity + gaussian TPS control weights).
    Returns (B, h, w, 2) grids usable with grid_sample_2d."""
    k_aff, k_tps = jax.random.split(rng)
    grid = make_identity_grid_2d(h, w).reshape(1, -1, 2)
    grid = jnp.broadcast_to(grid, (batch, h * w, 2))

    noise = jax.random.normal(k_aff, (batch, 2, 3)) * sigma_affine
    theta = noise + jnp.eye(2, 3)[None]
    ones = jnp.ones((batch, h * w, 1))
    warped = jnp.einsum("bpk,bjk->bpj", jnp.concatenate([grid, ones], -1), theta)

    control = make_identity_grid_2d(points_tps, points_tps).reshape(1, -1, 2)
    params = jax.random.normal(k_tps, (batch, points_tps ** 2)) * sigma_tps
    d2 = jnp.sum((grid[:, :, None] - control[:, None]) ** 2, axis=-1)
    radial = d2 * jnp.log(d2 + 1e-6) * 0.5
    tps = jnp.einsum("bpc,bc->bp", radial, params)
    warped = warped + tps[..., None]
    return warped.reshape(batch, h, w, 2)


def equivariance_loss(keypoint_fn, img: jax.Array, rng: jax.Array,
                      sigma_affine: float = 0.05, sigma_tps: float = 0.005) -> jax.Array:
    """||K(T(img)) sampled back through T - K(img)|| for a random TPS T
    (FOMM-style equivariance, reference losses/equivariance.py).

    keypoint_fn: img -> (B, K, 2) normalized keypoints.
    """
    b, h, w, _ = img.shape
    grid = random_tps_grid(rng, b, h, w, sigma_affine, sigma_tps)
    t_img = grid_sample_2d(img, grid.astype(img.dtype), padding_mode="border")
    kp = keypoint_fn(img)
    kp_t = keypoint_fn(t_img)
    # map transformed keypoints through the warp grid (bilinear sample of the grid)
    kp_grid = grid_sample_2d(grid, kp_t[:, :, None, :].astype(grid.dtype),
                             padding_mode="border")[:, :, 0]
    return jnp.mean(jnp.abs(kp_grid - kp))
