"""GazeLoss: feature-matching on a frozen gaze-estimation tower over eye crops.

Reference: losses/gaze.py:24-184 + rt_gene_loss_fb/rt_gene_estimator.py:110 — crops left
and right eye regions from 68-landmark boxes, runs a frozen RT-GENE VGG16 gaze estimator,
and L1-matches multi-layer features between prediction and target (prod weight 10).

TPU-native: eye crops are theta-free fixed-size bilinear crops (grid_sample_2d) computed
from landmark boxes — fully batched, no per-sample Python (the reference loops per
face). The tower is a VGG16 feature extractor (losses/perceptual.VGGFeatures) whose
weights port from the RT-GENE release.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample_2d
from .perceptual import VGG16_STAGES, VGGFeatures

# 68-landmark index ranges for the two eyes (iBUG convention)
LEFT_EYE = tuple(range(36, 42))
RIGHT_EYE = tuple(range(42, 48))


def eye_crop_grid(keypoints: jax.Array, idx: Sequence[int], out_h: int = 36,
                  out_w: int = 60, scale: float = 1.8) -> jax.Array:
    """Sampling grid over an eye's landmark bounding box.

    keypoints: (B, 68, 2) in [-1, 1] image coordinates. Returns (B, out_h, out_w, 2).
    """
    pts = keypoints[:, jnp.asarray(idx), :2]
    center = jnp.mean(pts, axis=1)  # (B, 2)
    half = jnp.max(jnp.abs(pts - center[:, None]), axis=1) * scale + 1e-2
    ys = jnp.linspace(-1.0, 1.0, out_h)
    xs = jnp.linspace(-1.0, 1.0, out_w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    unit = jnp.stack([gx, gy], axis=-1)[None]  # (1, H, W, 2)
    return center[:, None, None] + unit * half[:, None, None]


def gaze_loss(
    tower_apply,
    tower_params,
    pred: jax.Array,
    target: jax.Array,
    keypoints: jax.Array,
    layer_weights: Tuple[float, ...] = (0.03125, 0.0625, 0.125, 0.25, 1.0),
) -> jax.Array:
    """L1 over gaze-tower features of both eye crops (reference GazeLoss.forward).

    The released RT-GENE checkpoint (`vgg_16_2_forward_sum.pt`,
    GazeEstimationModelVGG, rt_gaze_estimation_models.py:285-321) holds SEPARATE
    plain-VGG16 towers for the left and right eye; features are tapped at Sequential
    indices (1, 6, 11, 18, 25) == relu_{1..5}_1. Each eye contributes four terms
    (estimate_gaze_pytorch.py:78-112): Left(left), Right(flip(left)), Right(right),
    Left(flip(right)).

    tower_params: either a single param tree (shared tower — tests/tiny mode) or
    {'left': vars, 'right': vars} (ported checkpoint).
    """
    if isinstance(tower_params, dict) and "left" in tower_params:
        p_left, p_right = tower_params["left"], tower_params["right"]
    else:
        p_left = p_right = tower_params
    names = tuple(f"relu_{i}_1" for i in range(1, len(layer_weights) + 1))
    b = pred.shape[0]

    crops = {}
    for key, idx in (("left", LEFT_EYE), ("right", RIGHT_EYE)):
        grid = eye_crop_grid(keypoints, idx)
        crops[key] = (
            grid_sample_2d(pred, grid.astype(pred.dtype), padding_mode="border"),
            grid_sample_2d(target, grid.astype(target.dtype), padding_mode="border"))

    # ONE tower call per eye-tower on the stacked 4B batch (pred, target, and the
    # flipped opposite eye's pred, target) — the left tower sees left crops plus
    # flipped right crops and vice versa, exactly the reference's four terms, at a
    # quarter of the program size.
    loss = jnp.zeros(())
    for params, own, other in ((p_left, "left", "right"),
                               (p_right, "right", "left")):
        op, ot = crops[own]
        fp_, ft_ = crops[other]
        stacked = jnp.concatenate([op, ot, fp_[:, :, ::-1], ft_[:, :, ::-1]], axis=0)
        feats = tower_apply(params, stacked)
        for name, w in zip(names, layer_weights):
            f = feats[name]
            fp_own, ft_own = f[:b], jax.lax.stop_gradient(f[b:2 * b])
            fp_fl, ft_fl = f[2 * b:3 * b], jax.lax.stop_gradient(f[3 * b:])
            loss = loss + w * (jnp.mean(jnp.abs(fp_own - ft_own))
                               + jnp.mean(jnp.abs(fp_fl - ft_fl)))
    return loss / 4.0


def make_gaze_tower(rng: jax.Array, h: int = 36, w: int = 60):
    tower = VGGFeatures(stages=VGG16_STAGES)
    params = tower.init(rng, jnp.zeros((1, h, w, 3)))
    return tower.apply, params
