"""3D similarity transforms, keypoint alignment, and mixing-theta decomposition — all in
pure jnp (batched, jit-safe), replacing the reference's mix of torch / numpy / scipy code.

Reference parity:
  * get_transform_matrix: utils/point_transforms.py:188-241 (theta = S @ R @ T, 4x4).
  * get_similarity_transform_matrix: networks/volumetric_avatar/expression_embedder.py:481-531
    (identical math; returns 3x4).
  * procrustes/Umeyama alignment: utils/utils_keypoints.py:9-37 (+ align_keypoints,
    utils/non_specific.py:25-48) — done closed-form here, fully batched (the reference loops
    per sample through numpy).
  * polar decomposition for mixing thetas: utils/non_specific.py:128-190 (scipy.linalg.polar
    per sample) -> SVD-based batched polar here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_to_rotation(rotation: jax.Array) -> jax.Array:
    """(B, 3) yaw/pitch/roll -> (B, 3, 3) rotation matrices, with the reference's clamp
    to [-pi/2, pi] (point_transforms.py:210-230)."""
    rotation = jnp.clip(rotation, -jnp.pi / 2, jnp.pi)
    yaw, pitch, roll = rotation[:, 0], rotation[:, 1], rotation[:, 2]
    yc, ys = jnp.cos(yaw), jnp.sin(yaw)
    pc, ps = jnp.cos(pitch), jnp.sin(pitch)
    rc, rs = jnp.cos(roll), jnp.sin(roll)
    r00 = yc * pc
    r01 = yc * ps * rs - ys * rc
    r02 = yc * ps * rc + ys * rs
    r10 = ys * pc
    r11 = ys * ps * rs + yc * rc
    r12 = ys * ps * rc - yc * rs
    r20 = -ps
    r21 = pc * rs
    r22 = pc * rc
    return jnp.stack(
        [jnp.stack([r00, r01, r02], -1),
         jnp.stack([r10, r11, r12], -1),
         jnp.stack([r20, r21, r22], -1)], axis=1)


def get_transform_matrix(scale: jax.Array, rotation: jax.Array, translation: jax.Array) -> jax.Array:
    """theta = S @ R @ T as 4x4 (reference point_transforms.py:188-241).

    scale (B, 1) or (B, 3); rotation (B, 3) euler; translation (B, 3).
    """
    b = scale.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=scale.dtype), (b, 4, 4))
    if scale.shape[1] == 3:
        sdiag = scale
    else:
        sdiag = jnp.repeat(scale, 3, axis=1)
    S = eye.at[:, jnp.arange(3), jnp.arange(3)].set(sdiag)
    R = eye.at[:, :3, :3].set(euler_to_rotation(rotation).astype(scale.dtype))
    T = eye.at[:, :3, 3].set(translation)
    return S @ R @ T


def get_similarity_transform_matrix(scale, rotation, translation) -> jax.Array:
    """Same composition, returned as (B, 3, 4)
    (reference expression_embedder.py:481-531)."""
    return get_transform_matrix(scale, rotation, translation)[:, :3]


def rotation_to_euler(r: jax.Array) -> jax.Array:
    """(B, 3, 3) rotation matrices -> (B, 3) yaw/pitch/roll, inverting
    `euler_to_rotation`'s convention (r20 = -sin(pitch); valid on the clamped
    range the reference's head thetas live in)."""
    yaw = jnp.arctan2(r[:, 1, 0], r[:, 0, 0])
    pitch = -jnp.arcsin(jnp.clip(r[:, 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(r[:, 2, 1], r[:, 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def decompose_transform_matrix(theta: jax.Array):
    """Invert `get_transform_matrix`: (B, 4, 4) or (B, 3, 4) theta = S @ R @ T ->
    (scale (B, 3), euler rotation (B, 3), translation (B, 3)). The linear block's
    row i is s_i * R[i, :], so per-axis scales are row norms; translation solves
    theta[:3, 3] = (S @ R) @ t. Used by the keypoint-theta training branch
    (reference estimate_head_pose_from_keypoints=False, va.py:380-384) to feed the
    downstream (scale, rotation, translation) consumers that the head-pose
    regressor normally supplies (head_pose_regressor.py return_srt)."""
    lin = theta[:, :3, :3]
    scale = jnp.linalg.norm(lin, axis=-1)
    r = lin / scale[..., None]
    trans = jnp.einsum("bij,bj->bi", jnp.linalg.inv(lin), theta[:, :3, 3])
    return scale, rotation_to_euler(r), trans


def inverse_theta_4x4(theta: jax.Array) -> jax.Array:
    """Invert (B, 3, 4) or (B, 4, 4) affine transforms via 4x4 completion."""
    if theta.shape[-2] == 3:
        b = theta.shape[0]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], theta.dtype), (b, 1, 4))
        theta = jnp.concatenate([theta, bottom], axis=1)
    return jnp.linalg.inv(theta)


def procrustes(s1: jax.Array, s2: jax.Array):
    """Batched Umeyama: similarity (scale, R, t) minimizing ||s*R@s1 + t - s2||
    (reference utils/utils_keypoints.py:9-37). s1, s2: (B, N, 3).

    Returns scale (B,), r (B, 3, 3), t (B, 3).
    """
    mu1 = jnp.mean(s1, axis=1, keepdims=True)
    mu2 = jnp.mean(s2, axis=1, keepdims=True)
    x1 = s1 - mu1
    x2 = s2 - mu2
    var1 = jnp.sum(x1 ** 2, axis=(1, 2))
    cov = jnp.einsum("bni,bnj->bij", x1, x2)
    u, s, vt = jnp.linalg.svd(cov)
    v = jnp.swapaxes(vt, 1, 2)
    det = jnp.linalg.det(u @ vt)
    z = jnp.broadcast_to(jnp.eye(3, dtype=s1.dtype), cov.shape)
    z = z.at[:, -1, -1].set(jnp.sign(det))
    r = v @ z @ jnp.swapaxes(u, 1, 2)
    scale = jnp.einsum("bii->b", r @ cov) / var1
    t = mu2[:, 0] - scale[:, None] * jnp.einsum("bij,bj->bi", r, mu1[:, 0])
    return scale, r, t


def _compose_theta(scale, r, t, rotation: bool):
    """4x4 from procrustes output (reference utils/utils_keypoints.py get_transform_matrix
    :41-55 / get_scale_matrix :58-69). rotation=False mirrors get_scale_matrix: scale-only,
    zero translation (used for the nose-alignment path, non_specific.py:31-34)."""
    b = scale.shape[0]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (b, 3, 3))
    lin = scale[:, None, None] * (r if rotation else eye3)
    trans = t if rotation else jnp.zeros_like(t)
    m = jnp.zeros((b, 4, 4), r.dtype)
    m = m.at[:, :3, :3].set(lin)
    m = m.at[:, :3, 3].set(trans)
    m = m.at[:, 3, 3].set(1.0)
    return m


_NOSE_IDX = jnp.array([27, 28, 29, 30])
_EYES_NOSE_IDX = jnp.array([30, 36, 39, 42, 45])


def align_keypoints(source_kp: jax.Array, pred_kp: jax.Array, nose: bool = False):
    """Align pred_kp to source_kp over a keypoint subset; returns (aligned_pred, matrix)
    (reference align_keypoints / align_keypoints_torch, utils/non_specific.py:25-48 —
    fully batched here instead of the per-sample numpy loop).
    """
    idx = _NOSE_IDX if nose else _EYES_NOSE_IDX
    scale, r, t = procrustes(pred_kp[:, idx], source_kp[:, idx])
    matrix = _compose_theta(scale, r, t, rotation=not nose)
    rot = matrix[:, :3, :3]
    trans = matrix[:, :3, 3]
    aligned = jnp.einsum("bni,bji->bnj", pred_kp, rot) + trans[:, None]
    return aligned, matrix


def polar_decompose(m: jax.Array):
    """Batched polar decomposition m = U P with U orthogonal, P spsd
    (replaces per-sample scipy.linalg.polar, non_specific.py:174-183).

    Newton iteration U <- (U + U^-T)/2 instead of SVD: the f32 SVD's u/vt factors
    wobble ~1e-3 on similarity matrices (repeated singular values make them
    non-unique), which leaked visibly into the mixing pose; Newton converges
    quadratically to the orthogonal factor at full f32 precision and is just
    small-matrix matmuls/inverses (MXU-friendly). Inputs are head-pose thetas
    (well-conditioned); a pre-scale by the RMS singular value keeps the
    iteration in its convergence basin."""
    scale = jnp.sqrt(
        jnp.sum(m * m, axis=(-1, -2), keepdims=True) / m.shape[-1])
    u = m / scale
    for _ in range(9):
        u = 0.5 * (u + jnp.swapaxes(jnp.linalg.inv(u), -1, -2))
    p = jnp.swapaxes(u, -1, -2) @ m
    p = 0.5 * (p + jnp.swapaxes(p, -1, -2))
    return u, p


def get_mixing_theta(source_theta: jax.Array, target_theta: jax.Array) -> jax.Array:
    """Mixing pose: source stretch (scale/shear) + target rotation + target translation
    (reference get_mixing_theta, utils/non_specific.py:128-190, new `old_mix_pose=False`
    branch: stretch-rescaled composition). Batched, jit-safe; the reference's random
    theta-pool sampling is handled by the caller (it is host-side RNG over history).

    source_theta, target_theta: (B, 3, 4). Returns (B, 3, 4).
    """
    b = source_theta.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=source_theta.dtype), (b, 4, 4))
    src = eye.at[:, :3, :].set(source_theta)
    tgt = eye.at[:, :3, :].set(target_theta)

    target_translation = eye.at[:, :3, 3].set(tgt[:, :3, 3])
    source_linear = src.at[:, :3, 3].set(0.0)
    target_linear = tgt.at[:, :3, 3].set(0.0)

    _, source_stretch = polar_decompose(source_linear)
    target_rotation, target_stretch = polar_decompose(target_linear)

    # reference scales by the FULL-matrix means of the 4x4-embedded stretches
    # (non_specific.py:187: `source_stretch * target_stretch.mean() /
    # source_stretch.mean()`), not the traces
    scale = (jnp.mean(target_stretch, axis=(-1, -2))
             / jnp.mean(source_stretch, axis=(-1, -2)))
    mix = (source_stretch * scale[:, None, None]) @ target_rotation @ target_translation
    return mix[:, :3]


def fit_similarity_transform(keypoints: jax.Array, canonical: jax.Array,
                             sep_scales: bool = False, iters: int = 10,
                             damping: float = 1e-6) -> jax.Array:
    """Iterative head-theta fit from landmarks (reference estimate_theta,
    networks/volumetric_avatar/expression_embedder.py:254-300: scale/euler/translation
    params driven by 5 host-side torch-LBFGS steps per batch).

    TPU-native: batched Levenberg–Marquardt with a FIXED iteration count — static
    shapes, a (7|9)-parameter least-squares per sample solved entirely on device
    (jacfwd over the tiny parameter vector + a damped 9x9 normal-equation solve),
    no host optimizer loop. The 7-param problem (scale, yaw/pitch/roll, t) is what
    `procrustes` solves closed-form; the 9-param `sep_scales` variant
    (lpe_head_transform_sep_scales: per-axis scale_x/y/z) is NOT representable by
    Umeyama and is the reason the iterative path exists.

    keypoints: (B, N, 3); canonical: (N, 3) template (what the reference stores as
    `aligned_keypoints`). Returns (B, 4, 4) theta mapping keypoints -> canonical.
    """
    b, n = keypoints.shape[0], keypoints.shape[1]
    kp_h = jnp.concatenate(
        [keypoints, jnp.ones((b, n, 1), keypoints.dtype)], axis=-1)
    canon = jnp.broadcast_to(canonical[None].astype(keypoints.dtype),
                             (b, n, 3))
    nscale = 3 if sep_scales else 1
    p0 = jnp.concatenate(
        [jnp.ones((b, nscale), keypoints.dtype),
         jnp.zeros((b, 6), keypoints.dtype)], axis=-1)

    def residual_one(p, kph_i, canon_i):
        # single-sample residual; batch dim re-added for get_transform_matrix
        scale = p[None, :nscale]
        rot = p[None, nscale:nscale + 3]
        trans = p[None, nscale + 3:]
        theta = get_transform_matrix(scale, rot, trans)[0, :3]  # (3, 4)
        return (kph_i @ theta.T - canon_i).reshape(-1)  # (3N,)

    jac_one = jax.jacfwd(residual_one)

    def lm_step(p, _):
        r = jax.vmap(residual_one)(p, kp_h, canon)          # (B, 3N)
        J = jax.vmap(jac_one)(p, kp_h, canon)               # (B, 3N, P)
        JtJ = jnp.einsum("bri,brj->bij", J, J)
        g = jnp.einsum("bri,br->bi", J, r)
        eye = jnp.eye(JtJ.shape[-1], dtype=JtJ.dtype)
        # damping scaled by the diagonal magnitude keeps the solve stable when a
        # parameter direction is momentarily flat (euler clamp boundary); the
        # absolute floor keeps lam > 0 on degenerate landmark sets (near-
        # coincident keypoints -> JtJ ~ 0 -> singular solve -> NaN otherwise)
        lam = (damping * jnp.trace(JtJ, axis1=-2, axis2=-1)[:, None, None]
               + jnp.asarray(1e-8, JtJ.dtype))
        step = jnp.linalg.solve(JtJ + lam * eye, g[..., None])[..., 0]
        # reject non-finite iterates per sample (keep the previous p instead of
        # propagating NaNs out of a bad solve)
        p_new = p - step
        ok = jnp.isfinite(p_new).all(axis=-1, keepdims=True)
        return jnp.where(ok, p_new, p), None

    p, _ = jax.lax.scan(lm_step, p0, None, length=iters)
    scale, rot, trans = (p[:, :nscale], p[:, nscale:nscale + 3],
                         p[:, nscale + 3:])
    return get_transform_matrix(scale, rot, trans)


def apply_theta_to_grid(grid_flat: jax.Array, theta3x4: jax.Array, out_shape) -> jax.Array:
    """Warp an identity grid by an affine theta: grid (1 or B, P, 4 homogeneous) @ theta^T
    (reference va.py:380-431 rotation-warp construction). Returns (B, *out_shape, 3)."""
    b = theta3x4.shape[0]
    if grid_flat.shape[0] == 1:
        grid_flat = jnp.broadcast_to(grid_flat, (b, *grid_flat.shape[1:]))
    warped = jnp.einsum("bpk,bjk->bpj", grid_flat, theta3x4)
    return warped.reshape(b, *out_shape, 3)
