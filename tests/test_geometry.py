"""Geometry tests: transform composition vs torch-equivalent math, Umeyama recovery,
polar decomposition properties, mixing-theta semantics."""
import math

import numpy as np

import jax.numpy as jnp

from emoportraits_tpu.geometry.transforms import (
    align_keypoints,
    apply_theta_to_grid,
    euler_to_rotation,
    get_mixing_theta,
    get_similarity_transform_matrix,
    get_transform_matrix,
    inverse_theta_4x4,
    polar_decompose,
    procrustes,
)
from emoportraits_tpu.ops.grid_sample import make_identity_grid_3d


def _np_transform_matrix(scale, rotation, translation):
    """Independent numpy reimplementation of reference point_transforms.py:188-241."""
    b = scale.shape[0]
    out = []
    for i in range(b):
        S = np.eye(4)
        S[0, 0] = S[1, 1] = S[2, 2] = scale[i, 0]
        yaw, pitch, roll = np.clip(rotation[i], -math.pi / 2, math.pi)
        R = np.eye(4)
        R[:3, :3] = [
            [math.cos(yaw) * math.cos(pitch),
             math.cos(yaw) * math.sin(pitch) * math.sin(roll) - math.sin(yaw) * math.cos(roll),
             math.cos(yaw) * math.sin(pitch) * math.cos(roll) + math.sin(yaw) * math.sin(roll)],
            [math.sin(yaw) * math.cos(pitch),
             math.sin(yaw) * math.sin(pitch) * math.sin(roll) + math.cos(yaw) * math.cos(roll),
             math.sin(yaw) * math.sin(pitch) * math.cos(roll) - math.cos(yaw) * math.sin(roll)],
            [-math.sin(pitch), math.cos(pitch) * math.sin(roll), math.cos(pitch) * math.cos(roll)],
        ]
        T = np.eye(4)
        T[:3, 3] = translation[i]
        out.append(S @ R @ T)
    return np.stack(out)


def test_get_transform_matrix_matches_reference_math():
    rng = np.random.default_rng(0)
    scale = rng.uniform(0.5, 2.0, (3, 1)).astype(np.float32)
    rot = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    tr = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    ours = np.asarray(get_transform_matrix(jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(tr)))
    exp = _np_transform_matrix(scale, rot, tr)
    np.testing.assert_allclose(ours, exp, atol=1e-5)
    ours34 = np.asarray(
        get_similarity_transform_matrix(jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(tr)))
    np.testing.assert_allclose(ours34, exp[:, :3], atol=1e-5)


def test_inverse_theta():
    rng = np.random.default_rng(1)
    scale = rng.uniform(0.5, 2.0, (2, 1)).astype(np.float32)
    rot = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
    tr = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
    theta = get_transform_matrix(jnp.asarray(scale), jnp.asarray(rot), jnp.asarray(tr))
    inv = inverse_theta_4x4(theta[:, :3])
    prod = np.asarray(theta @ inv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-4)


def test_procrustes_recovers_similarity():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 68, 3)).astype(np.float32)
    scale = np.array([1.3, 0.7], dtype=np.float32)
    rot = np.asarray(euler_to_rotation(jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3)).astype(np.float32))))
    t = rng.standard_normal((2, 3)).astype(np.float32)
    target = scale[:, None, None] * np.einsum("bij,bnj->bni", rot, pts) + t[:, None]

    s_est, r_est, t_est = procrustes(jnp.asarray(pts), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(s_est), scale, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_est), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)


def test_align_keypoints_reduces_error():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((2, 68, 3)).astype(np.float32)
    rot = np.asarray(euler_to_rotation(jnp.asarray(rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32))))
    pred = 1.1 * np.einsum("bij,bnj->bni", rot, src) + 0.2
    aligned, matrix = align_keypoints(jnp.asarray(src), jnp.asarray(pred))
    assert matrix.shape == (2, 4, 4)
    err_before = np.abs(pred - src).mean()
    err_after = np.abs(np.asarray(aligned) - src).mean()
    assert err_after < err_before * 0.2


def test_polar_decompose_properties():
    rng = np.random.default_rng(4)
    m = rng.standard_normal((3, 4, 4)).astype(np.float32)
    u, p = polar_decompose(jnp.asarray(m))
    u, p = np.asarray(u), np.asarray(p)
    np.testing.assert_allclose(u @ np.swapaxes(u, 1, 2), np.broadcast_to(np.eye(4), u.shape), atol=1e-4)
    np.testing.assert_allclose(u @ p, m, atol=1e-4)
    np.testing.assert_allclose(p, np.swapaxes(p, 1, 2), atol=1e-4)  # symmetric


def test_get_mixing_theta_preserves_target_rotation_and_translation():
    rng = np.random.default_rng(5)
    s_scale = rng.uniform(0.8, 1.2, (2, 1)).astype(np.float32)
    s_rot = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
    s_tr = rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32)
    t_rot = rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32)
    t_tr = rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32)
    src = get_similarity_transform_matrix(jnp.asarray(s_scale), jnp.asarray(s_rot), jnp.asarray(s_tr))
    tgt = get_similarity_transform_matrix(jnp.asarray(np.ones((2, 1), np.float32)),
                                          jnp.asarray(t_rot), jnp.asarray(t_tr))
    mix = np.asarray(get_mixing_theta(src, tgt))
    assert mix.shape == (2, 3, 4)
    # Linear part's rotation factor should equal the target rotation.
    u, _ = polar_decompose(jnp.asarray(mix[:, :3, :3]))
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(euler_to_rotation(jnp.asarray(t_rot))), atol=1e-3)
    # Golden vs the reference composition (non_specific.py:157-187, numpy):
    # src_stretch * tgt_stretch.mean()/src_stretch.mean() @ tgt_rot @ tgt_trans
    # on the 4x4-embedded linear/translation factors.
    def np_polar(m):
        uu, ss, vt = np.linalg.svd(m)
        return uu @ vt, vt.T @ (ss[:, None] * vt)

    for b in range(2):
        s4 = np.eye(4, dtype=np.float64); s4[:3, :] = np.asarray(src)[b, :3, :]
        t4 = np.eye(4, dtype=np.float64); t4[:3, :] = np.asarray(tgt)[b, :3, :]
        t_trans = np.eye(4); t_trans[:3, 3] = t4[:3, 3]
        s_lin = s4.copy(); s_lin[:3, 3] = 0
        t_lin = t4.copy(); t_lin[:3, 3] = 0
        _, s_st = np_polar(s_lin)
        t_r, t_st = np_polar(t_lin)
        want = (s_st * t_st.mean() / s_st.mean()) @ t_r @ t_trans
        np.testing.assert_allclose(mix[b], want[:3], atol=1e-4)


def test_apply_theta_identity():
    grid = make_identity_grid_3d(2, 4, 4).reshape(1, -1, 3)
    ones = jnp.ones((1, grid.shape[1], 1))
    grid_h = jnp.concatenate([grid, ones], axis=-1)
    theta = jnp.broadcast_to(jnp.eye(4)[None, :3], (3, 3, 4))
    out = apply_theta_to_grid(grid_h, theta, (2, 4, 4))
    assert out.shape == (3, 2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(grid).reshape(2, 4, 4, 3), atol=1e-6)
