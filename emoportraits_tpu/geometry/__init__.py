"""Batched 3D similarity transforms, keypoint alignment, polar decomposition."""
from .transforms import (
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
