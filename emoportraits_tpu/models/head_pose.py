"""HeadPoseRegressor: frozen ResNet-18(9) -> (scale, rotation, translation) -> theta.

Reference: networks/volumetric_avatar/head_pose_regressor.py:11-31 — resizes input to
128x128, splits the 9 outputs into 3+3+3 and composes theta = S @ R @ T via
utils/point_transforms.py:188-241. Weights come from `repos/head_pose_regressor.pth`
(va_arguments.py:26); the port tool maps them onto this module's torchvision-layout tree.
Frozen: callers wrap apply in jax.lax.stop_gradient (reference runs it under no_grad).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import HeadPoseConfig
from ..geometry.transforms import get_transform_matrix
from .backbones.resnet import ResNet


class HeadPoseRegressor(nn.Module):
    cfg: HeadPoseConfig = HeadPoseConfig()

    @nn.compact
    def __call__(self, x: jax.Array, return_srt: bool = False):
        """x: (B, H, W, 3) in [0, 1]. Returns theta (B, 4, 4) [or (theta, s, r, t)]."""
        s = self.cfg.input_size
        if x.shape[1] != s or x.shape[2] != s:
            x = jax.image.resize(x, (x.shape[0], s, s, 3), method="linear")
        out = ResNet(layers=(2, 2, 2, 2), block="basic", norm="bn",
                     num_classes=9, name="net")(x.astype(jnp.float32))
        scale, rotation, translation = out[:, :3], out[:, 3:6], out[:, 6:9]
        theta = get_transform_matrix(scale, rotation, translation)
        if return_srt:
            return theta, scale, rotation, translation
        return theta
