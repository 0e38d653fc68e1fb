"""MattingNet: portrait alpha matting (the MODNet role).

Reference: `repos/MODNet` (external, not in the reference git tree) is used to matte
generated images — mixing-branch masks in training (va.py:666-698 via `self.get_mask`)
and stage-2 mask recomputation (volumetric_avatar_two.py:611-614). The reference treats
it as a frozen black box returning an alpha matte in [0, 1].

This module provides the framework-native matting network with the same contract:
`alpha = net(img)` for (B, H, W, 3) in [0,1] -> (B, H, W, 1). It is an encoder-decoder
with skip connections operating at half resolution (matting mattes are low-frequency)
— a TPU-friendly stand-in trainable on any portrait-matting dataset; MODNet's exact
MobileNetV2 trunk can be ported onto the same API later.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv, GroupNorm, ResBlock, upsample_nearest


class MattingNet(nn.Module):
    base_channels: int = 16
    num_levels: int = 4

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        b, h, w, _ = img.shape
        x = jax.image.resize(img, (b, h // 2, w // 2, 3), method="linear")
        ch = self.base_channels
        x = Conv(ch, (3, 3), name="stem")(x)
        skips = []
        for i in range(self.num_levels):
            x = ResBlock(ch, ch * 2, stride=2, resize="avgpool", norm="gn",
                         name=f"down_{i}")(x)
            ch *= 2
            skips.append(x)
        for i in range(self.num_levels):
            x = x + skips[self.num_levels - 1 - i]
            x = ResBlock(ch, ch // 2, stride=2, resize="nearest", norm="gn",
                         name=f"up_{i}")(x)
            ch //= 2
        x = GroupNorm(ch, name="head_norm")(x)
        x = jax.nn.relu(x)
        alpha = jax.nn.sigmoid(Conv(1, (1, 1), name="head")(x))
        return jax.image.resize(alpha, (b, h, w, 1), method="linear")
