"""Background path (off in prod: use_back False, but part of the capability surface).

Reference: va.py:136-154 — `local_encoder_back_nw` (LocalEncoderBack,
networks/volumetric_avatar/local_encoder_back.py: 2D downsample stack over the INVERSE-
masked source), `background_process_nw` (2D U-Net, unet_2d.py) producing
latent_volume_channels*depth channels, and `backgroung_adding_nw` (1x1 conv + ReLU)
merging [collapsed aligned volume, background features] back to c*d channels
(va.py:497-498, 581-584).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import LocalEncoderConfig, VolumeConfig
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn, avg_pool, upsample_nearest


class BackgroundEncoder(nn.Module):
    """Inverse-masked source image -> 2D features at latent resolution."""
    cfg: LocalEncoderConfig
    vol: VolumeConfig
    out_channels: int = 64  # background_net_input_channels

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        num_blocks = int(math.log2(c.input_image_size // self.vol.size))
        ch = int(c.num_channels * c.channel_mult)
        x = Conv(ch, (7, 7), name="seg_from_rgb")(x)
        for i in range(num_blocks):
            in_ch = ch
            ch = min(ch * 2, c.max_channels)
            x = ResBlock(in_ch, ch, stride=2, norm=c.norm, activation=c.activation,
                         resize="avgpool", name=f"enc_{i}")(x)
        x = GroupNorm(ch, name="final_norm")(x)
        x = activation_fn(c.activation)(x)
        return Conv(self.out_channels, (1, 1), name="final_conv")(x)


class UNet2D(nn.Module):
    """Small 2D U-Net (reference networks/volumetric_avatar/unet_2d.py; base/max from
    back_unet_base/back_unet_max_ch)."""
    out_channels: int
    base: int = 64
    max_ch: int = 512
    levels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.base
        x = Conv(ch, (3, 3), name="stem")(x)
        skips = []
        for i in range(self.levels):
            in_ch = ch
            ch = min(ch * 2, self.max_ch)
            x = ResBlock(in_ch, ch, stride=2, norm="gn", resize="avgpool",
                         name=f"down_{i}")(x)
            skips.append(x)
        for i in range(self.levels):
            in_ch = ch
            ch = max(ch // 2, self.base)
            x = x + skips[self.levels - 1 - i]
            x = ResBlock(in_ch, ch, stride=2, norm="gn", resize="nearest",
                         name=f"up_{i}")(x)
        return Conv(self.out_channels, (1, 1), name="head")(x)


class BackgroundAdding(nn.Module):
    """1x1 merge of [foreground c*d features, background features] -> c*d + ReLU
    (reference backgroung_adding_nw, va.py:145-151)."""
    out_channels: int

    @nn.compact
    def __call__(self, fg: jax.Array, bg: jax.Array) -> jax.Array:
        x = jnp.concatenate([fg, bg], axis=-1)
        x = Conv(self.out_channels, (1, 1), use_bias=False, name="merge")(x)
        return jax.nn.relu(x)
