"""Unet3D (`volume_process_nw`): 3D U-Net over the latent volume with a learned constant
bottleneck tensor and residual skip blocks.

Reference: networks/volumetric_avatar/unet_3d.py:18-280. Prod geometry (dummy 8, volume
16x64x64@96, max 512):
  down: depth-up(2,1,1)->block 96->192 @32x64x64 ->pool(1,2,2)
        block 192->384 @32x32x32 ->pool(2,2,2)
        block 384->512 @16x16x16
  up:   learned input_tensor (1,8,8,8,512) + skip-resblock fusion, mirrored schedule,
        head GN+ReLU+1x1. Prod has no adaptive norms here (gen_use_adanorm False) — the
  reference constructs a projector whose param list is empty (unet_3d.py:184-188); we
  simply omit it.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Unet3DConfig
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn, avg_pool
from .warp_generator import resize_trilinear


class Unet3D(nn.Module):
    cfg: Unet3DConfig
    use_ws: bool = True
    use_sn: bool = True
    # per-RES-BLOCK rematerialization (stage1 sets this under ModelConfig.remat) —
    # same granularity lesson as LocalEncoder/Decoder: as ONE nn.remat region the
    # U-Net's backward replay held ~8 simultaneous 288 MB f32 GN temps across
    # down_0/skip_2/up_2 (the batch-2 512px OOM dump after the decoder fix);
    # per-block regions bound the window to one block.
    remat_blocks: bool = False
    remat_policy: str = ""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, D, S, S, C) warped latent volume. Returns same shape."""
        c = self.cfg
        num_blocks = int(math.log2(c.size // c.dummy_input_size))
        sn = dict(use_ws=self.use_ws, use_sn=self.use_sn)
        Res_ = ResBlock
        if self.remat_blocks:
            kw = {}
            if self.remat_policy == "dots":
                kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            Res_ = nn.remat(ResBlock, **kw)

        # ---- down path ----
        out_ch = c.channels
        feats = []
        depth, spatial = c.depth, c.size
        for i in range(num_blocks):
            in_ch = out_ch
            out_ch = min(out_ch * 2, c.max_channels)
            if i < num_blocks - 1:
                new_spatial = spatial // 2
                depth_new = min(depth * 2, new_spatial)
                if depth_new > depth:
                    x = resize_trilinear(x, (2, 1, 1))
            x = Res_(in_ch, out_ch, ndim=3, norm=c.norm, activation=c.activation,
                     name=f"down_{i}", **sn)(x)
            feats.append(x)
            if i < num_blocks - 1:
                if depth_new < depth:
                    x = avg_pool(x, 2)
                else:
                    x = avg_pool(x, (1, 2, 2))
                depth, spatial = depth_new, new_spatial

        # ---- up path with learned constant bottleneck ----
        top_ch = min(int(c.channels * 2 ** num_blocks), c.max_channels)
        e = c.dummy_input_size
        input_tensor = self.param(
            "input_tensor", nn.initializers.normal(stddev=1.0), (1, e, e, e, top_ch))
        b = x.shape[0]
        y = jnp.broadcast_to(input_tensor, (b, e, e, e, top_ch)).astype(x.dtype)

        feats = feats[::-1]  # low res -> high res
        depth = e
        in_ch = top_ch
        for i in range(1, num_blocks + 1):
            out_ch = min(int(c.channels * 2 ** (num_blocks - i)), c.max_channels)
            spatial = e * 2 ** i
            depth_new = min(c.depth * 2 ** (num_blocks - i), spatial)
            if depth_new > depth:
                y = resize_trilinear(y, (2, 2, 2))
            else:
                y = resize_trilinear(y, (1, 2, 2))
            skip = feats[i - 1]
            if c.use_skip_resblock:
                skip = Res_(in_ch, in_ch, ndim=3, norm=c.norm,
                            activation=c.activation, name=f"skip_{i - 1}", **sn)(skip)
            y = Res_(in_ch, out_ch, ndim=3, norm=c.norm, activation=c.activation,
                     name=f"up_{i - 1}", **sn)(y + skip)
            if depth_new < depth and depth_new < y.shape[1]:
                y = avg_pool(y, (y.shape[1] // depth_new, 1, 1))
            depth = depth_new
            in_ch = out_ch

        y = GroupNorm(out_ch, name="head_norm")(y)
        y = activation_fn(c.activation)(y)
        # head conv3d after a PLAIN GroupNorm: the 3D WS rule needs AdaptiveGroupNorm
        # (utils.py:1085), so this keeps its SN hook
        y = Conv(out_ch, (1, 1, 1), use_sn=self.use_sn, name="head_conv")(y)
        return y
