"""WarpGenerator: adaptive-norm 3D conv decoder from the 4x4 warp embed to a dense 3D
warp field (identity grid + tanh deltas).

Reference: networks/volumetric_avatar/warp_generator_resnet.py:11-182. Two instances:
`xy_generator_nw` (source -> canonical) and `uv_generator_nw` (canonical -> target pose),
va.py:183-185. Adaptive GroupNorm modulation comes from a ProjectorNorm over the fused
(pose+idt) embed (warp_generator_resnet.py:115-117); here the projector lives inside the
module and modulation is threaded functionally.

Prod schedule (dummy 4, output 64x64 depth 16, ch 32*1.0, max 512):
  4x4x4@512 -> up2 8x8x8@256 -> up2 16x16x16@128 -> up2 32x32x32@64
  -> up(1,2,2)+depth-pool 16x64x64@32 -> GN+ReLU -> conv3(3) -> tanh.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import WarpGeneratorConfig
from ..ops.adaptive import AdaConvEmbedHeads, ProjectorConv, ProjectorNorm
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn, avg_pool
from ..ops.grid_sample import make_identity_grid_3d


def resize_trilinear(x: jax.Array, scale: Tuple[int, int, int]) -> jax.Array:
    """Trilinear resize (torch F.interpolate mode='trilinear', align_corners=False);
    x is (B, D, H, W, C)."""
    b, d, h, w, c = x.shape
    new = (b, d * scale[0], h * scale[1], w * scale[2], c)
    return jax.image.resize(x, new, method="linear")


def _channel_schedule(cfg: WarpGeneratorConfig):
    num_blocks = int(math.log2(cfg.output_size // cfg.dummy_input_size))

    def ch(i):
        v = min(int(cfg.num_channels * cfg.channel_mult * 2 ** i), cfg.max_channels)
        # reference floors to multiples of 32 (warp_generator_resnet.py:60); keep small
        # test configs intact where that would floor to zero
        return (v // 32 * 32) if v >= 32 else v

    top = ch(num_blocks)
    outs = [ch(i) for i in range(num_blocks - 1, -1, -1)]
    return num_blocks, top, outs


class WarpGenerator(nn.Module):
    cfg: WarpGeneratorConfig
    use_ws: bool = True
    use_sn: bool = True

    @nn.compact
    def __call__(self, embed: jax.Array,
                 conv_alpha=1.0) -> Tuple[jax.Array, jax.Array]:
        """embed: (B, E, E, C_in) fused warp embed (spatial layout of embed_dict['orig']).

        `conv_alpha` (traced scalar, only read when cfg.use_adaconv) anneals the
        per-sample kernel deltas (ops/adaptive.annealing_alpha; 0 = base kernels).

        Returns (warp, deltas), both (B, D, S, S, 3) with (x, y, z) order.
        """
        c = self.cfg
        num_blocks, top_ch, out_chs = _channel_schedule(c)
        b = embed.shape[0]
        e = c.dummy_input_size

        # Projector: each res block has 2 adaptive norms at (in_ch, out_ch).
        chans = []
        conv_specs = []
        per_block_nmods = []
        in_ch = top_ch
        for oc in out_chs:
            chans += [in_ch, oc]
            sp = ResBlock.conv_specs(in_ch, oc, ndim=3)
            conv_specs += sp
            per_block_nmods.append(len(sp))
            in_ch = oc
        embed_flat = jnp.transpose(embed, (0, 3, 1, 2)).reshape(b, embed.shape[-1], -1)
        mods = ProjectorNorm(tuple(chans), c.max_channels, c.embed_size,
                             name="projector")(embed_flat)

        # AdaptiveConv branch (warp_generator_resnet.py:113-116 + the reconstructed
        # embed heads — see AdaConvEmbedHeads docstring for why they live here).
        conv_mods = None
        if c.use_adaconv:
            kinds = ("fc", "conv3d") if c.adaptive_kernel else ("fc",)
            head_in = AdaConvEmbedHeads(c.max_channels, c.embed_size, kinds,
                                        name="adaconv_heads")(embed_flat)
            conv_mods = ProjectorConv(tuple(conv_specs), c.max_channels,
                                      c.adaptive_kernel,
                                      name="projector_conv")(head_in)

        # first_conv at child index 0 -> SN only (never WS-converted)
        x = Conv(top_ch * e, (1, 1), use_bias=False,
                 use_sn=self.use_sn, name="first_conv")(embed)
        # (B, E, E, top*E) -> C-major split (C, D) -> (B, D, E, E, C)
        x = x.reshape(b, e, e, top_ch, e)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))

        depth = e
        ndrb = int(math.log2(c.output_size // c.dummy_input_size))
        in_ch = top_ch
        cm_off = 0
        for i, oc in enumerate(out_chs, start=1):
            spatial = e * 2 ** i
            if i < ndrb:
                depth_new = min(c.output_depth * 2 ** (ndrb - i), spatial)
            else:
                depth_new = c.output_depth
            if depth_new > depth:
                x = resize_trilinear(x, (2, 2, 2))
            else:
                x = resize_trilinear(x, (1, 2, 2))
            n_cm = per_block_nmods[i - 1]
            block_cm = (conv_mods[cm_off:cm_off + n_cm]
                        if conv_mods is not None else None)
            cm_off += n_cm
            x = ResBlock(in_ch, oc, ndim=3, norm="ada_" + c.norm,
                         activation=c.activation, use_ws=self.use_ws,
                         use_sn=self.use_sn,
                         adaptive_conv_type=c.adaptive_conv_type,
                         name=f"block_{i - 1}")(
                x, mods=mods[2 * (i - 1): 2 * i],
                conv_mods=block_cm, conv_alpha=conv_alpha)
            if depth_new < depth * 2 and depth_new < x.shape[1]:
                x = avg_pool(x, (x.shape[1] // depth_new, 1, 1))
            depth = depth_new
            in_ch = oc

        if c.block_type == "res":
            # Head stays in the ACTIVATION dtype: under bf16_activations an f32
            # cast here is a pure memory tax — the (B, 16, 64, 64, 32) f32
            # GN/relu/head-conv temps pad 4.0x on the 128-lane tile (the top
            # temps of the r5 batch-2 HBM dump) while the resulting warp is
            # cast to the volume dtype at every grid_sample consumer anyway
            # (stage1._grid_sample), so f32 deltas buy no end precision. GN
            # statistics are f32 internally regardless (ops/blocks.GroupNorm).
            x = GroupNorm(out_chs[-1], name="pre_head_norm")(x)
            x = activation_fn(c.activation)(x)
        # head conv3d keeps its SN hook (sequential index 0 of head.0)
        deltas = Conv(3, (3, 3, 3), use_sn=self.use_sn, name="head")(x)
        deltas = jnp.tanh(deltas)
        grid = make_identity_grid_3d(c.output_depth, c.output_size, c.output_size,
                                     dtype=deltas.dtype)
        warp = grid + deltas
        return warp, deltas
