"""LocalEncoder: masked source image -> 2D residual downsample stack -> latent 3D volume.

Reference: networks/volumetric_avatar/local_encoder.py:26-127. Prod geometry
(experiments/args.txt): 512^2 input -> 3 stride-2 res blocks (128 -> 256 -> 512 -> 512ch)
-> GN+ReLU+1x1 conv to channels*depth (96*16=1536) at 64^2, reshaped to a
(depth 16, 64, 64, channels 96) volume.

Layout note: torch reshapes conv output (B, C*D, H, W) -> (B, C, D, H, W) with C major
(va.py:501 `latent_volume.view(b, c, d, s, s)`). We keep the same C-major flattening so
ported checkpoints are bit-compatible: (B, H, W, C*D) -> (B, H, W, C, D) -> (B, D, H, W, C).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import LocalEncoderConfig, VolumeConfig
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn


class LocalEncoder(nn.Module):
    cfg: LocalEncoderConfig
    vol: VolumeConfig
    use_ws: bool = True
    use_sn: bool = True
    # per-RES-BLOCK rematerialization (stage1 sets this under ModelConfig.remat).
    # Granularity matters: one whole-encoder jax.checkpoint region measured WORSE
    # at batch-2 512px — its backward replays every block before the reverse
    # sweep, holding all blocks' recomputed activations (4 x 520 MB f32 GN temps
    # of enc_0) live at once. Per-block regions replay one block at a time.
    remat_blocks: bool = False
    remat_policy: str = ""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, S, S, 3) masked source image. Returns volume (B, D, s, s, C)."""
        c = self.cfg
        v = self.vol
        ratio = c.input_image_size // v.size
        num_blocks = int(math.log2(ratio))
        sn = dict(use_ws=self.use_ws, use_sn=self.use_sn)
        Res_ = ResBlock
        if self.remat_blocks:
            kw = {}
            if self.remat_policy == "dots":
                kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            Res_ = nn.remat(ResBlock, **kw)

        out_ch = int(c.num_channels * c.channel_mult)
        # from_rgb sits at child index 0 -> never WS-converted (utils.py:1071-1077): SN only
        x = Conv(out_ch, (7, 7), use_sn=self.use_sn, name="from_rgb")(x)
        for i in range(num_blocks):
            in_ch = out_ch
            out_ch = min(out_ch * 2, c.max_channels)
            x = Res_(in_ch, out_ch, stride=2, norm=c.norm, activation=c.activation,
                     resize="avgpool", name=f"enc_{i}", **sn)(x)
        if c.block_type == "res":
            x = GroupNorm(out_ch, name="final_norm")(x)
            x = activation_fn(c.activation)(x)
        # finale_layers conv follows a GN sibling -> WS-converted (bias=True, SN dropped)
        x = Conv(v.channels * v.depth, (1, 1), use_ws=self.use_ws,
                 name="final_conv")(x)

        b, s = x.shape[0], x.shape[1]
        x = x.reshape(b, s, s, v.channels, v.depth)
        return jnp.transpose(x, (0, 4, 1, 2, 3))  # (B, D, s, s, C)
