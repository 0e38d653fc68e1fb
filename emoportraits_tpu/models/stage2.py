"""Stage-2 enhancer: 512px additive-residual refinement of the stage-1 output.

Reference: models/stage_2/base/volumetric_avatar_two.py:589-700 (_forward, active path) —
the stage-1 prediction is resized to 512, masked (MODNet x face parsing), encoded by a
2D downsample stack (`local_encoder`, networks/volumetric_avatar/local_encoder_old.py),
decoded through res blocks + an upsampling image decoder with a tanh head
(decoder_s2_old.py:444-470), and the signed residual — gated by the face mask — is added
to the resized prediction and clamped:
  pred_target_img_ffhq = clamp(resized_pred + residual * face_mask, 0, 1)   (:681-684).

The stage-1 `img_f` feature-tap input exists in the reference signature but is unused in
the active path (decoder_s2_old.py:459-464, concat commented out); we accept and ignore
it the same way, keeping the API surface.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Stage2Config
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn


class Stage2Enhancer(nn.Module):
    cfg: Stage2Config

    @property
    def latent_size(self) -> int:
        return self.cfg.latent_size

    @nn.compact
    def __call__(self, resized_pred: jax.Array, face_mask: jax.Array,
                 pred_feat: Optional[jax.Array] = None) -> jax.Array:
        """resized_pred: (B, S, S, 3) stage-1 output at S=512; face_mask (B, S, S, 1).
        Returns the refined image, clamped to [0, 1]."""
        c = self.cfg
        num_updown = int(math.log2(c.image_size // self.latent_size))

        x = resized_pred * face_mask
        out_ch = c.num_channels
        x = Conv(out_ch, (7, 7), name="from_rgb")(x)
        skips = []
        for i in range(num_updown):
            in_ch = out_ch
            out_ch = min(out_ch * 2, c.max_channels)
            x = ResBlock(in_ch, out_ch, stride=2, norm=c.norm,
                         activation=c.activation, resize="avgpool",
                         name=f"enc_{i}")(x)
            skips.append(x)

        for i in range(c.num_blocks):
            x = ResBlock(out_ch, out_ch, norm=c.norm, activation=c.activation,
                         name=f"res_{i}")(x)

        for i in range(num_updown):
            in_ch = out_ch
            out_ch = max(out_ch // 2, c.num_channels)
            x = x + skips[num_updown - 1 - i]
            x = ResBlock(in_ch, out_ch, stride=2, norm=c.norm,
                         activation=c.activation, resize="nearest",
                         name=f"dec_{i}")(x)

        x = GroupNorm(out_ch, name="head_norm")(x.astype(jnp.float32))
        x = activation_fn(c.activation)(x)
        residual = jnp.tanh(Conv(3, (1, 1), name="head_conv")(x))
        out = resized_pred + residual * face_mask
        return jnp.clip(out, 0.0, 1.0)
