"""Stage-2 enhancer: 512px additive-residual refinement of the stage-1 output.

Architecture parity with the reference stage-2 nets (so the released stage-2 checkpoint
ports 1:1):

  * `Stage2LocalEncoder` == networks/volumetric_avatar/local_encoder_old.py:25-117 —
    from_rgb 7x7 -> 3 stride-2 res blocks (128 -> 256 -> 512 -> 512 at prod
    enc_channel_mult_stage2=4) -> GN/ReLU/1x1 to latent_channels*latent_depth
    (64*16=1024) at 64^2, kept 2D;
  * `Stage2Decoder` == decoder_s2_old.py:18-217 Decoder_stage2 + :346-476
    ImageDecoder_stage2 (the ACTIVE path) — 1x1 in-conv 1024 -> 512, dec_num_blocks_stage2=8
    res blocks, dec_img_blocks: (num_up-1)=2 stride-2 nearest halving blocks
    (512 -> 256 -> 128), dec_img_feat_blocks: stride-2 block to 128 then 3 plain blocks
    128 -> 128 -> 64 -> 32, head GN/ReLU/1x1(3)/TANH. The stage-1 `pred_feat` (img_f)
    input exists in the reference signature but the concat is commented out
    (decoder_s2_old.py:459-464) — accepted and ignored the same way;
  * compositing (volumetric_avatar_two.py:679-683):
    pred_target_img_ffhq = clamp(resized_pred + residual * face_mask, 0, 1).

WS/SN placement follows the same sibling rule as stage 1 (stage-2 lists
`local_encoder, decoder` in its spn/ws networks, volumetric_avatar_two.py:125-127).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Stage2Config
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn


class Stage2LocalEncoder(nn.Module):
    cfg: Stage2Config
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, S, S, 3) masked resized stage-1 output. Returns (B, s, s, C*D)."""
        c = self.cfg
        num_blocks = int(math.log2(c.image_size // c.latent_size))
        out_ch = int(c.num_channels * c.enc_channel_mult)
        x = Conv(out_ch, (7, 7), use_sn=self.use_sn, name="from_rgb")(x)
        for i in range(num_blocks):
            in_ch = out_ch
            out_ch = min(out_ch * 2, c.max_channels)
            x = ResBlock(in_ch, out_ch, stride=2, norm=c.norm,
                         activation=c.activation, resize="avgpool",
                         use_ws=self.use_ws, use_sn=self.use_sn, name=f"enc_{i}")(x)
        x = GroupNorm(out_ch, name="final_norm")(x)
        x = activation_fn(c.activation)(x)
        return Conv(c.latent_channels * c.latent_depth, (1, 1), use_ws=self.use_ws,
                    name="final_conv")(x)


class Stage2Decoder(nn.Module):
    cfg: Stage2Config
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, feat_2d: jax.Array,
                 pred_feat: Optional[jax.Array] = None) -> jax.Array:
        """feat_2d: (B, s, s, C*D). Returns the tanh residual (B, S, S, 3)."""
        c = self.cfg
        num_up = int(math.log2(c.image_size // c.latent_size))
        shared = min(int(c.num_channels * c.dec_channel_mult * 2 ** num_up),
                     c.max_channels)
        kw = dict(norm=c.norm, activation=c.activation, use_ws=self.use_ws,
                  use_sn=self.use_sn)

        x = Conv(shared, (1, 1), use_bias=False, use_sn=self.use_sn,
                 name="in_conv")(feat_2d)
        for i in range(c.dec_num_blocks):
            x = ResBlock(shared, shared, name=f"res_{i}", **kw)(x)

        in_ch = shared
        for i in range(num_up - 1):
            out_ch = max(in_ch // 2, c.num_channels)
            x = ResBlock(in_ch, out_ch, stride=2, resize="nearest",
                         name=f"img_{i}", **kw)(x)
            in_ch = out_ch

        for i, out_ch in enumerate(c.dec_feat_channels):
            x = ResBlock(in_ch, out_ch, stride=2 if i == 0 else 1,
                         resize="nearest" if i == 0 else "none",
                         name=f"feat_{i}", **kw)(x)
            in_ch = out_ch

        # GN stats are fp32 internally; the tensor stays in the activation dtype
        # (see decoder.py head) and only the 3-channel logits promote for the tanh
        x = GroupNorm(in_ch, name="head_norm")(x)
        x = activation_fn(c.activation)(x)
        x = Conv(3, (1, 1), use_ws=self.use_ws, name="head_conv")(x)
        return jnp.tanh(x.astype(jnp.float32))


class Stage2Enhancer(nn.Module):
    cfg: Stage2Config
    use_ws: bool = False
    use_sn: bool = False

    @property
    def latent_size(self) -> int:
        return self.cfg.latent_size

    @nn.compact
    def __call__(self, resized_pred: jax.Array, face_mask: jax.Array,
                 matte_mask: Optional[jax.Array] = None,
                 pred_feat: Optional[jax.Array] = None) -> jax.Array:
        """resized_pred: (B, S, S, 3) stage-1 output at S=512; face_mask (B, S, S, 1).

        The reference feeds the encoder the MATTE-masked image (`resized_pred *
        resized_pred_target_mask`, volumetric_avatar_two.py:621) but gates the
        additive residual with the tighter matte∧face-idt mask (:683); when only one
        mask is supplied it is used for both. Returns the refined image in [0, 1].
        """
        sn = dict(use_ws=self.use_ws, use_sn=self.use_sn)
        enc_mask = face_mask if matte_mask is None else matte_mask
        feat = Stage2LocalEncoder(self.cfg, name="local_encoder", **sn)(
            resized_pred * enc_mask)
        residual = Stage2Decoder(self.cfg, name="decoder", **sn)(feat, pred_feat)
        out = resized_pred + residual * face_mask
        return jnp.clip(out, 0.0, 1.0)
