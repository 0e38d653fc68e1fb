"""Decoder (`decoder_nw`): collapsed 2D volume features -> res-block stack -> upsampling
image decoder -> sigmoid RGB, with an optional feature tap for the stage-2 enhancer.

Reference: networks/volumetric_avatar/decoder.py:20-238 (Decoder), :240-411 (ImageDecoder).
Prod (dec_num_blocks 6, dec_max_channels 512, im_dec_num_lrs_per_resolution 2,
im_dec_ch_div_factor 1.5, norm gn, dec_use_adanorm False):
  1x1 conv 1536 -> 512, 6 res blocks @512,
  3 upsample stages 512 -> 320 -> 192 -> 128 (each: stride-2 nearest res block + 1 extra),
  head GN+ReLU+1x1 -> 3ch sigmoid.

The reference always builds a norm projector but prod has no adaptive layers in this net
(gen_use_adanorm=False -> plain GN; decoder.py:131-147 projector output is then empty).
`use_adanorm=True` enables the ProjectorNormLinear path (dec_use_adanorm) for parity.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DecoderConfig
from ..ops.adaptive import ProjectorNormLinear
from ..ops.blocks import Conv, GroupNorm, ResBlock, activation_fn


def _img_channels(cfg: DecoderConfig):
    num_up = int(math.log2(cfg.image_size // cfg.latent_size))
    out_ch = min(int(cfg.num_channels * cfg.channel_mult * 2 ** num_up), cfg.max_channels)
    chans = []
    c = out_ch
    for _ in range(num_up):
        c = max(int(c / cfg.ch_div_factor / 32) * 32, cfg.num_channels)
        chans.append(c)
    return num_up, out_ch, chans


class Decoder(nn.Module):
    cfg: DecoderConfig
    use_ws: bool = True
    use_sn: bool = True
    # per-RES-BLOCK rematerialization (stage1 sets this under ModelConfig.remat).
    # Granularity matters here even more than in the encoder: as ONE nn.remat
    # region the decoder's backward replays all 12 image blocks before the
    # reverse sweep — measured at batch-2 512px the img_4/img_5 f32 GN backward
    # temps (6-10 x 260 MB, the largest allocations in the OOM dump) stay live
    # simultaneously. Per-block regions replay one block at a time.
    remat_blocks: bool = False
    remat_policy: str = ""

    @nn.compact
    def __call__(self, feat_2d: jax.Array, embed: Optional[jax.Array] = None,
                 stage_two: bool = False) -> Tuple[jax.Array, Optional[jax.Array]]:
        """feat_2d: (B, s, s, C*D) collapsed aligned volume. embed: (B, E, E, 512) warp
        embed (used only when use_adanorm). Returns (rgb image (B, S, S, 3), img_f feature
        tap (B, S, S, C_last) when stage_two else None)."""
        c = self.cfg
        num_up, shared_ch, img_chans = _img_channels(c)
        sn = dict(use_ws=self.use_ws, use_sn=self.use_sn)
        norm = ("ada_" + c.norm) if c.use_adanorm else c.norm
        Res_ = ResBlock
        if self.remat_blocks:
            kw = {}
            if self.remat_policy == "dots":
                kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            Res_ = nn.remat(ResBlock, **kw)

        mods = None
        if c.use_adanorm:
            # 2 norms per res block + 2 per image up block (num_lrs_per_resolution each).
            n_norm = 2 * c.num_blocks
            for ch in img_chans:
                n_norm += 2 * c.num_lrs_per_resolution
            chan_list = [shared_ch] * (2 * c.num_blocks)
            prev = shared_ch
            for ch in img_chans:
                for k in range(c.num_lrs_per_resolution):
                    chan_list += [prev if k == 0 else ch, ch]
                    prev = ch
            mods = ProjectorNormLinear(tuple(chan_list), c.max_channels, c.embed_size,
                                       name="projector")(
                jnp.transpose(embed, (0, 3, 1, 2)).reshape(embed.shape[0], embed.shape[-1], -1))

        mi = 0
        # res_decoder.0 at sequential index 0 -> SN only
        x = Conv(shared_ch, (1, 1), use_bias=False, use_sn=self.use_sn,
                 name="in_conv")(feat_2d)
        for i in range(c.num_blocks):
            blk_mods = mods[mi:mi + 2] if mods is not None else None
            mi += 2
            x = Res_(shared_ch, shared_ch, norm=norm, activation=c.activation,
                     quant=c.serve_int8, name=f"res_{i}", **sn)(x, mods=blk_mods)

        # ---- image decoder (reference ImageDecoder, decoder.py:240-411) ----
        in_ch = shared_ch
        bi = 0
        for ch in img_chans:
            for k in range(c.num_lrs_per_resolution):
                blk_mods = mods[mi:mi + 2] if mods is not None else None
                mi += 2
                x = Res_(in_ch, ch, norm=norm, activation=c.activation,
                         stride=2 if k == 0 else 1,
                         resize="nearest" if k == 0 else "none",
                         quant=c.serve_int8,
                         name=f"img_{bi}", **sn)(x, mods=blk_mods)
                in_ch = ch
                bi += 1
        img_f = x

        # head: GN computes its stats in fp32 internally; keeping the 128-channel
        # tensor in the activation dtype halves the head's bandwidth at 512px. The
        # 3-channel logits are promoted to fp32 for the sigmoid.
        y = GroupNorm(in_ch, name="head_norm")(x)
        y = activation_fn(c.activation)(y)
        # dec_img_head conv follows a GN sibling -> WS-converted (bias kept, SN dropped)
        y = Conv(3, (1, 1), use_ws=self.use_ws, name="head_conv")(y)
        img = jax.nn.sigmoid(y.astype(jnp.float32))
        return img, (img_f if stage_two else None)
