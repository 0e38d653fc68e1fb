"""VPN_ResBlocks: a plain stack of 3D residual blocks run on the latent volume before the
first warp (`volume_source_nw`) and optionally before the decoder (`volume_pred_nw`).

Reference: networks/volumetric_avatar/vpn_resblocks.py:22 -> resblocks_3d.py:9.
Prod: source_volume_num_blocks 3 (experiments/args.txt).
"""
from __future__ import annotations

import jax
from flax import linen as nn

from ..config import VPNResBlocksConfig
from ..ops.blocks import ResBlock


class VPNResBlocks(nn.Module):
    cfg: VPNResBlocksConfig
    use_ws: bool = True
    use_sn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, D, H, W, C) latent volume."""
        c = self.cfg
        for i in range(c.num_blocks):
            x = ResBlock(c.channels, c.channels, ndim=3, norm=c.norm,
                         activation=c.activation, use_ws=self.use_ws,
                         use_sn=self.use_sn, name=f"block_{i}")(x)
        return x
