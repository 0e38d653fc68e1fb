"""IdtEmbed (`idt_embedder_nw`): identity embedding from the masked source image.

Reference: networks/volumetric_avatar/identity_embedder.py:12-93 — ResNet-50 trunk
(BN replaced by GN in prod, :49), fc replaced by a 1x1 conv to 512 channels, adaptive
avgpool to a 4x4x512 spatial embed, ImageNet normalization, mean over source frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import IdtEmbedConfig
from ..ops.blocks import Conv
from .backbones.resnet import ResNet

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def _adaptive_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """(out, in) row-stochastic averaging matrix with torch AdaptiveAvgPool2d windows:
    start = floor(i*in/out), end = ceil((i+1)*in/out)."""
    import numpy as np

    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = (i * in_size) // out_size
        e = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return jnp.asarray(m)


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, out, out, C), exact torch AdaptiveAvgPool2d semantics,
    expressed as two per-axis averaging matmuls (MXU-friendly, any in/out ratio)."""
    b, h, w, c = x.shape
    wh = _adaptive_pool_matrix(h, out_size).astype(x.dtype)
    ww = _adaptive_pool_matrix(w, out_size).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


class IdtEmbed(nn.Module):
    cfg: IdtEmbedConfig
    # reference lists idt_embedder_nw in spn_networks + ws_networks
    # (va_arguments.py:158-163); the trunk follows the sibling WS/SN rule
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, source_img: jax.Array) -> jax.Array:
        """source_img: (B*n, S, S, 3) masked source. Returns (B, 4, 4, 512)."""
        c = self.cfg
        x = jax.image.resize(
            source_img,
            (source_img.shape[0], c.image_size, c.image_size, 3), method="linear")
        x = (x - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
        layers = (3, 4, 6, 3) if c.backbone == "resnet50" else (2, 2, 2, 2)
        block = "bottleneck" if c.backbone == "resnet50" else "basic"
        feat = ResNet(layers=layers, block=block, norm=c.norm,
                      base_width=c.backbone_width, use_ws=self.use_ws,
                      use_sn=self.use_sn, name="net")(x)
        feat = Conv(c.output_channels, (1, 1), use_bias=False, use_sn=self.use_sn,
                    name="fc")(feat)
        feat = adaptive_avg_pool(feat, c.output_size)
        n = c.num_source_frames
        b = feat.shape[0] // n
        return jnp.mean(feat.reshape(b, n, *feat.shape[1:]), axis=1)
