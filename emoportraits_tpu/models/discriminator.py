"""Multi-scale PatchGAN discriminator (`discriminator_ds`).

Reference: networks/basic_avatar/multiscale_discriminator.py:9-105 — per scale, a stack of
conv->instance-norm->leaky-relu blocks (stride 2 except the last) + 1x1 score head;
scales formed by avg-pooling the input. Prod: num_scales 2, num_blocks 4, base 64ch.

Returns per-scale score maps and per-scale feature pyramids for feature matching.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DiscriminatorConfig
from ..ops.blocks import Conv, avg_pool


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False), torch default for the discriminator blocks."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class PatchDiscriminator(nn.Module):
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        c = self.cfg
        features = []
        for i in range(c.num_blocks):
            out_ch = min(c.min_channels * 2 ** i, c.max_channels)
            x = Conv(out_ch, (3, 3), strides=2 if i < c.num_blocks - 1 else 1,
                     use_bias=False, name=f"block_{i}")(x)
            x = instance_norm(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            features.append(x)
        scores = Conv(1, (1, 1), name="to_scores")(x)
        return scores, features


class MultiScaleDiscriminator(nn.Module):
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: (B, S, S, C). Returns (scores: list per scale, features: list per scale of
        per-block lists)."""
        scores, features = [], []
        for i in range(self.cfg.num_scales):
            s, f = PatchDiscriminator(self.cfg, name=f"net_{i}")(x)
            scores.append(s)
            features.append(f)
            if i < self.cfg.num_scales - 1:
                x = avg_pool(x, 2)
        return scores, features
