"""SE-ResNet-50: the VGGFace2 face-recognition backbone.

Reference: losses/senet50_ft_dag.py (536 LoC DAG export of senet50_ft) backing
Face_vector_resnet (networks/volumetric_avatar/utils.py:1449) and the face_resnet
perceptual tower (losses/perceptual.py 'face_resnet'). Standard SE-ResNet-50:
bottleneck blocks with squeeze-excitation gating (reduction 16); returns pooled
embeddings and the per-stage relu feature taps used by the perceptual engine.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import Conv, Dense
from .resnet import Norm, max_pool


class SEBlock(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = Dense(self.channels // self.reduction, name="fc1")(s)
        s = jax.nn.relu(s)
        s = Dense(self.channels, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class SEBottleneck(nn.Module):
    features: int
    stride: int = 1
    norm: str = "bn"
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = Norm(self.features, self.norm, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features, (3, 3), strides=self.stride, use_bias=False,
                   name="conv2")(out)
        out = Norm(self.features, self.norm, name="bn2")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = Norm(self.features * 4, self.norm, name="bn3")(out)
        out = SEBlock(self.features * 4, name="se")(out)
        skip = x
        if self.downsample:
            skip = Conv(self.features * 4, (1, 1), strides=self.stride,
                        use_bias=False, name="downsample_conv")(x)
            skip = Norm(self.features * 4, self.norm, name="downsample_bn")(skip)
        return jax.nn.relu(out + skip)


class SENet50(nn.Module):
    """Returns (embedding (B, 2048), {relu taps}).

    Default taps: relu1..relu5 per stage. With `block_taps=True` the taps are
    instead the per-BLOCK output relus named relu1..relu{sum(layers)} — the
    shape of the reference face_resnet perceptual config, which taps 16
    interior relus of senet50_ft_dag (losses/perceptual.py:533-559; our taps
    are the block outputs rather than that exact child-index selection — a
    frozen-tower tap choice; the loss has zero prod weight)."""
    norm: str = "bn"
    layers: Sequence[int] = (3, 4, 6, 3)
    block_taps: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        taps = {}
        x = Conv(64, (7, 7), strides=2, use_bias=False, name="conv1")(x)
        x = Norm(64, self.norm, name="bn1")(x)
        x = jax.nn.relu(x)
        if not self.block_taps:
            taps["relu1"] = x
        x = max_pool(x, 3, 2, 1)
        feats = 64
        block_i = 0
        for li, n_blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                x = SEBottleneck(
                    feats, stride if bi == 0 else 1, self.norm,
                    downsample=(bi == 0), name=f"layer{li + 1}_{bi}")(x)
                block_i += 1
                if self.block_taps:
                    taps[f"relu{block_i}"] = x
            if not self.block_taps:
                taps[f"relu{li + 2}"] = x
            feats *= 2
        emb = jnp.mean(x, axis=(1, 2))
        return emb, taps
