"""Emotion and landmark towers (reference 'unused extras', SURVEY.md §2.4 — present in
the loss zoo with zero prod weight; implemented for capability parity).

Reference:
  * vgg_emotions / resnet_emotions perceptual towers (losses/emotion_models.py, used by
    init_losses va_losses_and_visuals.py:755-764: grayscale 55px multi-scale VGG
    features / resnet18-ARM layer features);
  * MobileFaceNet landmark tower (losses/landmark_loss.py:18 + the 'landmarks'
    perceptual config, :767-775).

The engines reuse losses/perceptual.perceptual_loss; this module provides the towers:
a compact grayscale emotion CNN with VGG-style stages and a depthwise-separable
MobileFaceNet-style landmark feature net with named taps.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv


def to_grayscale3(img: jax.Array) -> jax.Array:
    """Luma conversion replicated to 3 channels (reference perceptual.py:154-160)."""
    g = img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.repeat(g[..., None], 3, axis=-1)


class EmotionVGG(nn.Module):
    """Grayscale emotion tower: VGG-style stages with relu_{s}_1 taps (drop-in for the
    vgg_emotions perceptual backbone; resize to 55px handled by the engine)."""
    stages: Tuple[Tuple[int, int], ...] = ((2, 32), (2, 64), (2, 128), (2, 256), (2, 256))

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        feats = {}
        for si, (n_convs, ch) in enumerate(self.stages, start=1):
            for ci in range(1, n_convs + 1):
                x = Conv(ch, (3, 3), name=f"conv{si}_{ci}")(x)
                x = jax.nn.relu(x)
                if ci == 1:
                    feats[f"relu_{si}_1"] = x
            if si < len(self.stages) and min(x.shape[1:3]) > 2:
                x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
        return feats


class DepthwiseSeparable(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = Conv(in_ch, (3, 3), strides=self.stride, feature_group_count=in_ch,
                 use_bias=False, name="dw")(x)
        x = jax.nn.relu(x)
        x = Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        return jax.nn.relu(x)


class MobileFaceNetFeatures(nn.Module):
    """Landmark tower: depthwise-separable stack with the reference's tap names
    (conv1, conv2_dw, conv_23, conv_3, conv_34, conv_4, conv_45, conv_5, conv_6_sep,
    output_layer) for the 'landmarks' perceptual config."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        feats = {}
        x = Conv(64, (3, 3), strides=2, use_bias=False, name="conv1_conv")(x)
        x = jax.nn.relu(x)
        feats["conv1"] = x
        x = DepthwiseSeparable(64, name="conv2_dw_m")(x)
        feats["conv2_dw"] = x
        x = DepthwiseSeparable(64, stride=2, name="conv_23_m")(x)
        feats["conv_23"] = x
        x = DepthwiseSeparable(64, name="conv_3_m")(x)
        feats["conv_3"] = x
        x = DepthwiseSeparable(128, stride=2, name="conv_34_m")(x)
        feats["conv_34"] = x
        x = DepthwiseSeparable(128, name="conv_4_m")(x)
        feats["conv_4"] = x
        x = DepthwiseSeparable(128, stride=2, name="conv_45_m")(x)
        feats["conv_45"] = x
        x = DepthwiseSeparable(128, name="conv_5_m")(x)
        feats["conv_5"] = x
        x = Conv(512, (1, 1), use_bias=False, name="conv_6_sep_conv")(x)
        x = jax.nn.relu(x)
        feats["conv_6_sep"] = x
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        feats["output_layer"] = Conv(128, (1, 1), name="output_conv")(x)
        return feats


def make_emotion_tower(rng: jax.Array, image_size: int = 55):
    tower = EmotionVGG()
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params


def make_landmark_tower(rng: jax.Array, image_size: int = 112):
    tower = MobileFaceNetFeatures()
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params
