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


class EmotionResNet18(nn.Module):
    """ResNet-18-trunk emotion tower with layer_1..layer_4 taps — the
    'resnet_emotions' perceptual backbone (reference ResNet18_ARM___RAF,
    losses/emotion_models.py; config va_losses_and_visuals.py:760-763:
    num_scales=1, resize 224, weights 0.25 each). `width` < 64 builds a
    shape-compatible miniature for tests/dryruns."""
    norm: str = "bn"
    width: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        from ..models.backbones.resnet import ResNet

        _, feats = ResNet(layers=(2, 2, 2, 2), block="basic", norm=self.norm,
                          base_width=self.width,
                          name="trunk")(x, return_features=True)
        return {f"layer_{i + 1}": f for i, f in enumerate(feats)}


def make_emotion_resnet_tower(rng: jax.Array, image_size: int = 224,
                              width: int = 64):
    tower = EmotionResNet18(width=width)
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params


def crop_faces_for_landmarks(images: jax.Array, boxes: jax.Array,
                             out_size: int = 112) -> jax.Array:
    """Batched `prepare_face_for_landmarks` (reference
    utils/prepare_for_landmark.py:36-83): square crop of side
    int(min(w,h)*1.2) centered on the face box, zero fill outside the frame,
    nearest resize to `out_size` (torch F.interpolate default mode) — the
    input prep for the MobileFaceNet landmark loss
    (va_losses_and_visuals.py:405-428). The reference loops per sample in
    python; this is one fused gather, jit/grad-safe.

    images: (N, H, W, C) float. boxes: (N, 4+) `[x1, y1, x2, y2, ...]` pixel
    coords (retina-face layout; extra confidence columns ignored).
    """
    n, H, W, _ = images.shape
    b = boxes[:, :4].astype(jnp.float32)
    w = b[:, 2] - b[:, 0] + 1.0
    h = b[:, 3] - b[:, 1] + 1.0
    size = jnp.floor(jnp.minimum(w, h) * 1.2).astype(jnp.int32)
    size = jnp.maximum(size, 1)
    cx = b[:, 0] + jnp.floor(w / 2.0)
    cy = b[:, 1] + jnp.floor(h / 2.0)
    x0 = cx - (size // 2).astype(jnp.float32)
    y0 = cy - (size // 2).astype(jnp.float32)

    def one(img, x0f, y0f, sz):
        # crop index per output pixel: torch nearest src = floor(j*in/out)
        k = (jnp.arange(out_size, dtype=jnp.int32) * sz) // out_size

        def axis(v0f, limit):
            # reference clamps, pads and truncates per side
            # (prepare_for_landmark.py:57-76): content starts at int(max(0,v0))
            # placed at pad offset int(max(0,-v0)), ends at int(min(limit, v0+size))
            iv1 = jnp.floor(jnp.maximum(v0f, 0.0)).astype(jnp.int32)
            dv = jnp.floor(jnp.maximum(-v0f, 0.0)).astype(jnp.int32)
            iv2 = jnp.floor(
                jnp.minimum(jnp.float32(limit), v0f + sz)).astype(jnp.int32)
            src = iv1 + k - dv
            valid = (k >= dv) & (src < iv2)
            return jnp.clip(src, 0, limit - 1), valid

        sx, vx = axis(x0f, W)
        sy, vy = axis(y0f, H)
        crop = img[sy[:, None], sx[None, :], :]
        return crop * (vy[:, None] & vx[None, :])[..., None].astype(img.dtype)

    return jax.vmap(one)(images, x0, y0, size)


# layer weights of the 'landmarks' perceptual config
# (va_losses_and_visuals.py:766-772)
LANDMARK_LAYERS = ("conv1", "conv2_dw", "conv_23", "conv_3", "conv_34",
                   "conv_4", "conv_45", "conv_5", "conv_6_sep", "output_layer")
LANDMARK_WEIGHTS = (0.05, 0.05, 0.05, 0.05, 0.1, 0.1, 0.3, 0.8, 1.0, 1.0)


def landmark_loss(tower_apply, tower_params, pred: jax.Array,
                  target: jax.Array, boxes: jax.Array):
    """The reference 'landmarks' loss (va_losses_and_visuals.py:405-428):
    crop pred/target to the face box, run the frozen landmark tower, L1 over
    its taps (num_scales=1, no normalization), and return the final-layer
    outputs for the stickman visuals. Returns (loss, (pred_lm, target_lm))."""
    from .perceptual import perceptual_loss

    pa = crop_faces_for_landmarks(pred, boxes)
    ta = crop_faces_for_landmarks(target, boxes)
    loss = perceptual_loss(tower_apply, tower_params, pa, ta, num_scales=1,
                           layers=LANDMARK_LAYERS,
                           layer_weights=LANDMARK_WEIGHTS,
                           normalization="none")
    pl = tower_apply(tower_params, pa)["output_layer"]
    tl = tower_apply(tower_params, ta)["output_layer"]
    return loss, (pl.reshape(pl.shape[0], -1), tl.reshape(tl.shape[0], -1))


def make_emotion_tower(rng: jax.Array, image_size: int = 55):
    tower = EmotionVGG()
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params


def make_landmark_tower(rng: jax.Array, image_size: int = 112):
    tower = MobileFaceNetFeatures()
    params = tower.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return tower.apply, params
