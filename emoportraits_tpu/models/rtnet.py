"""RTNet-role face parser: dilated ResNet-50 + FCN head in RoI tanh-polar space.

Reference: `FaceParsingBUG` (utils/non_specific.py:246-282) wraps the external
`ibug.face_parsing.FaceParser` (encoder='rtnet50', decoder='fcn', num_classes=14)
plus a RetinaFace detector; va.py:297-330 (use_ibug_mask + use_old_fp=False) loops it
per sample to build face masks, falling back to the BiSeNet `face_idt` towers when
the external stack is absent. The external repo ships as a zip, not in the reference
git tree, so exact-weight parity is not verifiable here; this module provides the
architecture ROLE — a 14-class tanh-polar-space parser with the published
FCN-ResNet50 trunk layout (output-stride 8 via stage-3/4 dilation; torchvision
`replace_stride_with_dilation=[False, True, True]` naming, port-compatible with that
checkpoint family) — and `get_lips`-equivalent mask math, vmapped over the batch
instead of the reference's python loop (va.py:303-318).

The RoI comes from the 68 landmarks already present in every training batch
(geometry/roi_tanh_polar.roi_from_keypoints) instead of an external RetinaFace pass
— deterministic and jittable, so the whole parse runs inside the train step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.roi_tanh_polar import (
    roi_from_keypoints,
    roi_tanh_polar_restore,
    roi_tanh_polar_warp,
)
from ..ops.blocks import Conv
from .backbones.resnet import Norm, ResNet

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FCNHead(nn.Module):
    """torchvision FCNHead: 3x3 conv (C -> C/4) + norm + relu + 1x1 classifier."""
    num_classes: int
    norm: str = "bn"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1] // 4
        x = Conv(c, (3, 3), use_bias=False, name="conv0")(x)
        x = Norm(c, self.norm, name="bn0")(x)
        x = jax.nn.relu(x)
        # dropout(0.1) in torch is identity at inference; the parser is frozen here
        return Conv(self.num_classes, (1, 1), name="classifier")(x)


class RTNetParser(nn.Module):
    """Frozen 14-class face parser operating on the tanh-polar plane."""
    num_classes: int = 14
    # tanh-polar working resolution (the parser's fixed input size)
    polar_size: int = 256
    norm: str = "bn"
    # miniature trunks for tests/dryruns (names unchanged; only 64 ports)
    base_width: int = 64

    def setup(self):
        self.backbone = ResNet(
            layers=(3, 4, 6, 3), block="bottleneck", norm=self.norm,
            base_width=self.base_width,
            replace_stride_with_dilation=(False, True, True), name="backbone")
        self.head = FCNHead(self.num_classes, norm=self.norm, name="head")

    def logits_polar(self, polar_img: jax.Array) -> jax.Array:
        """(B, P, P, 3) tanh-polar image in [0,1] -> (B, P, P, num_classes)."""
        mean = jnp.asarray(IMAGENET_MEAN, polar_img.dtype)
        std = jnp.asarray(IMAGENET_STD, polar_img.dtype)
        x = (polar_img - mean) / std
        feat = self.backbone(x)  # (B, P/8, P/8, 2048)
        logits = self.head(feat)
        b = logits.shape[0]
        return jax.image.resize(
            logits, (b, polar_img.shape[1], polar_img.shape[2], self.num_classes),
            method="bilinear")

    def __call__(self, images: jax.Array, rois: jax.Array) -> jax.Array:
        """Face-probability map in the IMAGE frame: warp -> parse -> softmax ->
        1 - P(background) -> restore (the get_lips pipeline with
        desired_indexes=[0], non_specific.py:276-282 + va.py:310-316)."""
        p = self.polar_size
        polar = roi_tanh_polar_warp(images, rois, p, p)
        logits = self.logits_polar(polar)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        # channel 0 becomes "anything but background"
        probs = probs.at[..., 0].set(1.0 - probs[..., 0])
        restored = roi_tanh_polar_restore(
            probs, rois, images.shape[1], images.shape[2])
        return restored[..., :1]  # (B, H, W, 1) face probability

    def face_mask_from_keypoints(self, images: jax.Array,
                                 keypoints: jax.Array) -> jax.Array:
        rois = roi_from_keypoints(keypoints, images.shape[1])
        return self(images, rois)


def tiny_rtnet(num_classes: int = 14) -> RTNetParser:
    """Interface-parity miniature for tests and the multichip dryrun."""
    return RTNetParser(num_classes=num_classes, polar_size=32, base_width=8)
