"""FaceParsing: frozen BiSeNet (19-class face parsing) + label->mask reduction.

Reference: networks/volumetric_avatar/face_parcing.py:9-100 wraps the external
`repos/face_par_off` BiSeNet (zllrunning face-parsing, ResNet-18 context path +
attention-refinement + feature-fusion) with ImageNet normalization, 512px resize, and
label-set reductions (face/ears/neck/hair/hat/cloth -> binary masks). The architecture
is reimplemented here in flax with torch-compatible parameter naming so the released
`79999_iter.pth` weights port 1:1 via emoportraits_tpu.port.

Used for: use_mix_mask mask refinement in training (va.py:297-361) and source masking at
inference (infer.py:410-424). Frozen: callers must not differentiate through it.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnet import ResNet
from .identity_embedder import IMAGENET_MEAN, IMAGENET_STD
from ..ops.blocks import Conv

# label sets (reference face_parcing.py:36-53)
MASK_LABELS = (1, 2, 3, 4, 5, 6, 10, 11, 12, 13, 7, 8, 9, 14, 17, 18)
FACE_LABELS = (1, 2, 3, 4, 5, 6, 10, 11, 12, 13, 7, 8, 9, 17, 18)
BODY_LABELS = (18,)
CLOTH_LABELS = (16,)
# part groups used by the eyes/mouth/ears L1 losses (va_losses_and_visuals.py:183-243)
EYES_LABELS = (4, 5)
MOUTH_LABELS = (11, 12, 13)
EARS_LABELS = (7, 8)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                 use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        x = (x - mean.value) * jax.lax.rsqrt(var.value + 1e-5) * scale + bias
        return jax.nn.relu(x)


class AttentionRefinement(nn.Module):
    """ARM: conv3x3 then global-context sigmoid gating."""
    features: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.features, name="conv")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = Conv(self.features, (1, 1), use_bias=False, name="conv_atten")(atten)
        scale = self.param("bn_atten_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_atten_bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "atten_mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "atten_var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        atten = (atten - mean.value) * jax.lax.rsqrt(var.value + 1e-5) * scale + bias
        return feat * jax.nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, sp, cp):
        x = jnp.concatenate([sp, cp], axis=-1)
        feat = ConvBNReLU(self.features, kernel=1, name="convblk")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = Conv(self.features // 4, (1, 1), use_bias=False, name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = Conv(self.features, (1, 1), use_bias=False, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat + feat * atten


def _resize_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="linear")


def _resize_nearest(x, h, w):
    """Context-path upsampling (reference repo uses F.interpolate mode='nearest')."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="nearest")


def _resize_bilinear_align_corners(x, h, w):
    """torch F.interpolate(..., mode='bilinear', align_corners=True): corner pixels
    map exactly to corners (the final logits upsample of the reference BiSeNet)."""
    H, W = x.shape[1], x.shape[2]
    ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (ys - y0)[None, :, None, None].astype(x.dtype)
    fx = (xs - x0)[None, None, :, None].astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


class BiSeNet(nn.Module):
    n_classes: int = 19

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, 3) ImageNet-normalized. Returns (B, H, W, n_classes) logits."""
        h, w = x.shape[1:3]
        _, feats = ResNet(layers=(2, 2, 2, 2), block="basic", norm="bn",
                          name="resnet")(x, return_features=True)
        feat8, feat16, feat32 = feats[1], feats[2], feats[3]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, kernel=1, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        feat32_arm = AttentionRefinement(128, name="arm32")(feat32) + avg_up
        # context-path upsamples are NEAREST in the reference repo's model.py
        feat32_up = _resize_nearest(feat32_arm, feat16.shape[1], feat16.shape[2])
        feat32_up = ConvBNReLU(128, name="conv_head32")(feat32_up)

        feat16_arm = AttentionRefinement(128, name="arm16")(feat16) + feat32_up
        feat16_up = _resize_nearest(feat16_arm, feat8.shape[1], feat8.shape[2])
        feat16_up = ConvBNReLU(128, name="conv_head16")(feat16_up)

        fused = FeatureFusion(256, name="ffm")(feat8, feat16_up)
        out = ConvBNReLU(256, name="conv_out")(fused)
        # BiSeNetOutput.conv_out: 1x1, bias=False; final upsample is bilinear with
        # align_corners=True
        out = Conv(self.n_classes, (1, 1), use_bias=False, name="conv_out_head")(out)
        return _resize_bilinear_align_corners(out, h, w)


def normalize_for_parsing(img: jax.Array) -> jax.Array:
    """ImageNet-normalize a [0,1] image for BiSeNet (reference face_parcing.py:57-59)."""
    return (img - IMAGENET_MEAN.astype(img.dtype)) / IMAGENET_STD.astype(img.dtype)


def soft_part_masks(logits: jax.Array) -> Dict[str, jax.Array]:
    """Soft eyes/mouth/ears masks from parsing logits.

    The reference's face-part L1s use SOFT class probabilities from its parser
    (`logits_gt_soft`, va_losses_and_visuals.py:183-243) summed over each part's label
    set; here the probabilities come from BiSeNet softmax. logits: (B, H, W, 19) ->
    dict of (B, H, W, 1) soft masks in [0, 1].
    """
    probs = jax.nn.softmax(logits, axis=-1)

    def mask_of(label_set: Sequence[int]) -> jax.Array:
        return jnp.sum(probs[..., jnp.asarray(label_set)], axis=-1, keepdims=True)

    return {"eyes": mask_of(EYES_LABELS), "mouth": mask_of(MOUTH_LABELS),
            "ears": mask_of(EARS_LABELS)}


def binary_face_mask(logits: jax.Array,
                     labels_set: Sequence[int] = MASK_LABELS) -> jax.Array:
    """Hard face/hair/neck mask from parsing logits (argmax-label membership), the
    use_mix_mask refinement operand (reference va.py:352-361, use_ibug_mask=False
    branch: `(face_mask > 0.6).float()` on the binary label mask)."""
    labels = jnp.argmax(logits, axis=-1, keepdims=True)
    m = jnp.zeros_like(labels, jnp.float32)
    for i in labels_set:
        m = m + (labels == i)
    return jnp.clip(m, 0.0, 1.0)


class FaceParser:
    """User-facing wrapper with the reference's normalization + label reductions."""

    def __init__(self, variables=None):
        self.net = BiSeNet()
        self.variables = variables
        self._apply = jax.jit(self.net.apply)

    def init(self, rng, image_size: int = 512):
        self.variables = self.net.init(rng, jnp.zeros((1, image_size, image_size, 3)))
        return self.variables

    def __call__(self, img: jax.Array) -> Dict[str, jax.Array]:
        """img (B, H, W, 3) in [0,1] -> dict of binary masks (B, H, W, 1)."""
        x = (img - IMAGENET_MEAN.astype(img.dtype)) / IMAGENET_STD.astype(img.dtype)
        x = _resize_to(x, 512, 512)
        logits = self._apply(self.variables, x)
        logits = _resize_to(logits, img.shape[1], img.shape[2])
        labels = jnp.argmax(logits, axis=-1, keepdims=True)

        def mask_of(label_set: Sequence[int]):
            m = jnp.zeros_like(labels, jnp.float32)
            for i in label_set:
                m = m + (labels == i)
            return jnp.clip(m, 0.0, 1.0)

        return {
            "mask": mask_of(MASK_LABELS),
            "face": mask_of(FACE_LABELS),
            "body": mask_of(BODY_LABELS),
            "cloth": mask_of(CLOTH_LABELS),
            "eyes": mask_of(EYES_LABELS),
            "mouth": mask_of(MOUTH_LABELS),
            "ears": mask_of(EARS_LABELS),
        }
