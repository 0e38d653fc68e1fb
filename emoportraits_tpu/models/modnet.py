"""MODNet portrait matting (exact architecture of the released checkpoint).

The reference mattes generated mixing images with the external `repos/MODNet`
(`modnet_photographic_portrait_matting.ckpt`), wrapped at
va_losses_and_visuals.py:1108-1160 (normalize to [-1,1], resize to a /32-divisible
ref size, sigmoid matte). This file reimplements that network in flax with the same
structure so the checkpoint ports 1:1 via port.towers_port.port_modnet:

  * MobileNetV2 trunk (stem + 17 inverted residuals + 1x1 to 1280), enc taps at
    2x/4x/32x (`lr_branch.backbone.model.features.{0..18}`);
  * LR branch: SE block + two 5x5 IBNorm convs (semantic path);
  * HR branch: detail path fusing image pyramids with enc2x/enc4x/lr8x;
  * Fusion branch: final matte head, sigmoid.

IBNorm = BatchNorm (inference stats) on the first half of channels, unparameterized
InstanceNorm on the second half. `models/matting.py` remains as the lightweight
random-init stand-in for tests; this module is the port target.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# MobileNetV2 inverted-residual plan (expansion t, out channels c, repeats n, stride s)
_MBV2_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
              (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
ENC_CHANNELS = (16, 24, 32, 96, 1280)
HR_CHANNELS = 32


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _resize2x(x, up: bool = True, factor: int = 2):
    """torch F.interpolate(bilinear, align_corners=False, antialias=False) at
    power-of-2 scales. Upscale: identical half-pixel convention to jax.image.resize
    'linear'. Downscale: torch does NOT antialias — at even integer factor f the
    half-pixel sample lands midway between two pixels, i.e. a 2-tap average per axis
    (jax.image.resize would low-pass, diverging from the checkpoint's semantics)."""
    b, h, w, c = x.shape
    if up:
        return jax.image.resize(x, (b, h * factor, w * factor, c), method="linear")
    f, o = factor, factor // 2 - 1
    x = 0.5 * (x[:, o::f][:, : h // f] + x[:, o + 1::f][:, : h // f])
    x = 0.5 * (x[:, :, o::f][:, :, : w // f] + x[:, :, o + 1::f][:, :, : w // f])
    return x


class TorchConv(nn.Module):
    """Plain conv with torch-compatible param naming (kernel HWIO) + groups."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.groups
        k = self.param("kernel", nn.initializers.he_normal(),
                       (self.kernel, self.kernel, in_ch, self.features))
        y = jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride),
            ((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class BNInference(nn.Module):
    """BatchNorm with stored running stats (frozen-net usage)."""
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.channels,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.channels,), jnp.float32))
        return (x - mean.value) * jax.lax.rsqrt(var.value + self.eps) * scale + bias


class IBNorm(nn.Module):
    """First half: BatchNorm (affine, running stats); second half: InstanceNorm
    (no affine) — MODNet src/models/modnet.py IBNorm."""
    channels: int

    @nn.compact
    def __call__(self, x):
        half = self.channels // 2
        bn = BNInference(half, name="bnorm")(x[..., :half])
        inorm_in = x[..., half:]
        mu = jnp.mean(inorm_in, axis=(1, 2), keepdims=True)
        var = jnp.var(inorm_in, axis=(1, 2), keepdims=True)
        inorm = (inorm_in - mu) * jax.lax.rsqrt(var + 1e-5)
        return jnp.concatenate([bn, inorm], axis=-1)


class ConvIBNormRelu(nn.Module):
    """Conv2dIBNormRelu: conv (+IBNorm) (+ReLU)."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    with_ibn: bool = True
    with_relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, self.kernel, self.stride, self.padding,
                      use_bias=True, name="conv")(x)
        if self.with_ibn:
            x = IBNorm(self.features, name="ibn")(x)
        if self.with_relu:
            x = jax.nn.relu(x)
        return x


class SEBlock(nn.Module):
    channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        w = jnp.mean(x, axis=(1, 2))
        w = w @ self.param("fc0", nn.initializers.he_normal(),
                           (self.channels, self.channels // self.reduction))
        w = jax.nn.relu(w)
        w = w @ self.param("fc1", nn.initializers.he_normal(),
                           (self.channels // self.reduction, self.channels))
        return x * jax.nn.sigmoid(w)[:, None, None, :]


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    expansion: int

    @nn.compact
    def __call__(self, x):
        hidden = self.in_ch * self.expansion
        y = x
        i = 0
        if self.expansion != 1:
            y = TorchConv(hidden, 1, use_bias=False, name=f"conv_{i}")(y)
            y = BNInference(hidden, name=f"bn_{i + 1}")(y)
            y = _relu6(y)
            i += 3
        y = TorchConv(hidden, 3, self.stride, 1, groups=hidden, use_bias=False,
                      name=f"conv_{i}")(y)
        y = BNInference(hidden, name=f"bn_{i + 1}")(y)
        y = _relu6(y)
        i += 3
        y = TorchConv(self.out_ch, 1, use_bias=False, name=f"conv_{i}")(y)
        y = BNInference(self.out_ch, name=f"bn_{i + 1}")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            return x + y
        return y


class MobileNetV2Backbone(nn.Module):
    """MODNet's MobileNetV2 wrapper: taps at features[1] (2x), [3] (4x), [18] (32x)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = TorchConv(32, 3, 2, 1, use_bias=False, name="features_0_conv")(x)
        x = _relu6(BNInference(32, name="features_0_bn")(x))
        idx = 1
        in_ch = 32
        taps = {}
        for t, c, n, s in _MBV2_PLAN:
            for bi in range(n):
                x = InvertedResidual(in_ch, c, s if bi == 0 else 1, t,
                                     name=f"features_{idx}")(x)
                in_ch = c
                if idx == 1:
                    taps["enc2x"] = x
                if idx == 3:
                    taps["enc4x"] = x
                idx += 1
        x = TorchConv(1280, 1, use_bias=False, name="features_18_conv")(x)
        x = _relu6(BNInference(1280, name="features_18_bn")(x))
        return taps["enc2x"], taps["enc4x"], x


class MODNet(nn.Module):
    """Inference matte path (pred_matte of MODNet.forward). Input: (B, H, W, 3)
    normalized to [-1, 1], H/W divisible by 32. Output: (B, H, W, 1) in [0, 1]."""

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        e = ENC_CHANNELS
        hr = HR_CHANNELS

        # ---- LR (semantic) branch ----
        enc2x, enc4x, enc32x = MobileNetV2Backbone(name="backbone")(img)
        enc32x = SEBlock(e[4], name="se_block")(enc32x)
        lr16x = ConvIBNormRelu(e[3], 5, 1, 2, name="conv_lr16x")(_resize2x(enc32x))
        lr8x = ConvIBNormRelu(e[2], 5, 1, 2, name="conv_lr8x")(_resize2x(lr16x))

        # ---- HR (detail) branch ----
        img2x = _resize2x(img, up=False)
        img4x = _resize2x(img, up=False, factor=4)
        enc2x = ConvIBNormRelu(hr, 1, 1, 0, name="tohr_enc2x")(enc2x)
        hr4x = ConvIBNormRelu(hr, 3, 2, 1, name="conv_enc2x")(
            jnp.concatenate([img2x, enc2x], axis=-1))
        enc4x = ConvIBNormRelu(hr, 1, 1, 0, name="tohr_enc4x")(enc4x)
        hr4x = ConvIBNormRelu(2 * hr, 3, 1, 1, name="conv_enc4x")(
            jnp.concatenate([hr4x, enc4x], axis=-1))
        lr4x = _resize2x(lr8x)
        x = jnp.concatenate([hr4x, lr4x, img4x], axis=-1)
        for i, ch in enumerate((2 * hr, 2 * hr, hr)):
            x = ConvIBNormRelu(ch, 3, 1, 1, name=f"conv_hr4x_{i}")(x)
        hr2x = _resize2x(x)
        x = jnp.concatenate([hr2x, enc2x], axis=-1)
        for i, ch in enumerate((2 * hr, hr, hr, hr)):
            x = ConvIBNormRelu(ch, 3, 1, 1, name=f"conv_hr2x_{i}")(x)
        hr2x = x

        # ---- fusion branch ----
        lr4x = ConvIBNormRelu(hr, 5, 1, 2, name="conv_lr4x")(_resize2x(lr8x))
        lr2x = _resize2x(lr4x)
        f2x = ConvIBNormRelu(hr, 3, 1, 1, name="conv_f2x")(
            jnp.concatenate([lr2x, hr2x], axis=-1))
        f = _resize2x(f2x)
        f = ConvIBNormRelu(hr // 2, 3, 1, 1, name="conv_f_0")(
            jnp.concatenate([f, img], axis=-1))
        f = ConvIBNormRelu(1, 1, 1, 0, with_ibn=False, with_relu=False,
                           name="conv_f_1")(f)
        return jax.nn.sigmoid(f)


def modnet_matte(apply_fn, variables, img01: jax.Array,
                 ref_size: int = 512) -> jax.Array:
    """Reference MODNET wrapper semantics (va_losses_and_visuals.py:1126-1160):
    normalize [0,1] -> [-1,1], resize so the short side is ~ref_size rounded to /32,
    run the matte, resize back."""
    b, h, w, _ = img01.shape
    x = img01 * 2.0 - 1.0
    if max(h, w) < ref_size or min(h, w) > ref_size:
        if w >= h:
            rh, rw = ref_size, int(w / h * ref_size)
        else:
            rh, rw = int(h / w * ref_size), ref_size
    else:
        rh, rw = h, w
    rh, rw = rh - rh % 32, rw - rw % 32
    x = jax.image.resize(x, (b, rh, rw, 3), method="linear")
    alpha = apply_fn(variables, x)
    return jax.image.resize(alpha, (b, h, w, 1), method="linear")
