"""StyleGAN2 discriminator (`stylegan_discriminator_ds`, off in prod but part of the
training capability surface: use_stylegan_d flag, va.py:241-247; logistic + R1 losses in
losses/gan.py).

Reference: networks/basic_avatar/stylegan2Discriminator.py:90-315 — equalized-lr conv /
linear layers, blur-downsample residual blocks (gain 1/sqrt(2)), minibatch-stddev
feature, final 4x4 dense head. The CUDA upfirdn2d/fused_bias_act ops are replaced by
the fused XLA formulations in ops/upfirdn.py.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import StyleGAN2DConfig
from ..ops.upfirdn import blur, fused_leaky_relu, make_resample_kernel


class EqualConv(nn.Module):
    """Conv with runtime weight scale 1/sqrt(fan_in) (equalized learning rate)."""
    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.normal(1.0),
                            (k, k, in_ch, self.features))
        scale = 1.0 / math.sqrt(in_ch * k * k)
        pad = k // 2 if self.stride == 1 else 0
        y = jax.lax.conv_general_dilated(
            x, (kernel * scale).astype(x.dtype), (self.stride, self.stride),
            ((pad, pad), (pad, pad)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class EqualDense(nn.Module):
    features: int
    lr_mul: float = 1.0
    activate: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.normal(1.0 / self.lr_mul),
                            (in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = (1.0 / math.sqrt(in_ch)) * self.lr_mul
        y = x @ (kernel * scale).astype(x.dtype)
        if self.activate:
            return fused_leaky_relu(y, bias * self.lr_mul)
        return y + (bias * self.lr_mul).astype(y.dtype)


class ConvLayer(nn.Module):
    """[blur ->] equal-conv [-> fused leaky-relu] (reference ConvLayer, :179-222)."""
    features: int
    kernel_size: int
    downsample: bool = False
    activate: bool = True
    use_bias: bool = True
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            k = make_resample_kernel(self.blur_kernel)
            x = blur(x, k, pad=((p + 1) // 2, p // 2))
            stride = 2
        else:
            stride = 1
        x = EqualConv(self.features, self.kernel_size, stride,
                      use_bias=self.use_bias and not self.activate, name="conv")(x)
        if self.activate:
            bias = (self.param("act_bias", nn.initializers.zeros, (self.features,))
                    if self.use_bias else None)
            x = fused_leaky_relu(x, bias)
        return x


class SG2ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = ConvLayer(in_ch, 3, name="conv1")(x)
        out = ConvLayer(self.features, 3, downsample=True, name="conv2")(out)
        skip = ConvLayer(self.features, 1, downsample=True, activate=False,
                         use_bias=False, name="skip")(x)
        return (out + skip) / math.sqrt(2.0)


def minibatch_stddev(x: jax.Array, group: int = 4) -> jax.Array:
    """Append the cross-sample feature stddev channel (reference forward, :296-305)."""
    b, h, w, c = x.shape
    g = min(b, group)
    y = x.reshape(g, b // g, h, w, c)
    var = jnp.var(y, axis=0)
    std = jnp.sqrt(var + 1e-8)
    std = jnp.mean(std, axis=(1, 2, 3), keepdims=True)  # (b//g, 1, 1, 1)
    std = jnp.tile(std, (g, h, w, 1))
    return jnp.concatenate([x, std.astype(x.dtype)], axis=-1)


class DiscriminatorStyleGAN2(nn.Module):
    cfg: StyleGAN2DConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, S, S, 3). Returns (B, 1) logits."""
        c = self.cfg
        my_ch = 2
        channels = {
            4: 512, 8: 256 * my_ch, 16: 128 * my_ch * my_ch,
            32: 64 * my_ch * my_ch,
            64: 64 * my_ch * my_ch * c.channel_multiplier,
            128: 32 * my_ch * my_ch * c.channel_multiplier,
            256: 32 * my_ch * c.channel_multiplier,
            512: 16 * my_ch * c.channel_multiplier,
            1024: 16 * c.channel_multiplier,
        }
        x = ConvLayer(channels[c.size], 1, name="from_rgb")(x)
        log_size = int(math.log2(c.size))
        for i in range(log_size, 2, -1):
            x = SG2ResBlock(channels[2 ** (i - 1)], name=f"res_{i}")(x)
        x = minibatch_stddev(x)
        x = ConvLayer(channels[4], 3, name="final_conv")(x)
        b = x.shape[0]
        # torch flatten of NCHW is channel-major; match for port parity
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = EqualDense(channels[4], activate=True, name="final_linear_0")(x)
        return EqualDense(1, name="final_linear_1")(x)
