"""upfirdn2d + fused bias-act: the StyleGAN2 resampling primitives, TPU-native.

Reference ships these as CUDA kernels with pybind11 wrappers
(networks/basic_avatar/op/upfirdn2d.cpp + upfirdn2d_kernel.cu (368 LoC),
fused_bias_act.cpp + fused_bias_act_kernel.cu; python fallbacks at
stylegan2Discriminator.py:16-57 and op/fused_act.py:21). The CUDA kernels exist because
cuDNN can't fuse zero-insertion-upsample -> FIR -> stride; XLA CAN: a single
`conv_general_dilated` with lhs_dilation handles upsample+FIR+downsample in one fused
TPU op — this is the speed-of-light formulation on this hardware, no Pallas needed.

Semantics match upfirdn2d(input, kernel, up, down, pad): zero-stuff by `up`, pad by
`pad` (can be negative), correlate with the 2D FIR kernel, subsample by `down`.
Channels-last (B, H, W, C); the FIR kernel is shared across channels (depthwise).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def make_resample_kernel(k: Sequence[float]) -> jnp.ndarray:
    """1D taps -> normalized 2D separable FIR kernel (StyleGAN2 make_kernel)."""
    k1 = np.asarray(k, np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    return jnp.asarray(k2)


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jax.Array:
    """x: (B, H, W, C); kernel: (kh, kw). pad = (pad0, pad1) applied on both axes
    (reference op/upfirdn2d.py semantics: pad_x0=pad_y0=pad[0], pad_x1=pad_y1=pad[1])."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    # FIR filtering is correlation with the flipped kernel in conv terms; StyleGAN2's
    # native op computes plain correlation with kernel[::-1] pre-flip... net effect for
    # conv_general_dilated (which correlates) is the flipped kernel.
    kern = jnp.flip(kernel, (0, 1)).astype(jnp.float32)
    rhs = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), rhs,
        window_strides=(down, down),
        # lhs_dilation inserts zeros BETWEEN samples only; the reference zero-stuffing
        # also appends up-1 trailing zeros -> fold them into the high padding.
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(x.dtype)


def upsample_2x(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """StyleGAN2 Upsample(factor=2): upfirdn(x, k*4, up=2, pad=(p+1)//2+1, p//2)."""
    k = kernel * 4.0
    p = kernel.shape[0] - 2
    return upfirdn2d(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))


def downsample_2x(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """StyleGAN2 Downsample(factor=2): upfirdn(x, k, down=2, pad=(p+1)//2, p//2)."""
    p = kernel.shape[0] - 2
    return upfirdn2d(x, kernel, down=2, pad=((p + 1) // 2, p // 2))


def blur(x: jax.Array, kernel: jax.Array, pad: Tuple[int, int],
         upsample_factor: int = 1) -> jax.Array:
    """StyleGAN2 Blur layer (stylegan2Discriminator.py:159-177)."""
    k = kernel * (upsample_factor ** 2) if upsample_factor > 1 else kernel
    return upfirdn2d(x, k, pad=pad)


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jax.Array:
    """bias + leaky-relu + sqrt(2) gain in one op (reference op/fused_act.py:21-133;
    XLA fuses this elementwise chain into the surrounding op)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * jnp.asarray(scale, x.dtype)
