"""Image quality metrics: PSNR, SSIM, MS-SSIM — the reference's per-epoch eval metrics.

Reference: losses/psnr.py:5 (PSNR), pytorch_msssim (pip) for SSIM/MS-SSIM
(losses/__init__.py:14, init_losses at va_losses_and_visuals.py:788-790:
data_range=1, size_average=True, channel=3). SSIM here follows the same construction:
11x11 Gaussian window, sigma 1.5, K1=0.01, K2=0.03, separable depthwise filtering.

All functions take channels-last (B, H, W, C) images in [0, 1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio, batch-averaged (reference losses/psnr.py:5)."""
    mse = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    return jnp.mean(20 * jnp.log10(data_range / jnp.sqrt(jnp.maximum(mse, 1e-12))))


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    coords = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(g)


def _gaussian_filter(x: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable depthwise Gaussian blur, VALID padding (pytorch_msssim semantics)."""
    g = _gaussian_kernel(size, sigma)
    c = x.shape[-1]
    kh = jnp.tile(g.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return x


def _ssim_components(x, y, data_range=1.0, size=11, sigma=1.5):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _gaussian_filter(x, size, sigma)
    mu_y = _gaussian_filter(y, size, sigma)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _gaussian_filter(x * x, size, sigma) - mu_xx
    sigma_y = _gaussian_filter(y * y, size, sigma) - mu_yy
    sigma_xy = _gaussian_filter(x * y, size, sigma) - mu_xy
    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    ssim_map, _ = _ssim_components(pred, target, data_range)
    return jnp.mean(ssim_map)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM with the standard 5-level weights (pytorch_msssim defaults)."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS, pred.dtype)
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    x, y = pred, target
    for i in range(levels):
        ssim_map, cs = _ssim_components(x, y, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(jnp.mean(cs)))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            if pad_h or pad_w:
                x = x[:, : x.shape[1] - pad_h, : x.shape[2] - pad_w]
                y = y[:, : y.shape[1] - pad_h, : y.shape[2] - pad_w]
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                      "VALID") / 4
    msv = jax.nn.relu(jnp.mean(ssim_map))
    vals = jnp.stack(mcs + [msv])
    return jnp.prod(vals ** weights)
