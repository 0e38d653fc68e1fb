"""LPIPS(alex): learned perceptual similarity for eval metrics.

Reference: losses/lpips.py:7 wraps the pip `lpips` package (AlexNet variant) used in the
per-epoch test metrics (va_losses_and_visuals.py:656-674). Implemented natively:
torchvision-layout AlexNet features + per-layer 1x1 linear heads on unit-normalized
activations, averaged spatially and summed over layers (Zhang et al. 2018). Weights port
from the released lpips checkpoint via emoportraits_tpu.port; random weights still give
a well-defined (if uncalibrated) metric for smoke tests.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv

# lpips normalization (scaling layer of the reference implementation)
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

# torchvision AlexNet features: (out_ch, kernel, stride, pad, pool_after)
_ALEX = (
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (ch, k, s, p, pool) in enumerate(_ALEX):
            x = Conv(ch, (k, k), strides=s, padding=((p, p), (p, p)),
                     name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            feats.append(x)
            if pool:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        return feats


class LPIPS(nn.Module):
    """Call with images in [0, 1]; internally maps to [-1, 1] like the reference."""

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        def norm_input(img):
            img = img * 2.0 - 1.0
            return (img - _SHIFT.astype(img.dtype)) / _SCALE.astype(img.dtype)

        net = AlexNetFeatures(name="net")
        fa = net(norm_input(a))
        fb = net(norm_input(b))
        total = jnp.zeros(())
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[-1],))
            # lpips linear heads are 1x1 convs with non-negative weights
            d = jnp.sum(diff * jax.nn.relu(w), axis=-1, keepdims=True)
            total = total + jnp.mean(d)
        return total
