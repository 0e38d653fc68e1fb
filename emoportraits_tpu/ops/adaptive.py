"""Low-rank projectors that factor a spatial warp embed into per-layer (gamma, beta)
modulation for adaptive norms.

Reference semantics (networks/volumetric_avatar/utils.py):
  * ProjectorNorm (:1113-1151): per adaptive-norm layer i with C_i features, parameters
    u_i (C_i, C_max) and v_i (E^2, 2); modulation = u_i @ embed @ v_i for embed of shape
    (B, C_max, E^2), split into (delta_gamma, delta_beta).
  * ProjectorNormLinear (:1154-1213, decoder path): shared MLP 512*16 -> 512 -> 512*2 on the
    flattened embed, then per-layer u_i (C_i, 512), v_i (2, 2).

Here the projector is constructed from a static tuple of target channel widths and returns
a tuple of (delta_gamma, delta_beta) pairs consumed positionally by the blocks — no module
mutation (the reference assigns `.ada_weight` onto layers, utils.py:983-995).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dense, Mod


def _uniform(bound: float):
    def init(rng, shape):
        return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)
    return init


class ProjectorNorm(nn.Module):
    """embed (B, C_max, E^2) -> per-layer (delta_gamma, delta_beta)."""
    channel_sizes: Tuple[int, ...]
    max_channels: int = 512
    embed_size: int = 4

    @nn.compact
    def __call__(self, embed: jax.Array) -> Tuple[Mod, ...]:
        e2 = self.embed_size ** 2
        mods = []
        for i, c in enumerate(self.channel_sizes):
            u = self.param(f"u_{i}", _uniform(math.sqrt(3 / self.max_channels)),
                           (c, self.max_channels))
            v = self.param(f"v_{i}", _uniform(math.sqrt(3 / e2)), (e2, 2))
            p = jnp.einsum("cm,bme,ef->bcf", u, embed.astype(jnp.float32), v)
            mods.append((p[..., 0], p[..., 1]))
        return tuple(mods)


class ProjectorNormLinear(nn.Module):
    """Decoder-path projector: shared MLP then per-layer low-rank maps
    (reference ProjectorNormLinear, utils.py:1154-1213)."""
    channel_sizes: Tuple[int, ...]
    max_channels: int = 512
    embed_size: int = 4

    @nn.compact
    def __call__(self, embed: jax.Array) -> Tuple[Mod, ...]:
        b = embed.shape[0]
        flat = embed.reshape(b, -1).astype(jnp.float32)  # (B, 512 * E^2)
        h = Dense(512, use_bias=False, name="fc_0")(flat)
        h = jax.nn.relu(h)
        h = Dense(512 * 2, use_bias=False, name="fc_1")(h).reshape(b, 512, 2)
        mods = []
        for i, c in enumerate(self.channel_sizes):
            u = self.param(f"u_{i}", _uniform(math.sqrt(3 / 512)), (c, 512))
            v = self.param(f"v_{i}", _uniform(math.sqrt(3 / 2)), (2, 2))
            p = jnp.einsum("cm,bmf,fg->bcg", u, h, v)
            mods.append((p[..., 0], p[..., 1]))
        return tuple(mods)
