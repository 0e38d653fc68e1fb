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

# Per-layer adaptive-conv kernel delta in our HWIO-per-sample layout:
# (B, *kernel_taps, C_in, C_out); taps are all-1 when gen_adaptive_kernel=False.
ConvMod = jax.Array


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


class AdaConvEmbedHeads(nn.Module):
    """Per-kind linear heads lifting the fused warp embed to the projector inputs.

    Reference intent: `predict_embed` (va.py:866-867, :878-880) applies
    `warp_embed_head_dict[name]` heads per row of the (B*C, E^2) embed and reshapes to
    (B, C/2, -1) for ProjectorConv's 'fc'/'conv2d'/'conv3d' inputs — but those module
    dicts are never constructed anywhere in the reference (its `gen_use_adaconv=True`
    branch raises AttributeError; the default-0 annealing alpha also zeroes the branch,
    see `apply_kernel_mod`). The head widths are nonetheless fully determined by
    ProjectorConv's matmul shapes (utils.py:1314-1346): 'fc' must arrive as
    (B, C/2, C/2), 'conv2d' as (B, C/2, C/2 * 9), 'conv3d' as (B, C/2, C/2 * 27) —
    i.e. per-row Linear(E^2 -> C/4 * numel). This module reconstructs exactly those
    heads so the branch is actually runnable here.
    """
    max_channels: int = 512
    embed_size: int = 4
    kinds: Tuple[str, ...] = ("fc",)  # subset of ('fc', 'conv2d', 'conv3d')

    _NUMEL = {"fc": 1, "conv2d": 9, "conv3d": 27}

    @nn.compact
    def __call__(self, embed: jax.Array):
        """embed (B, C_max, E^2) (embed_dict['orig'] layout) -> dict of projector
        inputs keyed by kind, each (B, C_max/2, C_max/2 * numel)."""
        b, c, e2 = embed.shape
        rows = embed.reshape(b * c, e2).astype(jnp.float32)
        out = {}
        for kind in self.kinds:
            numel = self._NUMEL[kind]
            h = Dense(c // 4 * numel, use_bias=False, name=f"head_{kind}")(rows)
            out[kind] = h.reshape(b, c // 2, (c // 2) * numel)
        return out


class ProjectorConv(nn.Module):
    """Low-rank per-sample conv-kernel deltas (reference ProjectorConv,
    utils.py:1270-1352).

    `conv_specs` is a static tuple of (out_ch, in_ch, kernel_shape) for each adaptive
    conv, in consumption order. Per layer: u (out, C_max/2) and v pair up with the
    embed to produce a (B, out, in, numel') delta, where numel' is the true kernel
    numel when `adaptive_kernel` (per-tap deltas from the 'conv2d'/'conv3d' embeds)
    and 1 otherwise (one delta broadcast over taps, reference kernel_size_=(1,)*n,
    utils.py:1339-1345). Returned in our per-sample HWIO layout
    (B, *taps, in, out) for `ops.blocks.Conv(ada=...)`.
    """
    conv_specs: Tuple[Tuple[int, int, Tuple[int, ...]], ...]
    max_channels: int = 512
    adaptive_kernel: bool = False

    @nn.compact
    def __call__(self, embeds) -> Tuple[ConvMod, ...]:
        half = self.max_channels // 2
        bound = math.sqrt(3 / half)
        deltas = []
        for i, (oc, ic, ks) in enumerate(self.conv_specs):
            numel = math.prod(ks)
            if numel == 1:
                # 1x1: W = u @ embed_fc @ v (utils.py:1332-1334)
                u = self.param(f"u_{i}", _uniform(bound), (oc, half))
                v = self.param(f"v_{i}", _uniform(bound), (half, ic))
                fc = embeds["fc"].astype(jnp.float32)  # (B, half, half)
                w = jnp.einsum("om,bmh,hi->boi", u, fc, v)
                w = w.reshape(*w.shape, *(1,) * len(ks))  # (B, out, in, 1...)
                taps = ks
            else:
                u = self.param(f"u_{i}", _uniform(bound), (oc, half))
                v = self.param(f"v_{i}", _uniform(bound), (ic, half))
                if self.adaptive_kernel:
                    kind = "conv2d" if numel == 9 else "conv3d"
                    emb = embeds[kind].astype(jnp.float32)
                    emb = emb.reshape(emb.shape[0], half, half, numel)
                    numel_ = numel
                else:
                    emb = embeds["fc"].astype(jnp.float32)[..., None]
                    numel_ = 1
                # (utils.py:1336-1346): u @ embed -> (B, out, half*numel'),
                # regroup, then v on the half axis -> (B, out, in, numel')
                p = jnp.einsum("om,bmhn->bohn", u, emb)
                w = jnp.einsum("ih,bohn->boin", v, p)
                w = w.reshape(*w.shape[:3], *((1,) * len(ks) if numel_ == 1 else ks))
                taps = (1,) * len(ks) if numel_ == 1 else ks
            # (B, out, in, *taps) -> (B, *taps, in, out)
            nd = len(ks)
            perm = (0,) + tuple(range(3, 3 + nd)) + (2, 1)
            deltas.append(jnp.transpose(w, perm))
        return tuple(deltas)


def annealing_alpha(iteration: jax.Array, kind: str, max_iter: int) -> jax.Array:
    """Adaptive-conv annealing schedule (va_arguments.py:277-280:
    gen_adaptive_use_annealing / _type cos|lin / _max_iter). Traced scalar in [0, 1]:
    0 disables the kernel deltas entirely, 1 applies them fully (see
    blocks.Conv ada semantics)."""
    t = jnp.clip(iteration.astype(jnp.float32) / float(max_iter), 0.0, 1.0)
    if kind == "lin":
        return t
    if kind == "cos":
        return 0.5 * (1.0 - jnp.cos(jnp.pi * t))
    raise ValueError(f"unknown annealing kind {kind!r}")
