"""VolumeRenderer (optional, off in prod): EG3D-style orthographic NeRF head over the
aligned latent volume.

Reference: networks/volumetric_avatar/volume_renderer.py:7-133 (OSGDecoder + wrapper) and
volume_render_utils.py:6-260 (MipRayMarcher2 + ImportanceRenderer). Active path:
  * one orthographic ray per (h, w) pixel, stratified jittered depths in [-1, 1]
    (sample_stratified, :216-236; N_importance fine pass disabled in the reference);
  * per ray the WHOLE feature pillar (C*D channels, C-major like the reference's
    view(N, 16*96, 64, 64)) is concatenated with each sample's 3D coordinate and run
    through a softplus MLP -> (sigma, features) (OSGDecoder.forward — the reference
    loops over image rows in Python (:67-83); here it is one batched matmul);
  * MipRayMarcher2 alpha compositing with softplus(sigma_mid - 1) bias, midpoints,
    composite scaled to (-1, 1) (:11-41).

Returns (feature_image, rgb_image, depth_image) like the reference wrapper (:126-133).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import VolumeRendererConfig
from ..ops.blocks import Conv, Dense


def ray_march(colors: jax.Array, densities: jax.Array, depths: jax.Array):
    """MipRayMarcher2 (reference volume_render_utils.py:11-47).

    colors (B, R, S, C); densities (B, R, S, 1); depths (B, R, S, 1).
    """
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = 0.5 * (colors[:, :, :-1] + colors[:, :, 1:])
    densities_mid = 0.5 * (densities[:, :, :-1] + densities[:, :, 1:])
    depths_mid = 0.5 * (depths[:, :, :-1] + depths[:, :, 1:])

    densities_mid = jax.nn.softplus(densities_mid - 1.0)
    alpha = 1.0 - jnp.exp(-densities_mid * deltas)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=2),
        axis=2)[:, :, :-1]
    weights = alpha * trans

    composite = jnp.sum(weights * colors_mid, axis=2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=2) / jnp.maximum(
        weight_total, 1e-10)
    composite_depth = jnp.clip(composite_depth, depths.min(), depths.max())
    composite = composite * 2.0 - 1.0
    return composite, composite_depth, weights


class OSGDecoder(nn.Module):
    """Softplus MLP: [pillar features, xyz] -> (sigma, features)
    (reference volume_renderer.py:7-96, fully vectorized)."""
    hidden_dim: int = 448
    out_features: int = 384
    num_layers: int = 2
    squeeze_dim: int = 0

    @nn.compact
    def __call__(self, coords: jax.Array, pillar: jax.Array):
        """coords (B, R, S, 3); pillar (B, R, C_in). Returns rgb (B,R,S,out), sigma."""
        b, r, s, _ = coords.shape
        feat = jnp.broadcast_to(pillar[:, :, None], (b, r, s, pillar.shape[-1]))
        x = jnp.concatenate([feat, coords.astype(feat.dtype)], axis=-1)
        x = Dense(self.hidden_dim, name="fc_0")(x)
        x = jax.nn.softplus(x)
        for i in range(self.num_layers - 2):
            x = Dense(self.hidden_dim, name=f"fc_{i + 1}")(x)
            x = jax.nn.softplus(x)
        x = Dense(1 + self.out_features, name="fc_out")(x)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001  # MipNeRF clamp
        sigma = x[..., :1]
        return rgb, sigma


class VolumeRenderer(nn.Module):
    cfg: VolumeRendererConfig

    @nn.compact
    def __call__(self, volume: jax.Array,
                 rng: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """volume: (B, D, H, W, C) aligned latent volume. Returns
        (feature image (B, H, W, F), rgb (B, H, W, 3), depth (B, H, W, 1))."""
        c = self.cfg
        b, d, h, w, ch = volume.shape
        s = c.depth_resolution

        # pillar features: C-major flatten (C, D) per pixel (reference view semantics)
        pillar = jnp.transpose(volume, (0, 2, 3, 4, 1)).reshape(b, h * w, ch * d)
        if c.squeeze_dim > 0:
            # reference squeezes with a 1x1 conv over the pillar channels (:23-29);
            # per-pixel that is exactly a shared Dense
            pillar = Dense(c.squeeze_dim, use_bias=False, name="squeeze")(pillar)

        # stratified depths in [-1, 1] with jitter (sample_stratified, :216-236)
        depths = jnp.linspace(-1.0, 1.0, s).reshape(1, 1, s, 1)
        delta = 2.0 / (s - 1)
        if rng is not None:
            depths = depths + jax.random.uniform(rng, (b, h * w, s, 1)) * delta
        depths = jnp.broadcast_to(depths, (b, h * w, s, 1))

        ys = jnp.linspace(-1.0, 1.0, h)
        xs = jnp.linspace(-1.0, 1.0, w)
        vv, uu = jnp.meshgrid(ys, xs, indexing="ij")
        xy = jnp.stack([vv, uu], axis=-1).reshape(1, h * w, 1, 2)
        xy = jnp.broadcast_to(xy, (b, h * w, s, 2))
        coords = jnp.concatenate([xy, depths], axis=-1)

        rgb, sigma = OSGDecoder(c.hidden_dim, c.features * 4, squeeze_dim=0,
                                name="decoder")(coords, pillar)
        composite, depth, _ = ray_march(rgb, sigma, depths)
        feature_image = composite.reshape(b, h, w, -1)
        return feature_image, feature_image[..., :3], depth.reshape(b, h, w, 1)
