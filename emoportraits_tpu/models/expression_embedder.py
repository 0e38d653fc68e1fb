"""ExpressionEmbed (`expression_embedder_nw`): theta-aligned 2x-zoom face crop ->
ResNet-18 -> expression vector.

Reference: networks/volumetric_avatar/expression_embedder.py —
  * alignment crop: invert the head-pose theta, keep the 2D rows/cols, right-multiply a
    0.5-scale (2x zoom-in), warp an identity grid and bilinear-sample the image
    (:174-251; grid_size = image_size // 2, zeros padding);
  * ResNetWrapper `net_face` (:343-480): ImageNet norm, ResNet-18 (GN in prod), fc ->
    1x1 conv to 128ch, dropout(0.2), adaptive avgpool 4x4, Linear(128*16 -> 128, no bias).

Prod runs with estimate_head_pose_from_keypoints=True: thetas come from the frozen
HeadPoseRegressor, so the optional `net_head`/LBFGS paths (:255-300) are not needed; the
keypoint-fitting variant is provided closed-form in geometry.transforms.align_keypoints.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ExpressionEmbedConfig
from ..ops.blocks import Conv, Dense
from ..ops.grid_sample import grid_sample_2d, make_identity_grid_2d
from .backbones.resnet import ResNet
from .identity_embedder import IMAGENET_MEAN, IMAGENET_STD, adaptive_avg_pool


def theta_to_crop_grid(theta: jax.Array, grid_size: int, zoom: float = 0.5) -> jax.Array:
    """Build the aligned-crop sampling grid from a (B, 4, 4) or (B, 3, 4) head theta.

    Mirrors reference expression_embedder.py:205-243: inv(theta) -> 2D rows/cols
    [0,1,3] x [0,1,3] -> right-multiply diag(zoom, zoom, 1) -> apply to identity grid.
    Returns (B, grid_size, grid_size, 2).
    """
    b = theta.shape[0]
    if theta.shape[1] == 3:
        bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], theta.dtype), (b, 1, 4))
        theta = jnp.concatenate([theta, bottom], axis=1)
    inv = jnp.linalg.inv(theta.astype(jnp.float32))
    sel = jnp.array([0, 1, 3])
    inv2d = inv[:, sel][:, :, sel]  # (B, 3, 3)
    scale = jnp.diag(jnp.array([zoom, zoom, 1.0], jnp.float32))
    inv2d = (inv2d @ scale)[:, :2]  # (B, 2, 3)

    grid = make_identity_grid_2d(grid_size, grid_size).reshape(1, -1, 2)
    ones = jnp.ones((1, grid.shape[1], 1), jnp.float32)
    grid_h = jnp.broadcast_to(jnp.concatenate([grid, ones], -1), (b, grid.shape[1], 3))
    warped = jnp.einsum("bpk,bjk->bpj", grid_h, inv2d)
    return warped.reshape(b, grid_size, grid_size, 2)


def align_face_crop(img: jax.Array, theta: jax.Array, grid_size: int) -> jax.Array:
    """Sample the 2x zoomed, pose-aligned face crop (zeros padding, torch default)."""
    grid = theta_to_crop_grid(theta, grid_size)
    return grid_sample_2d(img, grid.astype(img.dtype), padding_mode="zeros")


def estimate_theta_from_keypoints(keypoints: jax.Array,
                                  canonical: jax.Array,
                                  method: str = "umeyama",
                                  sep_scales: bool = False) -> jax.Array:
    """Head theta from 68 3D landmarks vs the canonical template.

    The reference runs a 5-step host-side torch-LBFGS inner optimization per batch
    (expression_embedder.py:255-300, fitting scale/yaw/pitch/roll/t to
    `data/aligned_keypoints_3d.npy`). Two jit-safe paths here:

      * method="umeyama" (default): batched closed-form Umeyama — the exact
        minimizer of the same 7-param similarity family (SURVEY.md §3.4).
      * method="fit": batched on-device Levenberg–Marquardt with a fixed iteration
        count (geometry.transforms.fit_similarity_transform) — required for the
        reference's `lpe_head_transform_sep_scales` 9-param variant (per-axis
        scales), which no closed form covers; sep_scales=True selects it.

    keypoints: (B, 68, 3) in [-1, 1]; canonical: (68, 3) template. Returns (B, 4, 4)
    theta mapping keypoints -> canonical frame.
    """
    if method not in ("umeyama", "fit"):
        raise ValueError(f"estimate_theta_from_keypoints: unknown method "
                         f"{method!r} (expected 'umeyama' or 'fit')")
    if method == "fit" or sep_scales:
        from ..geometry.transforms import fit_similarity_transform

        return fit_similarity_transform(keypoints, canonical,
                                        sep_scales=sep_scales)
    from ..geometry.transforms import procrustes

    b = keypoints.shape[0]
    canon = jnp.broadcast_to(canonical[None], (b, *canonical.shape))
    scale, r, t = procrustes(keypoints, canon)
    theta = jnp.zeros((b, 4, 4), keypoints.dtype)
    theta = theta.at[:, :3, :3].set(scale[:, None, None] * r)
    theta = theta.at[:, :3, 3].set(t)
    return theta.at[:, 3, 3].set(1.0)


class TransformerPool(nn.Module):
    """ViT cls-token pooling of the trunk feature map (reference TransformerHead,
    utils.py:629-660; chosen by lpe_final_pooling_type='transformer',
    expression_embedder.py:398-403 — prod uses 'avg'). Pre-LN residual blocks with
    learned positional embeddings and a learned cls token; returns the cls output.

    Reference hyperparameters: depth=3, heads=8, dim_head=64, mlp_dim=1024,
    dropout=0.1 (identity here — the embedder is queried deterministically at
    inference and the reference's transformer option was never trained)."""
    dim: int = 128
    depth: int = 3
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        """feat: (B, h, w, C) trunk output -> (B, C) cls vector."""
        b, h, w, c = feat.shape
        n = h * w
        # torch views (B, C, h*w) then permutes -> token order is row-major spatial
        x = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, c, n)
        x = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)  # (B, n, C)
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        x = x + pos[:, : n + 1]
        inner = self.heads * self.dim_head
        for d in range(self.depth):
            # attention block: LN -> qkv -> softmax(q k^T / sqrt(dh)) v -> proj (+res)
            y = nn.LayerNorm(name=f"attn_ln_{d}")(x)
            qkv = Dense(inner * 3, use_bias=False, name=f"to_qkv_{d}")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(b, n + 1, self.heads, self.dim_head
                                        ).transpose(0, 2, 1, 3)
            q, k, v = split(q), split(k), split(v)
            attn = jax.nn.softmax(
                jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim_head ** -0.5, axis=-1)
            y = jnp.einsum("bhij,bhjd->bhid", attn, v)
            y = y.transpose(0, 2, 1, 3).reshape(b, n + 1, inner)
            x = x + Dense(self.dim, name=f"attn_out_{d}")(y)
            # feed-forward block: LN -> GELU MLP (+res)
            y = nn.LayerNorm(name=f"ff_ln_{d}")(x)
            y = Dense(self.mlp_dim, name=f"ff_0_{d}")(y)
            y = jax.nn.gelu(y, approximate=False)
            x = x + Dense(self.dim, name=f"ff_1_{d}")(y)
        return x[:, 0]


class ExpressionEmbed(nn.Module):
    cfg: ExpressionEmbedConfig
    pool_size: int = 4  # lpe_output_size
    # reference lists expression_embedder_nw in spn_networks + ws_networks
    # (va_arguments.py:158-163); the trunk follows the sibling WS/SN rule
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, aligned_face: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """aligned_face: (B, gs, gs, 3) aligned crop. Returns (B, expression_dim)."""
        c = self.cfg
        x = (aligned_face - IMAGENET_MEAN.astype(aligned_face.dtype)) / IMAGENET_STD.astype(aligned_face.dtype)
        feat = ResNet(layers=(2, 2, 2, 2), block="basic", norm=c.norm,
                      base_width=c.backbone_width, use_ws=self.use_ws,
                      use_sn=self.use_sn, name="net")(x)
        feat = Conv(c.output_channels, (1, 1), use_bias=False, use_sn=self.use_sn,
                    name="fc")(feat)
        if c.dropout > 0:
            feat = nn.Dropout(rate=c.dropout, deterministic=deterministic,
                              name="drop")(feat)
        if c.final_pooling_type == "transformer":
            # ViT cls-token pooling + LN + Linear (reference
            # expression_embedder.py:398-403, pose_head Sequential)
            vec = TransformerPool(dim=c.output_channels,
                                  name="pose_head_tf")(feat)
            vec = nn.LayerNorm(name="pose_head_ln")(vec)
            return Dense(c.output_channels, use_bias=False,
                         name="pose_head")(vec)
        pooled = adaptive_avg_pool(feat, self.pool_size)
        # torch flatten of (B, C, h, w) is C-major; transpose for port parity.
        flat = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(pooled.shape[0], -1)
        return Dense(c.output_channels, use_bias=False, use_sn=self.use_sn,
                     name="pose_head")(flat)
