"""Stage-1 volumetric avatar: the full generator graph.

Reference: models/stage_1/volumetric_avatar/va.py — Model.init_networks (:126-279),
predict_embed (:813-885), G_forward (:287-765). This module owns every trainable
generator subnet (reference `*_nw` suffix convention, utils/non_specific.py:51-57) and
exposes three pure methods:

  * `embed_source` / `embed_target`-style pieces used by both paths,
  * `generate(...)`  — training forward: source+target -> pred image + intermediates,
  * `encode_source(...)` + `drive(...)` — the split inference path mirroring
    notebooks/infer.py:355 (canonical volume cached once per avatar, per-frame drive).

The frozen HeadPoseRegressor and FaceParsing run OUTSIDE this module (reference keeps
them as non-trainable attributes, va.py:255-279); thetas and masks enter as inputs.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..geometry.transforms import apply_theta_to_grid, inverse_theta_4x4
from ..parallel.spatial import sp_image, sp_volume
from ..ops.blocks import Conv, Dense
from ..ops.grid_sample import (
    grid_sample_3d,
    grid_sample_3d_norm_grad,
    make_identity_grid_3d,
)
from .decoder import Decoder
from .expression_embedder import ExpressionEmbed, align_face_crop
from .identity_embedder import IdtEmbed
from .local_encoder import LocalEncoder
from .unet3d import Unet3D
from .vpn_resblocks import VPNResBlocks
from .warp_generator import WarpGenerator


class AvatarState(NamedTuple):
    """Per-avatar cached state for streaming inference (reference caches
    `target_latent_volume` + embeds across driver frames, infer.py:485-507)."""
    canonical_volume: jax.Array   # (B, D, s, s, C)
    idt_embed: jax.Array          # (B, E, E, 512)
    source_pose_embed: jax.Array  # (B, expr_dim)


class VolumetricAvatar(nn.Module):
    cfg: ModelConfig

    def setup(self):
        m = self.cfg
        sn = dict(use_ws=m.use_ws, use_sn=m.use_sn)
        # optional rematerialization of the memory-heavy subnets (activation memory at
        # 512px training; SURVEY.md §5 long-context analog: bf16 + remat, not sharding).
        # prevent_cse stays at its default True: under plain jit XLA's CSE merges the
        # rematerialized forward back with the original, silently undoing the remat —
        # measured on v5e: with prevent_cse=False the batch-2 step's HBM requirement was
        # byte-identical (26.94G) with and without remat. remat_policy='dots' keeps
        # conv/matmul outputs and recomputes only the cheap elementwise chain —
        # a middle point between full recompute and no remat.
        if m.remat:
            if m.remat_policy not in ("", "dots"):
                raise ValueError(f"remat_policy={m.remat_policy!r}: expected '' "
                                 "(full recompute) or 'dots'")
            # LocalEncoder remats PER RES-BLOCK (its own `remat` attr), not as
            # one whole-module region: measured at batch-2 512px, the whole-
            # encoder checkpoint's backward replay kept four 520 MB f32 GN
            # temps of enc_0 live simultaneously (the OOM driver) — per-block
            # regions replay one block at a time.
            LocalEncoder_ = functools.partial(LocalEncoder, remat_blocks=True,
                                              remat_policy=m.remat_policy)
            # Unet3D remats PER RES-BLOCK: as one region its backward replay
            # held ~8 simultaneous 288 MB f32 GN temps (down_0/skip_2/up_2 all
            # live at once — the next OOM driver after the decoder fix).
            Unet3D_ = functools.partial(Unet3D, remat_blocks=True,
                                        remat_policy=m.remat_policy)
            # Decoder remats PER RES-BLOCK too: as one nn.remat region its
            # backward replay held 6-10 simultaneous 260 MB f32 GN temps of the
            # 512px img blocks — the largest allocations in the batch-2 OOM
            # dump (16.33G, 596 MB over). Per-block regions bound that to one
            # block's temps at a time.
            Decoder_ = functools.partial(Decoder, remat_blocks=True,
                                         remat_policy=m.remat_policy)
        else:
            LocalEncoder_, Unet3D_, Decoder_ = LocalEncoder, Unet3D, Decoder
        # NOT rematted: the idt/expression embedder trunks. Measured at batch-2
        # 512px: wrapping them in nn.remat RAISED program HBM 15.76G -> 16.97G
        # with 3.5G of layout padding — XLA's pressure-driven layout/remat
        # resettling dominates any activation saving from these 256px trunks.
        IdtEmbed_, ExpressionEmbed_ = IdtEmbed, ExpressionEmbed
        # NOT rematted: warp generators + VPN res-blocks. Measured on v5e at
        # batch-2 512px: adding remat there RAISED program HBM 15.76G -> 16.22G
        # (+484 MB) — their activations are small 3D tensors, and checkpointing
        # them forces the big pre-warp volumes to stay live for the recompute.
        WarpGenerator_, VPNResBlocks_ = WarpGenerator, VPNResBlocks
        self.local_encoder_nw = LocalEncoder_(m.local_encoder, m.volume, **sn)
        self.idt_embedder_nw = IdtEmbed_(m.idt_embedder, **sn)
        self.expression_embedder_nw = ExpressionEmbed_(m.expression_embedder, **sn)
        # Linear 128 -> 512*E^2 lifting the expression vec to a spatial embed
        # (va.py:172-176; pose_unsqueeze_nw is NOT in spn_networks -> no SN)
        self.pose_unsqueeze_nw = Dense(
            m.max_channels * m.embed_size ** 2, use_bias=False)
        # 1x1 conv fusing (pose + idt)/2 (va.py:179-184; in spn_networks -> SN)
        self.warp_embed_head_orig_nw = Conv(m.max_channels, (1, 1), use_bias=False,
                                            use_sn=m.use_sn)
        self.xy_generator_nw = WarpGenerator_(m.warp_generator, **sn)
        self.uv_generator_nw = WarpGenerator_(m.warp_generator, **sn)
        if m.source_volume_num_blocks > 0:
            # unet_first (va.py:194-200): volume_source becomes a secondary U-Net
            # (unet3d_cfg_s) that runs AFTER the source warps; default is VPN
            # res-blocks BEFORE them
            self.volume_source_nw = (Unet3D_(m.unet3d_s, **sn) if m.unet_first
                                     else VPNResBlocks_(m.vpn_source, **sn))
        self.volume_process_nw = Unet3D_(m.unet3d, **sn)
        if m.pred_volume_num_blocks > 0:
            self.volume_pred_nw = VPNResBlocks_(m.vpn_source, **sn)
        self.decoder_nw = Decoder_(m.decoder, **sn)
        if m.volume_rendering:
            # EG3D-role importance renderer replacing the C-major collapse on the
            # decoder input (reference va.py:157-158 construction, :586-589 use)
            from .volume_renderer import VolumeRenderer

            self.volume_renderer_nw = VolumeRenderer(m.volume_renderer)
        if m.use_back:
            from .background import BackgroundAdding, BackgroundEncoder, UNet2D

            cd = m.volume.channels * m.volume.depth
            self.local_encoder_back_nw = BackgroundEncoder(m.local_encoder, m.volume)
            self.background_process_nw = UNet2D(cd)
            self.backgroung_adding_nw = BackgroundAdding(cd)
        if m.use_tensor:
            # learnable average-person volume added to the canonical volume
            # (reference avarage_tensor_ts, va.py:205-209,543)
            v = m.volume
            import math as _math

            bound = _math.sqrt(6.0 / (v.depth * v.size * v.size * v.channels))
            self.avarage_tensor_ts = self.param(
                "avarage_tensor_ts",
                lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32,
                                                      -bound, bound),
                (1, v.depth, v.size, v.size, v.channels))

    # ------------------------------------------------------------------ helpers

    def _grid_sample(self, vol, grid):
        m = self.cfg
        if m.warp_norm_grad:
            return grid_sample_3d_norm_grad(
                vol, grid.astype(vol.dtype), m.grid_sample_padding_mode, size=m.volume.size)
        return grid_sample_3d(vol, grid.astype(vol.dtype), m.grid_sample_padding_mode)

    def _identity_grid_h(self):
        m = self.cfg.volume
        g = make_identity_grid_3d(m.depth, m.size, m.size).reshape(1, -1, 3)
        return jnp.concatenate([g, jnp.ones((1, g.shape[1], 1), g.dtype)], axis=-1)

    def rotation_warp(self, theta: jax.Array, invert: bool) -> jax.Array:
        """Dense warp field realizing a rigid pose: identity grid @ theta^T
        (reference va.py:380-431). theta: (B, 4, 4) or (B, 3, 4)."""
        m = self.cfg.volume
        t = inverse_theta_4x4(theta)[:, :3] if invert else (
            theta[:, :3] if theta.shape[1] == 4 else theta)
        return apply_theta_to_grid(self._identity_grid_h(), t, (m.depth, m.size, m.size))

    def expression_vector(self, img: jax.Array, theta: jax.Array, *,
                          deterministic: bool = True) -> jax.Array:
        """Pose-aligned 2x crop -> expression embedding (reference
        expression_embedder.py:227-251)."""
        gs = self.cfg.expression_embedder.image_size // 2
        crop = align_face_crop(img, jax.lax.stop_gradient(theta), gs)
        # positional: under nn.remat, deterministic is static_argnums=(2,) and
        # jax.checkpoint only treats POSITIONAL args as static
        return self.expression_embedder_nw(crop, deterministic)

    def fuse_embed(self, pose_embed: jax.Array, idt_embed: jax.Array) -> jax.Array:
        """(pose + idt)/2 -> 1x1 conv, as a (B, E, E, 512) spatial embed
        (reference predict_embed, va.py:813-885, cat_em=False prod path)."""
        m = self.cfg
        b = pose_embed.shape[0]
        spatial = self.pose_unsqueeze_nw(pose_embed)
        # torch view (B, 512, E, E) is channel-major -> transpose to channels-last.
        spatial = spatial.reshape(b, m.max_channels, m.embed_size, m.embed_size)
        spatial = jnp.transpose(spatial, (0, 2, 3, 1))
        return self.warp_embed_head_orig_nw((spatial + idt_embed) * 0.5)

    def _collapse(self, vol: jax.Array) -> jax.Array:
        """(B, D, H, W, C) -> (B, H, W, C*D), C-major like torch view(b, c*d, s, s)
        (va.py:586-589)."""
        b, d, h, w, c = vol.shape
        return jnp.transpose(vol, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)

    def _to_2d(self, vol: jax.Array, out: Optional[Dict[str, Any]] = None,
               key: Optional[str] = None) -> jax.Array:
        """Aligned 3D volume -> decoder input: the EG3D renderer when
        cfg.volume_rendering (emitting `{key}_img_vol`/`{key}_depth_vol` for the
        l1_vol_rgb losses, va.py:586-589), else the C-major collapse."""
        if not self.cfg.volume_rendering:
            return sp_image(self._collapse(vol))
        feat, rgb, depth = self.volume_renderer_nw(vol)
        if out is not None and key is not None:
            out[f"{key}_img_vol"] = rgb
            out[f"{key}_depth_vol"] = depth
        return sp_image(feat)

    # ------------------------------------------------------------- main forwards

    def generate(
        self,
        source_img: jax.Array,
        source_mask: jax.Array,
        target_img: jax.Array,
        source_theta: jax.Array,
        target_theta: jax.Array,
        *,
        mixing_theta: Optional[jax.Array] = None,
        deterministic: bool = True,
        stage_two: bool = False,
        match_neutral: bool = False,
        source_expr_img: Optional[jax.Array] = None,
        target_expr_img: Optional[jax.Array] = None,
        conv_alpha=1.0,  # AdaptiveConv annealing (only read when use_adaconv)
        step: Optional[jax.Array] = None,  # iteration, for detach_lat_vol
    ) -> Dict[str, Any]:
        """Training/inference forward for a (source, target) pair
        (reference G_forward, va.py:287-765; prod flag settings).

        Images are (B, S, S, 3) in [0, 1]; masks (B, S, S, 1); thetas (B, 4, 4)
        from the frozen head-pose regressor.
        """
        out: Dict[str, Any] = {}
        # sp_image/sp_volume: spatial-parallel activation sharding — identity unless
        # traced under a mesh with an `sp` axis (parallel/spatial.py)
        masked_source = sp_image(source_img * source_mask)

        latent_volume = sp_volume(self.local_encoder_nw(masked_source))
        idt_embed = self.idt_embedder_nw(masked_source)
        out["idt_embed"] = idt_embed

        # Expression embeds come from the elastic-warped aug frames in training
        # (reference expression_embedder.py:163-169) and the raw frames otherwise.
        source_pose_embed = self.expression_vector(
            source_expr_img if source_expr_img is not None else source_img,
            source_theta, deterministic=deterministic)
        target_pose_embed = self.expression_vector(
            target_expr_img if target_expr_img is not None else target_img,
            target_theta, deterministic=deterministic)
        out["source_pose_embed"] = source_pose_embed
        out["target_pose_embed"] = target_pose_embed

        source_embed = self.fuse_embed(source_pose_embed, idt_embed)
        target_embed = self.fuse_embed(target_pose_embed, idt_embed)

        xy_warp, out["source_delta_xy"] = self.xy_generator_nw(source_embed,
                                                               conv_alpha)
        uv_warp, out["target_delta_uv"] = self.uv_generator_nw(target_embed,
                                                               conv_alpha)

        source_rotation_warp = self.rotation_warp(source_theta, invert=True)
        target_rotation_warp = self.rotation_warp(target_theta, invert=False)

        # 3D feature preprocess + process ordering (va.py:505-537): prod runs the
        # VPN blocks before the source warps and the U-Net after; unet_first swaps
        # (the embed-conditioned U-Net first, the secondary U-Net after).
        if self.cfg.unet_first:
            latent_volume = self.volume_process_nw(latent_volume)
        elif self.cfg.source_volume_num_blocks > 0:
            latent_volume = self.volume_source_nw(latent_volume)

        if self.cfg.detach_lat_vol > 0 and step is not None:
            # periodic latent-volume detach (va.py:512-514): gradient flow into the
            # encoder/preprocess is cut on iterations where step % detach == 0
            hold = ((step % self.cfg.detach_lat_vol) == 0)
            latent_volume = jnp.where(hold, jax.lax.stop_gradient(latent_volume),
                                      latent_volume)

        warped_src = self._grid_sample(
            self._grid_sample(latent_volume, source_rotation_warp), xy_warp)
        if self.cfg.unet_first:
            canonical = sp_volume(self.volume_source_nw(warped_src)
                                  if self.cfg.source_volume_num_blocks > 0
                                  else warped_src)
        else:
            canonical = sp_volume(self.volume_process_nw(warped_src))
        if self.cfg.use_tensor:
            canonical = canonical + self.avarage_tensor_ts.astype(canonical.dtype)
        out["canonical_volume"] = canonical

        aligned = sp_volume(self._grid_sample(
            self._grid_sample(canonical, uv_warp), target_rotation_warp))
        if self.cfg.pred_volume_num_blocks > 0:
            aligned = self.volume_pred_nw(aligned)

        collapsed = self._to_2d(aligned, out, "pred_tar")
        if self.cfg.use_back:
            # background branch: encode the inverse-masked source and merge
            # (reference va.py:494-498, 579-584)
            bg = self.local_encoder_back_nw(source_img * (1.0 - source_mask))
            bg = self.background_process_nw(bg)
            collapsed = self.backgroung_adding_nw(collapsed, bg)
        img, img_f = self.decoder_nw(collapsed, target_embed, stage_two)
        img = sp_image(img)
        out["pred_target_img"] = img
        out["pred_feat"] = img_f

        if match_neutral:
            # decode the UNWARPED canonical volume -> neutral face; its central-crop
            # expression vector is pulled to zero by the neutral losses
            # (reference match_neutral branch, va.py:595-614).
            neutral_img, _ = self.decoder_nw(self._to_2d(canonical), target_embed,
                                             False)
            out["pred_neutral_img"] = neutral_img
            s4 = neutral_img.shape[1] // 4
            out["pred_neutral_img_aligned"] = neutral_img[:, s4:3 * s4, s4:3 * s4]
            out["pred_neutral_expr_vector"] = self.expression_embedder_nw(
                jax.image.resize(
                    out["pred_neutral_img_aligned"],
                    (neutral_img.shape[0],
                     self.cfg.expression_embedder.image_size // 2,
                     self.cfg.expression_embedder.image_size // 2, 3),
                    method="linear"),
                True)  # deterministic, positional (remat static_argnums)

        if mixing_theta is not None:
            # Mixing branch: rolled expression drives the canonical volume under a
            # polar-mixed pose (reference va.py:634-765).
            rolled_embed = jnp.roll(target_pose_embed, 1, axis=0)
            mix_embed = self.fuse_embed(rolled_embed, idt_embed)
            mix_uv_warp, _ = self.uv_generator_nw(mix_embed, conv_alpha)
            mix_rot_warp = self.rotation_warp(mixing_theta, invert=False)
            mix_aligned = self._grid_sample(
                self._grid_sample(canonical, mix_uv_warp), mix_rot_warp)
            mix_img, _ = self.decoder_nw(self._to_2d(mix_aligned, out, "pred_mixing"),
                                         mix_embed, False)
            out["pred_mixing_img"] = mix_img
            out["rolled_pose_embed"] = rolled_embed

        return out

    def identity_embed(self, img: jax.Array) -> jax.Array:
        """idt_embedder on an (aligned-crop) image — input to the reconstructed
        contrastive_idt loss (the reference consumes idt_embed_face_* keys that
        nothing produces, va_losses_and_visuals.py:581-622)."""
        return self.idt_embedder_nw(img)

    def decode_with_expression(self, canonical: jax.Array, expr_vector: jax.Array,
                               idt_embed: jax.Array, target_theta: jax.Array,
                               conv_alpha=1.0) -> jax.Array:
        """Decode the canonical volume under an arbitrary expression vector and the
        target pose — the pred_cycle branch (reference va.py:739-765: uv warp from
        the re-embedded cycle expression, two resamplings, decoder). Drives
        `cycle_mix_pred` (mixing-cycle expression) and `pred_identical_cycle`
        (pred-cycle expression; the reference CONSUMES that key in its cycle_idn
        loss but never produces it — dead code, va_losses_and_visuals.py:262 —
        reconstructed here)."""
        embed = self.fuse_embed(expr_vector, idt_embed)
        uv_warp, _ = self.uv_generator_nw(embed, conv_alpha)
        rot_warp = self.rotation_warp(target_theta, invert=False)
        aligned = self._grid_sample(self._grid_sample(canonical, uv_warp), rot_warp)
        if self.cfg.pred_volume_num_blocks > 0:
            aligned = self.volume_pred_nw(aligned)
        img, _ = self.decoder_nw(self._to_2d(aligned), embed, False)
        return img

    def canonical_from_target(self, target_img: jax.Array, target_mask: jax.Array,
                              target_pose_embed: jax.Array, idt_embed: jax.Array,
                              inv_theta_st: jax.Array, conv_alpha=1.0) -> jax.Array:
        """Canonical volume re-derived from the TARGET frame, for the volumes_l1
        self-supervision (reference predict_target_canon_vol branch, va.py:554-566;
        runs under no-grad there — callers wrap in stop_gradient).

        inv_theta_st: (B, 4, 4) inverse of theta(source_scale, target_rotation,
        target_translation), optionally right-composed with the keypoint alignment matrix
        (va.py:437-448)."""
        embed = self.fuse_embed(target_pose_embed, idt_embed)
        xy_warp, _ = self.xy_generator_nw(embed, conv_alpha)
        latent = self.local_encoder_nw(target_img * target_mask)
        if self.cfg.unet_first:
            # unet_first variant (va.py:558-565): U-Net before the warps,
            # secondary U-Net after
            latent = self.volume_process_nw(latent)
        elif self.cfg.source_volume_num_blocks > 0:
            latent = self.volume_source_nw(latent)
        rot_warp = self.rotation_warp(inv_theta_st, invert=False)
        latent = self._grid_sample(self._grid_sample(latent, rot_warp), xy_warp)
        if self.cfg.unet_first:
            return (self.volume_source_nw(latent)
                    if self.cfg.source_volume_num_blocks > 0 else latent)
        return self.volume_process_nw(latent)

    # ------------------------------------------------- streaming inference split

    def encode_source(self, source_img: jax.Array, source_mask: jax.Array,
                      source_theta: jax.Array) -> AvatarState:
        """Once per avatar: build the canonical latent volume
        (reference infer.py:379-507 SOURCE path)."""
        masked = sp_image(source_img * source_mask)
        latent_volume = sp_volume(self.local_encoder_nw(masked))
        idt_embed = self.idt_embedder_nw(masked)
        source_pose_embed = self.expression_vector(source_img, source_theta)
        source_embed = self.fuse_embed(source_pose_embed, idt_embed)
        xy_warp, _ = self.xy_generator_nw(source_embed)
        rot_warp = self.rotation_warp(source_theta, invert=True)
        if self.cfg.unet_first:
            latent_volume = self.volume_process_nw(latent_volume)
        elif self.cfg.source_volume_num_blocks > 0:
            latent_volume = self.volume_source_nw(latent_volume)
        if self.cfg.fuse_warps:
            # compose rot∘xy into one gather (see drive() docstring)
            composed = grid_sample_3d(rot_warp, xy_warp.astype(rot_warp.dtype),
                                      padding_mode="border")
            warped = self._grid_sample(latent_volume, composed)
        else:
            warped = self._grid_sample(self._grid_sample(latent_volume, rot_warp),
                                       xy_warp)
        if self.cfg.unet_first:
            canonical = sp_volume(self.volume_source_nw(warped)
                                  if self.cfg.source_volume_num_blocks > 0
                                  else warped)
        else:
            canonical = sp_volume(self.volume_process_nw(warped))
        return AvatarState(canonical, idt_embed, source_pose_embed)

    def drive(self, state: AvatarState, driver_img: jax.Array,
              driver_theta: jax.Array, *, stage_two: bool = False):
        """Per driver frame: expression embed -> uv warp -> rotate -> decode
        (reference infer.py:557-638 DRIVER path).

        When cfg.fuse_warps, the uv and rotation warps are COMPOSED into one field
        (sample the uv field at the rotated grid) so the canonical volume is gathered
        once instead of twice — same math to first order in field smoothness, half the
        gather bandwidth of the reference's back-to-back grid_samples (infer.py:618-619).
        """
        pose_embed = self.expression_vector(driver_img, driver_theta)
        embed = self.fuse_embed(pose_embed, state.idt_embed)
        uv_warp, _ = self.uv_generator_nw(embed)
        rot_warp = self.rotation_warp(driver_theta, invert=False)
        if self.cfg.fuse_warps:
            composed = grid_sample_3d(uv_warp, rot_warp.astype(uv_warp.dtype),
                                      padding_mode="border")
            aligned = self._grid_sample(state.canonical_volume, composed)
        else:
            aligned = self._grid_sample(
                self._grid_sample(state.canonical_volume, uv_warp), rot_warp)
        aligned = sp_volume(aligned)
        if self.cfg.pred_volume_num_blocks > 0:
            aligned = self.volume_pred_nw(aligned)
        img, img_f = self.decoder_nw(self._to_2d(aligned), embed, stage_two)
        return (sp_image(img), img_f) if stage_two else (sp_image(img), None)

    def __call__(self, source_img, source_mask, target_img, source_theta, target_theta):
        """Init-friendly entry point == generate()."""
        return self.generate(source_img, source_mask, target_img,
                             source_theta, target_theta)
