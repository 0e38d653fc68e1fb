"""Stage-2 GAN training step: refine frozen stage-1 outputs with the enhancer.

Reference: models/stage_2/base/volumetric_avatar_two.py — same Trainer-style
multi-optimizer loop (:787 forward, :1096 configure_optimizers) with its own
MultiScaleDiscriminator + second (mixing) discriminator (:491-515), and the loss
assembly of va_losses_and_visuals_two.py:14-113:

  gen:  gen_adversarial (w.adversarial * adversarial_gen, D on face-masked images,
        volumetric_avatar_two.py:838-843), feature_matching (w=60),
        gen_adversarial_2 (second D on the refined MIXING image, :847-849),
        vgg19 (w=20) vs the 512px ground truth, L1_ffhq + L1_ffhq_diff (the
        (diff_ratio-1)-weighted L1 on the thresholded target-minus-stage1 diff mask,
        :693-696 mask, va_losses_and_visuals_two.py:74-76), and the cycle_stage2
        consistency family: vgg19_cycle / L1_ffhq_cycle pull the 'area'-downsized
        refined output back to the stage-1 prediction (:69-93), vgg19_mix /
        L1_ffhq_mix do the same for the mixing branch (:95-110).
  dis:  hinge on (target*face_mask, refined*face_mask) for the main D (:898-900) and
        (target*face_mask, refined_mixing*mixing_face_mask) for the second D
        (:915-918).

Masks are produced live exactly like the reference (:610-614, :699-702): the matting
net gives the matte (`get_mask`), BiSeNet's FACE labels give face_idt, and
face_mask = matte * face_idt; the encoder input is matte-masked while the residual is
face-masked (see Stage2Enhancer). Stage-1 runs frozen (stop_gradient); the enhancer
is the only trainable generator here.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ExperimentConfig
from ..losses import (
    adversarial_loss_dis,
    adversarial_loss_gen,
    feature_matching_loss,
    perceptual_loss,
)
from .state import make_optimizer

sg = jax.lax.stop_gradient


def _resize_bilinear(img: jax.Array, size: int) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=False) == jax.image 'linear'."""
    if img.shape[1] == size and img.shape[2] == size:
        return img
    b, _, _, c = img.shape
    return jax.image.resize(img, (b, size, size, c), method="linear")


def _resize_area(img: jax.Array, size: int) -> jax.Array:
    """F.interpolate(mode='area'): box average. Integer-factor fast path (all prod
    shapes: 512->128->64), adaptive fallback via jax.image otherwise."""
    b, h, w, c = img.shape
    if h == size and w == size:
        return img
    if h % size == 0 and w % size == 0:
        fh, fw = h // size, w // size
        return jnp.mean(img.reshape(b, size, fh, size, fw, c), axis=(2, 4))
    return jax.image.resize(img, (b, size, size, c), method="linear")


@struct.dataclass
class Stage2TrainState:
    step: jax.Array
    enh_params: Any
    enh_sn_state: Any
    enh_opt_state: optax.OptState
    dis_params: Any
    dis_sn_state: Any
    dis_opt_state: optax.OptState
    # second (mixing) discriminator — None-leaves when use_second_dis=False
    dis2_params: Any = None
    dis2_sn_state: Any = None
    dis2_opt_state: Any = None

    @classmethod
    def create(cls, cfg: ExperimentConfig, enh_variables, dis_variables,
               dis2_variables=None):
        enh_opt = make_optimizer(cfg.gen_opt)
        dis_opt = make_optimizer(cfg.dis_opt)
        extra = {}
        if dis2_variables is not None:
            extra = dict(
                dis2_params=dis2_variables["params"],
                dis2_sn_state=dis2_variables.get("sn_state", {}),
                dis2_opt_state=dis_opt.init(dis2_variables["params"]),
            )
        return cls(
            step=jnp.zeros((), jnp.int32),
            enh_params=enh_variables["params"],
            enh_sn_state=enh_variables.get("sn_state", {}),
            enh_opt_state=enh_opt.init(enh_variables["params"]),
            dis_params=dis_variables["params"],
            dis_sn_state=dis_variables.get("sn_state", {}),
            dis_opt_state=dis_opt.init(dis_variables["params"]),
            **extra,
        )


def make_stage2_train_step(
    cfg: ExperimentConfig,
    enhancer_apply: Callable,   # (variables, pred, face_mask, matte) -> (refined, muts)
    dis_apply: Callable,        # (variables, img) -> (scores, feats)
    second_dis_apply: Optional[Callable] = None,
    vgg19_apply: Callable = None,
    vgg19_params: Any = None,
    face_parsing: Optional[Tuple] = None,  # (apply, params): img -> (B,H,W,19) logits
    matting: Optional[Tuple] = None,       # (apply, params): img -> (B,H,W,1) matte
):
    enh_opt = make_optimizer(cfg.gen_opt)
    dis_opt = make_optimizer(cfg.dis_opt)
    s2 = cfg.stage2

    def _live_masks(img: jax.Array, fallback: jax.Array):
        """matte (get_mask) and matte*face_idt, frozen (vol_avatar_two.py:610-614)."""
        matte = fallback
        if matting is not None:
            mt_apply, mt_params = matting
            matte = sg(mt_apply(mt_params, img))
        face = jnp.ones_like(matte)
        if face_parsing is not None:
            from ..models.face_parsing import binary_face_mask

            fp_apply, fp_params = face_parsing
            face = sg(binary_face_mask(fp_apply(fp_params, img))).astype(matte.dtype)
        return matte, matte * face

    def train_step(state: Stage2TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        """batch: pred_target_img (frozen stage-1 output, any res), target_img_ffhq;
        optional pred_mixing_img, target_mask_ffhq, face_mask (mask fallback)."""
        size = batch["target_img_ffhq"].shape[1]
        pred_s1 = _resize_bilinear(sg(batch["pred_target_img"]), size)
        ones = jnp.ones_like(pred_s1[..., :1])
        # target is hard-masked by its dataset matte (vol_avatar_two.py:691)
        target = batch["target_img_ffhq"] * sg(batch.get("target_mask_ffhq", ones))
        matte, face_mask = _live_masks(pred_s1, batch.get("face_mask", ones))

        mix_s1 = None
        if s2.pred_mixing and "pred_mixing_img" in batch:
            mix_s1 = _resize_bilinear(sg(batch["pred_mixing_img"]), size)
            mix_matte, mix_face_mask = _live_masks(
                mix_s1, batch.get("mixing_face_mask", ones))

        # diff mask: any channel of (target - stage1_pred)*face_mask above threshold
        # (vol_avatar_two.py:693-696)
        diff_mask = sg((jnp.sum(
            (target - pred_s1) * face_mask > s2.mask_threshold,
            axis=-1, keepdims=True) > 0).astype(pred_s1.dtype))

        rs, rs2 = s2.resize_s2, s2.resize_s2 // 2

        def enh_loss_fn(params):
            enh_vars = {"params": params, "sn_state": state.enh_sn_state}
            refined, enh_muts = enhancer_apply(enh_vars, pred_s1, face_mask, matte)
            dis_vars = {"params": state.dis_params, "sn_state": state.dis_sn_state}
            # D sees face-masked images on both sides (vol_avatar_two.py:838-843)
            real_scores, real_feats = dis_apply(dis_vars, target * face_mask)
            fake_scores, fake_feats = dis_apply(dis_vars, refined * face_mask)
            losses = {
                "gen_adversarial": s2.adversarial * s2.adversarial_gen *
                    adversarial_loss_gen(fake_scores),
                "feature_matching": s2.feature_matching * feature_matching_loss(
                    jax.tree.map(sg, real_feats), fake_feats),
            }
            if vgg19_apply is not None and s2.vgg19 > 0:
                losses["vgg19"] = s2.vgg19 * perceptual_loss(
                    vgg19_apply, vgg19_params, refined, target, num_scales=2)
            if s2.l1_weight > 0:
                losses["L1_ffhq"] = s2.l1_weight * jnp.mean(
                    jnp.abs(refined - target))
                losses["L1_ffhq_diff"] = (s2.diff_ratio - 1.0) * s2.l1_weight * \
                    jnp.mean(jnp.abs(refined * diff_mask - target * diff_mask))
            if s2.cycle_stage2 > 0:
                # down-res consistency vs the (frozen) stage-1 prediction
                if vgg19_apply is not None and s2.vgg19 > 0:
                    losses["vgg19_cycle"] = s2.vgg19 * s2.cycle_stage2 * \
                        perceptual_loss(vgg19_apply, vgg19_params,
                                        _resize_area(refined, rs),
                                        _resize_area(pred_s1, rs), num_scales=2)
                if s2.l1_weight > 0:
                    losses["L1_ffhq_cycle"] = s2.l1_weight * s2.cycle_stage2 * \
                        jnp.mean(jnp.abs(_resize_area(refined, rs2)
                                         - _resize_area(pred_s1, rs2)))
            refined_mix = None
            if mix_s1 is not None:
                refined_mix, enh_muts = enhancer_apply(
                    {"params": params,
                     "sn_state": enh_muts.get("sn_state", state.enh_sn_state)},
                    mix_s1, mix_face_mask, mix_matte)
                if second_dis_apply is not None and state.dis2_params is not None:
                    d2_vars = {"params": state.dis2_params,
                               "sn_state": state.dis2_sn_state}
                    mix_scores, _ = second_dis_apply(
                        d2_vars, refined_mix * mix_face_mask)
                    losses["gen_adversarial_2"] = s2.adversarial_gen_2 * \
                        adversarial_loss_gen(mix_scores)
                if s2.cycle_stage2 > 0:
                    if vgg19_apply is not None and s2.vgg19 > 0:
                        losses["vgg19_mix"] = s2.vgg19 * s2.cycle_stage2 * \
                            perceptual_loss(vgg19_apply, vgg19_params,
                                            _resize_area(refined_mix, rs),
                                            _resize_area(mix_s1, rs), num_scales=2)
                    if s2.l1_weight > 0:
                        losses["L1_ffhq_mix"] = s2.l1_weight * s2.cycle_stage2 * \
                            jnp.mean(jnp.abs(_resize_area(refined_mix, rs2)
                                             - _resize_area(mix_s1, rs2)))
            total = jnp.zeros(())
            for v in losses.values():
                total = total + v
            return total, (losses, refined, refined_mix, enh_muts)

        (enh_loss, (losses, refined, refined_mix, enh_muts)), grads = \
            jax.value_and_grad(enh_loss_fn, has_aux=True)(state.enh_params)
        updates, enh_opt_state = enh_opt.update(grads, state.enh_opt_state,
                                                state.enh_params)
        enh_params = optax.apply_updates(state.enh_params, updates)

        refined_d = sg(refined)

        def dis_loss_fn(dis_params):
            dis_vars = {"params": dis_params, "sn_state": state.dis_sn_state}
            real_scores, _ = dis_apply(dis_vars, target * face_mask)
            fake_scores, _ = dis_apply(dis_vars, refined_d * face_mask)
            return s2.adversarial * adversarial_loss_dis(real_scores, fake_scores)

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        d_updates, dis_opt_state = dis_opt.update(dis_grads, state.dis_opt_state,
                                                  state.dis_params)
        dis_params = optax.apply_updates(state.dis_params, d_updates)

        metrics = {f"s2/{k}": v for k, v in losses.items()}
        metrics["s2/total"] = enh_loss
        metrics["s2/dis_adversarial"] = dis_loss
        extra = {}
        if (second_dis_apply is not None and state.dis2_params is not None
                and refined_mix is not None):
            mix_d = sg(refined_mix)

            def dis2_loss_fn(p):
                d2_vars = {"params": p, "sn_state": state.dis2_sn_state}
                real_scores, _ = second_dis_apply(d2_vars, target * face_mask)
                fake_scores, _ = second_dis_apply(d2_vars, mix_d * mix_face_mask)
                return adversarial_loss_dis(real_scores, fake_scores)

            d2_loss, d2_grads = jax.value_and_grad(dis2_loss_fn)(state.dis2_params)
            d2_updates, dis2_opt_state = dis_opt.update(
                d2_grads, state.dis2_opt_state, state.dis2_params)
            extra = dict(
                dis2_params=optax.apply_updates(state.dis2_params, d2_updates),
                dis2_opt_state=dis2_opt_state)
            metrics["s2/dis_adversarial_2"] = d2_loss

        new_state = state.replace(
            step=state.step + 1, enh_params=enh_params,
            enh_sn_state=enh_muts.get("sn_state", state.enh_sn_state),
            enh_opt_state=enh_opt_state, dis_params=dis_params,
            dis_opt_state=dis_opt_state, **extra)
        return new_state, metrics

    return train_step
