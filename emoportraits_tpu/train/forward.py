"""Training-time generator forward: wires the VolumetricAvatar module, the frozen
head-pose regressor / face parser / matting net, and the mixing/cycle/self-supervision
branches into a single `gen_apply(variables, batch, rng) -> (out, new_sn_state)` used by
the train step.

Reference flow (va.py:287-765 G_forward + :899-1020 Model.forward 'gen' pass):
  * use_mix_mask: dataset masks are refined by the frozen BiSeNet face parser before
    masking the source/target (va.py:297-361, prod use_ibug_mask=False branch);
  * thetas for source/target from the frozen HeadPoseRegressor (:375-378, no-grad);
  * mixing theta by polar decomposition of source/target poses (non_specific.py:128);
  * the generated mixing image is matted by the frozen MODNet-role net
    (va.py:682-684) -> pred_mixing_mask / pred_mixing_masked_img;
  * cycle expressions: the frozen regressor re-runs on the GENERATED images, whose
    aligned crops are re-embedded (va.py:700-765) -> pred_cycle_exp / mixing_cycle_exp.
    The mixing image is ROLLED BY -1 first (va.py:716-721): mixing sample i was driven
    by target i-1's expression, so the -1 roll restores element-wise pairing with
    target_pose_embed for the pull/push losses;
  * aligned face crops for the vgg19_face / resnet18_fv_mix losses
    (va_losses_and_visuals.py:296-304 align_warp resampling; :324-355 mixing_img_align);
  * canonical volume re-derived from the target frame (no-grad) for volumes_l1
    (:554-566) using theta_st = (source scale, target rotation, target translation).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..geometry.transforms import (
    align_keypoints,
    get_mixing_theta,
    get_transform_matrix,
    inverse_theta_4x4,
)
from ..models.expression_embedder import align_face_crop
from ..models.face_parsing import binary_face_mask
from ..models.stage1 import VolumetricAvatar

# canonical nose template replacing landmarks 27:31 before the nose alignment
# (reference va.py:391-394)
_NOSE_TEMPLATE = jnp.array([[0.0, -0.2, 0.22],
                            [0.0, -0.13, 0.26],
                            [0.0, -0.06, 0.307],
                            [0.0, -0.008, 0.310]], jnp.float32)

# (apply_fn, params) pairs for the frozen auxiliary nets; apply takes a [0,1] image.
FrozenNet = Tuple[Callable, Any]


def make_gen_apply(
    cfg: ExperimentConfig,
    model: VolumetricAvatar,
    head_pose_apply: Optional[Callable],  # (params, img, return_srt) -> theta /
    #                                       (theta, s, r, t); None selects the
    #                                       keypoint-fitted-theta branch
    head_pose_params: Any,
    canonical_keypoints: Optional[jax.Array] = None,  # (68, 3) template for the
    # keypoint-theta branch (the reference's data/aligned_keypoints_3d.npy role)
    face_parsing: Optional[FrozenNet] = None,  # img01 -> (B, H, W, 19) logits
    matting: Optional[FrozenNet] = None,       # img01 -> (B, H, W, 1) alpha
    rtnet: Optional[FrozenNet] = None,  # (img01, keypoints) -> (B, H, W, 1) face prob
    eval_mode: bool = False,  # torch-eval semantics: no dropout, SN uses the
                              # STORED power-iteration vectors without updating
                              # them (reference model.eval() G_forward)
):
    train_cfg = cfg.train

    def gen_apply(variables: Dict, batch: Dict[str, jax.Array], rng: jax.Array,
                  aux_params: Optional[Dict[str, Any]] = None):
        """aux_params: optional runtime overrides for the frozen-net params
        ('head_pose_params', 'face_parsing_params', 'matting_params') — passed
        through train_step so the frozen weights are jit ARGUMENTS, not closure
        constants inlined into the HLO (see step.tower_params_pytree)."""
        aux = aux_params or {}
        hp_params = aux.get("head_pose_params", head_pose_params)
        src, tgt = batch["source_img"], batch["target_img"]
        src_mask = batch.get("source_mask", jnp.ones_like(src[..., :1]))
        tgt_mask = batch.get("target_mask", jnp.ones_like(tgt[..., :1]))

        # use_mix_mask refinement: dataset matte AND parser face mask (va.py:352-361;
        # threshold 0.6 on the binary label mask). Frozen -> stop_gradient.
        if train_cfg.use_mix_mask and face_parsing is not None:
            fp_apply, fp_params = face_parsing
            fp_params = aux.get("face_parsing_params", fp_params)
            if train_cfg.use_ibug_mask:
                # ibug-branch semantics (va.py:324-349): face term + hat labels,
                # plus the dataset matte with its bottom half zeroed, threshold 0.6,
                # then AND with the dataset matte. The face term is the RTNet
                # tanh-polar soft probability when use_old_fp=False (va.py:300-321
                # get_lips path, models/rtnet.py) and the BiSeNet FACE_LABELS mask
                # otherwise (va.py:326-328 — also the reference's except-fallback).
                from ..models.face_parsing import BODY_LABELS, FACE_LABELS

                use_rtnet = (rtnet is not None and not train_cfg.use_old_fp
                             and "source_keypoints" in batch)

                def _ibug_refine(img, mask, keypoints):
                    logits = jax.lax.stop_gradient(fp_apply(fp_params, img))
                    if use_rtnet:
                        rt_apply, rt_params = rtnet
                        rt_params = aux.get("rtnet_params", rt_params)
                        face = jax.lax.stop_gradient(
                            rt_apply(rt_params, img, keypoints[..., :2]))
                    else:
                        face = binary_face_mask(logits, labels_set=FACE_LABELS)
                    hat = binary_face_mask(logits, labels_set=BODY_LABELS)
                    lower_zeroed = mask * (
                        jnp.arange(mask.shape[1])[None, :, None, None]
                        < mask.shape[1] // 2)
                    gate = ((face + hat + lower_zeroed) >= 0.6).astype(mask.dtype)
                    return mask * gate

                src_mask = _ibug_refine(src, src_mask,
                                        batch.get("source_keypoints"))
                tgt_mask = _ibug_refine(tgt, tgt_mask,
                                        batch.get("target_keypoints"))
            else:
                src_face = binary_face_mask(
                    jax.lax.stop_gradient(fp_apply(fp_params, src)))
                tgt_face = binary_face_mask(
                    jax.lax.stop_gradient(fp_apply(fp_params, tgt)))
                src_mask = src_mask * src_face.astype(src_mask.dtype)
                tgt_mask = tgt_mask * tgt_face.astype(tgt_mask.dtype)

        if head_pose_apply is not None:
            # Frozen head pose (reference va.py:375-378, under no_grad).
            hp = lambda img: head_pose_apply(hp_params, jax.lax.stop_gradient(img),
                                             return_srt=True)
            src_theta, src_scale, src_rot, src_tr = jax.tree.map(
                jax.lax.stop_gradient, hp(src))
            tgt_theta, tgt_scale, tgt_rot, tgt_tr = jax.tree.map(
                jax.lax.stop_gradient, hp(tgt))
        else:
            # estimate_head_pose_from_keypoints=False branch (va.py:380-384): the
            # ground-truth thetas are fitted from the stored 68-point 3D landmarks
            # against the canonical template (reference estimate_theta's host-side
            # LBFGS -> on-device Umeyama / LM fit here, selected by the
            # lpe theta_fit_method / theta_fit_sep_scales config knobs).
            from ..geometry.transforms import decompose_transform_matrix
            from ..models.expression_embedder import estimate_theta_from_keypoints

            if canonical_keypoints is None:
                raise ValueError("head_pose_apply=None requires "
                                 "canonical_keypoints (the aligned 68x3 template)")
            ec = cfg.model.expression_embedder
            fit = lambda kp: estimate_theta_from_keypoints(
                kp, canonical_keypoints, method=ec.theta_fit_method,
                sep_scales=ec.theta_fit_sep_scales)
            src_theta = jax.lax.stop_gradient(fit(batch["source_keypoints"]))
            tgt_theta = jax.lax.stop_gradient(fit(batch["target_keypoints"]))
            src_scale, src_rot, src_tr = decompose_transform_matrix(src_theta)
            tgt_scale, tgt_rot, tgt_tr = decompose_transform_matrix(tgt_theta)

        mixing_theta = None
        new_pool = new_pool_count = None
        if train_cfg.pred_mixing:
            mix_tgt = tgt_theta[:, :3]
            pool = aux.get("thetas_pool")
            if train_cfg.random_theta and pool is not None:
                # prod random_theta (va.py:650, non_specific.py:137-152): append the
                # batch's target thetas to a 50-deep history ring, then with prob 0.5
                # mix against a uniformly-sampled pool entry instead of the current
                # targets (the reference's roll(0) shuffle there is a no-op).
                count = aux["thetas_pool_count"]
                pool = jax.lax.dynamic_update_index_in_dim(
                    pool, mix_tgt, count % pool.shape[0], axis=0)
                count = count + 1
                rk = jax.random.fold_in(rng, 0x7E7A)
                r = jax.random.randint(jax.random.fold_in(rk, 1), (), 0,
                                       jnp.minimum(count, pool.shape[0]))
                use_pool = jax.random.bernoulli(jax.random.fold_in(rk, 2), 0.5)
                mix_tgt = jnp.where(use_pool, pool[r], mix_tgt)
                new_pool, new_pool_count = pool, count
            elif not train_cfg.random_theta:
                # non-random reference branch pairs each sample with the NEXT
                # sample's target pose (non_specific.py:153-155: roll(1) over batch)
                mix_tgt = jnp.roll(mix_tgt, 1, axis=0)
            # stop_gradient: the reference computes this on host in numpy/scipy with no
            # gradient (non_specific.py:128-190); it also shields the SVD VJP, which is
            # NaN for degenerate singular values (e.g. identity poses).
            mixing_theta = jax.lax.stop_gradient(
                get_mixing_theta(src_theta[:, :3], mix_tgt))

        # AdaptiveConv annealing alpha (step.py computes it from the iteration when
        # gen_adaptive_use_annealing; defaults to fully-on when absent)
        conv_alpha = aux.get("conv_alpha", 1.0)
        apply_kwargs = dict(
            mixing_theta=mixing_theta, deterministic=eval_mode,
            method=model.generate,
            conv_alpha=conv_alpha,
            match_neutral=train_cfg.match_neutral,
            # elastic-warped expression-net inputs (reference feeds
            # source/target_warp_aug to the embedder in training,
            # expression_embedder.py:163-169, so it can't cheat on texture cues)
            source_expr_img=batch.get("source_warp_aug"),
            target_expr_img=batch.get("target_warp_aug"),
        )
        if cfg.model.detach_lat_vol > 0 and aux.get("step") is not None:
            # iteration for the periodic latent-volume detach (va.py:512-514)
            apply_kwargs["step"] = aux["step"]
        if eval_mode:
            out = model.apply(variables, src, src_mask, tgt, src_theta, tgt_theta,
                              **apply_kwargs)
            muts = {}
        else:
            out, muts = model.apply(
                variables, src, src_mask, tgt, src_theta, tgt_theta,
                mutable=["sn_state"], rngs={"dropout": rng}, **apply_kwargs)
        out["refined_source_mask"] = src_mask
        out["refined_target_mask"] = tgt_mask
        if mixing_theta is not None:
            out["mixing_theta"] = mixing_theta
        if new_pool is not None:
            out["thetas_pool"] = jax.lax.stop_gradient(new_pool)
            out["thetas_pool_count"] = new_pool_count

        frozen = {"params": variables["params"],
                  "sn_state": muts.get("sn_state", variables.get("sn_state", {}))}

        # ---- aligned face crops for vgg19_face (va_losses_and_visuals.py:296-322) ----
        gs = cfg.model.expression_embedder.image_size // 2
        out["target_img_align_orig"] = align_face_crop(tgt, tgt_theta, gs)
        out["pred_target_img_face_align"] = align_face_crop(
            out["pred_target_img"], tgt_theta, gs)
        if train_cfg.match_neutral:
            # full-resolution theta-aligned prediction: the vgg19_neutral target
            # (reference align_warp_full resample, va_losses_and_visuals.py:92-96)
            out["target_img_full_align"] = align_face_crop(
                out["pred_target_img"], tgt_theta, out["pred_target_img"].shape[1])

        # ---- mixing branch: matting + aligned crop + cycle re-embeds ----
        if train_cfg.pred_mixing:
            pred_img = out["pred_target_img"]
            if head_pose_apply is not None:
                pred_theta = jax.lax.stop_gradient(
                    head_pose_apply(hp_params, jax.lax.stop_gradient(pred_img),
                                    return_srt=False))
            else:
                # keypoint-theta branch has no regressor to run on generated
                # frames; the prediction reconstructs the target frame, so its
                # pose IS the (fitted) target theta
                pred_theta = tgt_theta
            out["pred_cycle_exp"] = model.apply(
                frozen, pred_img, pred_theta, method=model.expression_vector)

            mix_img = out["pred_mixing_img"]
            if matting is not None:
                # frozen matting of the generated mixing image (va.py:682-684)
                mt_apply, mt_params = matting
                mt_params = aux.get("matting_params", mt_params)
                mix_alpha = jax.lax.stop_gradient(mt_apply(mt_params, mix_img))
                out["pred_mixing_mask"] = mix_alpha
                out["pred_mixing_masked_img"] = mix_img * mix_alpha
            if head_pose_apply is not None:
                mix_theta_pred = jax.lax.stop_gradient(
                    head_pose_apply(hp_params, jax.lax.stop_gradient(mix_img),
                                    return_srt=False))
            else:
                # the mixing image is generated AT mixing_theta — use it directly
                mix_theta_pred = (mixing_theta if mixing_theta is not None
                                  else tgt_theta)
            # fv_mix crop: UNROLLED mixing image under its own regressed theta
            # (va.py:693-707 data_dict_exp pass -> mixing_img_align)
            out["mixing_img_align"] = align_face_crop(mix_img, mix_theta_pred, gs)
            # cycle embedding: roll -1 restores pairing (va.py:716-721); rolling the
            # per-sample embedding equals rolling the image before embedding.
            mix_emb = model.apply(
                frozen, mix_img, mix_theta_pred, method=model.expression_vector)
            out["mixing_cycle_exp"] = jnp.roll(mix_emb, -1, axis=0)

            if cfg.weights.contrastive_idt > 0:
                # reconstructed contrastive_idt inputs (the reference consumes
                # idt_embed_face{,_target,_pred,_mix} keys nothing produces,
                # va_losses_and_visuals.py:581-622): the identity embedder run
                # on the theta-aligned face crops
                def idt(img):
                    return model.apply(frozen, img, method=model.identity_embed)

                out["idt_embed_face"] = idt(align_face_crop(src, src_theta, gs))
                out["idt_embed_face_target"] = idt(out["target_img_align_orig"])
                out["idt_embed_face_pred"] = idt(
                    out["pred_target_img_face_align"])
                out["idt_embed_face_mix"] = idt(out["mixing_img_align"])

            if train_cfg.pred_cycle:
                # pred_cycle branch (va.py:739-765): decode the canonical volume
                # under the re-embedded cycle expressions for the cycle-consistency
                # perceptual losses. cycle_mix_pred uses the mixing-cycle
                # expression (live in the reference); pred_identical_cycle uses
                # the pred-cycle expression (the reference's cycle_idn loss reads
                # it but nothing ever produces it — reconstructed).
                out["cycle_mix_pred"] = model.apply(
                    frozen, out["canonical_volume"], out["mixing_cycle_exp"],
                    out["idt_embed"], tgt_theta, conv_alpha,
                    method=model.decode_with_expression)
                out["pred_identical_cycle"] = model.apply(
                    frozen, out["canonical_volume"], out["pred_cycle_exp"],
                    out["idt_embed"], tgt_theta, conv_alpha,
                    method=model.decode_with_expression)
                out["cycle_mix_pred_align"] = align_face_crop(
                    out["cycle_mix_pred"], tgt_theta, gs)
                out["pred_identical_cycle_align"] = align_face_crop(
                    out["pred_identical_cycle"], tgt_theta, gs)

        # ---- canonical volume from target (no-grad; volumes_l1) ----
        if train_cfg.predict_target_canon_vol:
            theta_st = get_transform_matrix(src_scale, tgt_rot, tgt_tr)
            inv_theta_st = inverse_theta_4x4(theta_st)
            if "source_keypoints" in batch and "target_keypoints" in batch \
                    and batch["source_keypoints"].shape[-1] == 3:
                # keypoint refinement of the canon-from-target rotation: align the
                # de-posed target landmarks to the de-posed source landmarks and
                # right-compose the similarity into inv_theta_st (va.py:437-448);
                # the nose-template variant (:389-409) is exposed as an output.
                skp = jax.lax.stop_gradient(batch["source_keypoints"])
                tkp = jax.lax.stop_gradient(batch["target_keypoints"])
                inv_src = inverse_theta_4x4(src_theta)
                src_warped = jnp.einsum("bni,bij->bnj", skp, inv_src[:, :3, :3])
                tgt_warped = jnp.einsum("bni,bij->bnj", tkp,
                                        inv_theta_st[:, :3, :3])
                _, transform = align_keypoints(src_warped, tgt_warped)
                inv_theta_st = inv_theta_st @ transform
                src_n = src_warped.at[:, 27:31].set(
                    _NOSE_TEMPLATE.astype(src_warped.dtype))
                aligned_n, _ = align_keypoints(src_n, src_warped, nose=True)
                out["source_warped_keypoints"] = src_warped
                out["source_warped_keypoints_n"] = aligned_n
            canon_t = model.apply(
                frozen, tgt, tgt_mask, out["target_pose_embed"], out["idt_embed"],
                inv_theta_st, conv_alpha, method=model.canonical_from_target)
            out["canon_volume_from_target"] = jax.lax.stop_gradient(canon_t)

        out["source_theta"] = src_theta
        out["target_theta"] = tgt_theta
        return out, muts.get("sn_state", {})

    return gen_apply
