"""The jitted GAN train step: generator pass then discriminator pass in ONE XLA program.

Reference flow (train.py:396-464 training_step + va.py:899-1020 Model.forward):
  opt 0 ('gen'):  G_forward -> D(target) no-grad, D(pred) w/ grad -> gen losses -> step
  opt 1 ('dis'):  D(real), D(fake.detach()) -> hinge -> step
with DDP allreduce inside loss.backward(). Here both passes are traced into one jit;
under a sharded-data mesh the mean-loss gradients produce the psum collectives
automatically (no NCCL porting — SURVEY.md §2.3).

Loss assembly parity with calc_train_losses (va_losses_and_visuals.py:22-633), prod
weights from experiments/args.txt (LossWeights in config.py). Frozen towers (VGG19,
VGGFace, gaze, face-vector, face parser, head-pose) enter as explicit constants in
`LossTowers`.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..losses import (
    adversarial_loss_dis,
    adversarial_loss_gen,
    contrastive_exp_loss,
    feature_matching_loss,
    perceptual_loss,
    pull_loss,
    push_loss,
    stm_loss,
    stm_loss_elems,
)
from ..losses.expression import cosine_embedding_loss
from ..losses.gaze import gaze_loss
from ..models.face_parsing import soft_part_masks
from .state import TrainState, make_optimizer, make_stylegan_optimizer


class LossTowers(NamedTuple):
    """Frozen evaluator networks (reference loads them as eval-mode buffers,
    losses/perceptual.py:228,250-256). All apply fns take [0,1] images except where
    noted; params are frozen constants (ported or random-for-tests)."""
    vgg19_apply: Optional[Callable] = None
    vgg19_params: Any = None
    vggface_apply: Optional[Callable] = None
    vggface_params: Any = None
    head_pose_apply: Optional[Callable] = None
    head_pose_params: Any = None
    # RT-GENE-role gaze tower: (params, eye_crop) -> {relu_i_1: act} (losses/gaze.py)
    gaze_apply: Optional[Callable] = None
    gaze_params: Any = None
    # face-recognition embedding: (params, img01) -> (B, D) (losses/face_vector.py)
    face_vector_embed: Optional[Callable] = None
    face_vector_params: Any = None
    # BiSeNet parsing logits: (params, img01) -> (B, H, W, 19) (models/face_parsing.py)
    face_parsing_apply: Optional[Callable] = None
    face_parsing_params: Any = None
    # MobileFaceNet landmark feature taps: (params, crop112) -> {tap: act}
    # (losses/emotion.py; reference 'landmarks' perceptual config)
    landmark_apply: Optional[Callable] = None
    landmark_params: Any = None
    # optional emotion/identity towers (va_losses_and_visuals.py:745-763);
    # *_layers/_weights are the tap config (tiny towers have fewer taps)
    face_resnet_apply: Optional[Callable] = None
    face_resnet_params: Any = None
    face_resnet_layers: Tuple[str, ...] = ()
    face_resnet_weights: Tuple[float, ...] = ()
    # BiSeNet-trunk feature taps for perc_face_pars: (params, img01) ->
    # {feat4, feat8, feat16, feat32} (reference _bisenet_FP, perceptual.py:506)
    face_pars_feats_apply: Optional[Callable] = None
    face_pars_feats_params: Any = None
    emotion_vgg_apply: Optional[Callable] = None
    emotion_vgg_params: Any = None
    emotion_resnet_apply: Optional[Callable] = None
    emotion_resnet_params: Any = None


# LossTowers fields that hold parameter PYTREES (vs apply fns). These can be passed
# to train_step as a runtime argument instead of being closed over: closure constants
# are inlined into the HLO as literals, and the frozen towers sum to hundreds of MB —
# big enough to blow past compile-payload limits and bloat the compilation cache.
TOWER_PARAM_FIELDS = ("vgg19_params", "vggface_params", "head_pose_params",
                      "gaze_params", "face_vector_params", "face_parsing_params",
                      "landmark_params", "face_resnet_params",
                      "emotion_vgg_params", "emotion_resnet_params",
                      "face_pars_feats_params")


def remat_towers(towers: "LossTowers") -> "LossTowers":
    """Wrap every tower apply fn in jax.checkpoint: the backward pass then
    recomputes tower activations instead of storing them (only the tower inputs
    and tapped outputs are saved). The towers are frozen — no weight grads — so
    the only backward need is d(loss)/d(pred) through the feature taps, and the
    recompute costs one extra tower forward. Measured v5e 512px batch 2 with the
    generator subnets already rematted: HBM 16.10G -> fits under 15.75G (the
    VGG19 pyramid + per-eye VGG16s + parser-trunk taps are the residual)."""
    wrapped = {}
    for f in LossTowers._fields:
        v = getattr(towers, f)
        # head_pose_apply is exempt: its `return_srt` Python-bool flag selects the
        # output structure and must stay untraced (jax.checkpoint traces every arg)
        if callable(v) and f != "head_pose_apply":
            v = jax.checkpoint(v)
        wrapped[f] = v
    return LossTowers(**wrapped)


def tower_params_pytree(towers: "LossTowers", frozen_nets=None) -> Dict[str, Any]:
    """The frozen-tower parameter pytree to pass as train_step's 4th argument.
    `frozen_nets` (train.towers.FrozenNets) contributes the matting params."""
    tp = {f: getattr(towers, f) for f in TOWER_PARAM_FIELDS}
    if frozen_nets is not None and getattr(frozen_nets, "matting", None) is not None:
        tp["matting_params"] = frozen_nets.matting[1]
    if frozen_nets is not None and getattr(frozen_nets, "rtnet", None) is not None:
        tp["rtnet_params"] = frozen_nets.rtnet[1]
    return tp


def cast_tower_params_bf16(tp: Dict[str, Any],
                           keep_f32: Tuple[str, ...] = (
                               "head_pose_params", "face_parsing_params",
                               "matting_params", "rtnet_params")
                           ) -> Dict[str, Any]:
    """Frozen PERCEPTUAL evaluator weights in bf16: pure forward passes whose
    feature L1/cosine losses tolerate bf16 easily. Exempt: the head-pose
    regressor (thetas feed geometry — polar mixing, keypoint alignment) and the
    mask-producing nets (face parser / matting / RTNet), whose outputs pass
    through hard thresholds where an epsilon flips whole mask pixels.

    Measured v5e 512px: no train-step speedup (447.8 vs 445.8 ms/iter, same
    XLA-counted FLOPs) — the step is not tower-matmul-bound — so this stays an
    opt-in memory knob (tower buffers halve), default off."""
    def cast(x):
        return x.astype(jnp.bfloat16) if hasattr(x, "dtype") \
            and x.dtype == jnp.float32 else x

    return {k: (v if k in keep_f32 else jax.tree.map(cast, v))
            for k, v in tp.items()}


def composite_target(cfg: ExperimentConfig, target: jax.Array,
                     mask: Optional[jax.Array]) -> jax.Array:
    """Masked/green-composited TARGET (reference va.py:617-632: the dataset target is
    composited and the RAW prediction is compared against it — that is what trains the
    generator to paint the green background itself)."""
    if not cfg.train.use_seg or mask is None:
        return target
    mask = jax.lax.stop_gradient(mask).astype(target.dtype)
    target = target * mask
    if cfg.train.green:
        target = target + (1.0 - mask) * jnp.asarray([0.0, 1.0, 0.0], target.dtype)
    return target


def gen_losses(
    cfg: ExperimentConfig,
    out: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    dis_apply: Callable,
    dis_params,
    towers: LossTowers,
    prev_targets: jax.Array,
    dis2_apply: Optional[Callable] = None,
    dis2_params=None,
    sg_apply: Optional[Callable] = None,
    sg_params=None,
    step_count: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    w = cfg.weights
    losses: Dict[str, jax.Array] = {}
    pred = out["pred_target_img"]
    target = composite_target(cfg, batch["target_img"],
                              out.get("refined_target_mask", batch.get("target_mask")))

    # epoch gates (reference va_losses_and_visuals.py:182,325,458): heavy face-part
    # L1s start at face_parts_epoch_start, fv_mix at mix_losses_start, the
    # expression-contrastive family at contr_losses_start. Traced multipliers so the
    # schedule lives inside the one compiled step.
    if step_count is not None:
        epoch = step_count // max(cfg.train.train_epoch_len, 1)
        g_parts = (epoch >= cfg.train.face_parts_epoch_start).astype(pred.dtype)
        g_mix = (epoch >= cfg.train.mix_losses_start).astype(pred.dtype)
        g_contr = (epoch >= cfg.train.contr_losses_start).astype(pred.dtype)
    else:
        g_parts = g_mix = g_contr = 1.0

    # --- adversarial + feature matching ---
    real_scores, real_feats = dis_apply(dis_params, target)
    fake_scores, fake_feats = dis_apply(dis_params, pred)
    losses["gen_adversarial"] = w.adversarial * adversarial_loss_gen(fake_scores)
    losses["feature_matching"] = w.feature_matching * feature_matching_loss(
        jax.tree.map(jax.lax.stop_gradient, real_feats), fake_feats)

    # --- second discriminator on the MIXING image (use_mix_dis; gen side
    #     va.py:948-950, weight va_losses_and_visuals.py:53-58) ---
    if dis2_apply is not None and "pred_mixing_img" in out:
        mix_scores, _ = dis2_apply(dis2_params, out["pred_mixing_img"])
        losses["gen_adversarial_mix"] = (
            w.adversarial * w.mix_gen_adversarial * adversarial_loss_gen(mix_scores))

    # --- StyleGAN2 D nonsaturating G loss (use_stylegan_d, va.py:955-972) ---
    if sg_apply is not None:
        from ..losses.gan import g_nonsaturating_loss
        g_style = g_nonsaturating_loss(sg_apply(sg_params, pred * 2.0 - 1.0))
        if "pred_mixing_img" in out:
            g_style = g_style + g_nonsaturating_loss(
                sg_apply(sg_params, out["pred_mixing_img"] * 2.0 - 1.0))
        losses["g_style"] = w.stylegan * g_style

    # --- perceptual towers ---
    if towers.vgg19_apply is not None and w.vgg19 > 0:
        # prod vgg19_num_scales=4 at 512px; clamp so the smallest pyramid level still
        # survives VGG's 4 pools (needs >= 32px input per scale).
        import math
        n_scales = max(1, min(cfg.train.vgg19_num_scales,
                              int(math.log2(pred.shape[1] // 32)) + 1))
        losses["vgg19"] = w.vgg19 * perceptual_loss(
            towers.vgg19_apply, towers.vgg19_params, pred, target, num_scales=n_scales)
    if towers.vggface_apply is not None and w.vgg19_face > 0:
        # vgg19_face runs on the theta-ALIGNED face crops, not the full frames
        # (va_losses_and_visuals.py:296-322: align_warp resample of [pred, target]);
        # the tower uses ImageNet normalization + resize 224 (init_losses :739-742).
        fp = out.get("pred_target_img_face_align", pred)
        ft = out.get("target_img_align_orig", target)
        rs = min(224, fp.shape[1])
        losses["vgg19_face"] = w.vgg19_face * perceptual_loss(
            towers.vggface_apply, towers.vggface_params, fp,
            jax.lax.stop_gradient(ft),
            num_scales=2 if rs >= 64 else 1, normalization="imagenet", resize_to=rs)

    # --- gaze loss (prod w=10; reference va_losses_and_visuals.py:148-161 on the full
    #     pred/target frames with the target's 68 2D keypoints) ---
    if towers.gaze_apply is not None and w.gaze > 0 and "target_keypoints" in batch:
        kp = jax.lax.stop_gradient(batch["target_keypoints"][..., :2])
        losses["gaze"] = w.gaze * gaze_loss(
            towers.gaze_apply, towers.gaze_params, pred, target, kp)

    # --- perc_face_pars (0 in prod; va_losses_and_visuals.py:177-179): BiSeNet-trunk
    #     perceptual L1 on the FIRST batch element only, 2 scales at 224px ---
    if towers.face_pars_feats_apply is not None and w.perc_face_pars > 0:
        losses["perc_face_pars"] = w.perc_face_pars * perceptual_loss(
            towers.face_pars_feats_apply, towers.face_pars_feats_params,
            pred[:1], jax.lax.stop_gradient(target[:1]), num_scales=2,
            layers=("feat4", "feat8", "feat16", "feat32"),
            layer_weights=(0.0625, 0.125, 0.25, 1.0),
            normalization="imagenet", resize_to=224)

    # --- cycle-consistency perceptual losses (pred_cycle branch; gates cycle_exp /
    #     cycle_idn, va_losses_and_visuals.py:259-295: full-frame vgg19 + aligned-crop
    #     vggface against the detached target; batch>1 required there because the
    #     mixing roll needs a second sample) ---
    if pred.shape[0] > 1 and towers.vgg19_apply is not None:
        for gate, img_key, tag in ((w.cycle_exp, "cycle_mix_pred", "cycle_exp"),
                                   (w.cycle_idn, "pred_identical_cycle",
                                    "cycle_idn")):
            if gate <= 0 or img_key not in out:
                continue
            wv = getattr(w, f"vgg19_{tag}")
            wf = getattr(w, f"vgg19_face_{tag}")
            if wv > 0:
                losses[f"vgg19_{tag}"] = wv * perceptual_loss(
                    towers.vgg19_apply, towers.vgg19_params, out[img_key],
                    jax.lax.stop_gradient(batch["target_img"]), num_scales=1)
            if wf > 0 and towers.vggface_apply is not None:
                rs = min(224, out[img_key].shape[1])
                losses[f"vgg19_face_{tag}"] = wf * perceptual_loss(
                    towers.vggface_apply, towers.vggface_params,
                    out[f"{img_key}_align"],
                    jax.lax.stop_gradient(out["target_img_align_orig"]),
                    num_scales=1, normalization="imagenet", resize_to=rs)

    # --- optional emotion/identity towers on the theta-aligned face crops (all 0
    #     in prod; assembly va_losses_and_visuals.py:356-403, towers :745-772) ---
    fa = out.get("pred_target_img_face_align")
    ta = out.get("target_img_align_orig")
    if fa is not None and ta is not None:
        ta = jax.lax.stop_gradient(ta)
        # face_resnet: SENet50 relu-tap L1, raw-mean face normalization, 224px
        if towers.face_resnet_apply is not None and w.face_resnet > 0:
            losses["face_resnet"] = w.face_resnet * perceptual_loss(
                towers.face_resnet_apply, towers.face_resnet_params, fa, ta,
                num_scales=1, layers=towers.face_resnet_layers,
                layer_weights=towers.face_resnet_weights,
                normalization="face_resnet", resize_to=224)
        # vgg19_emotions: grayscale 55px emotion VGG, 2 scales at factor 0.8
        if towers.emotion_vgg_apply is not None and w.vgg19_emotions > 0:
            from ..losses.emotion import to_grayscale3

            losses["vgg19_emotions"] = w.vgg19_emotions * perceptual_loss(
                towers.emotion_vgg_apply, towers.emotion_vgg_params,
                to_grayscale3(fa), to_grayscale3(ta), num_scales=2,
                normalization="none", resize_to=55, scale_factor=0.8)
        # resnet18_emotions: ResNet18-ARM layer_{1..4} L1 at 224px
        if towers.emotion_resnet_apply is not None and w.resnet18_emotions > 0:
            losses["resnet18_emotions"] = w.resnet18_emotions * perceptual_loss(
                towers.emotion_resnet_apply, towers.emotion_resnet_params, fa, ta,
                num_scales=1,
                layers=("layer_1", "layer_2", "layer_3", "layer_4"),
                layer_weights=(0.25, 0.25, 0.25, 0.25), resize_to=224)

    # --- vgg19_fv_mix (0 in prod; va_losses_and_visuals.py:356-366): cosine of
    #     flattened VGGFace conv features, aligned mixing crop vs aligned target;
    #     the reference divides the mean cosine loss by batch again (:366) and
    #     gates on epoch >= mix_losses_start ---
    if (towers.vggface_apply is not None and w.vgg19_fv_mix > 0
            and "mixing_img_align" in out):
        b_ = out["mixing_img_align"].shape[0]
        mf = towers.vggface_apply(towers.vggface_params, out["mixing_img_align"])
        tf = towers.vggface_apply(towers.vggface_params,
                                  out["target_img_align_orig"])
        losses["vgg19_fv_mix"] = g_mix * w.vgg19_fv_mix * cosine_embedding_loss(
            mf["relu_5_1"].reshape(b_, -1),
            jax.lax.stop_gradient(tf["relu_5_1"].reshape(b_, -1)),
            target=1) / b_

    # --- landmark loss (w=0 in prod; va_losses_and_visuals.py:405-428): crop
    #     pred/target to the face box, L1 over frozen MobileFaceNet taps. Boxes come
    #     from the target's 68-keypoint extrema instead of a live RetinaFace pass
    #     (same substitution as the RTNet RoIs — the detector is not a train-time
    #     dependency here) ---
    if (towers.landmark_apply is not None and w.landmarks > 0
            and "target_keypoints" in batch):
        from ..losses.emotion import landmark_loss

        kp = jax.lax.stop_gradient(batch["target_keypoints"][..., :2])
        xy = (kp + 1.0) * 0.5 * (pred.shape[1] - 1)
        boxes = jnp.concatenate([xy.min(axis=1), xy.max(axis=1)], axis=-1)
        lm, _ = landmark_loss(towers.landmark_apply, towers.landmark_params,
                              pred, jax.lax.stop_gradient(target), boxes)
        losses["landmarks"] = w.landmarks * lm

    # --- resnet18_fv_mix (prod w=35): cosine-match frozen face vectors of the aligned
    #     MIXING crop vs the aligned target crop (va_losses_and_visuals.py:324-355) ---
    if (towers.face_vector_embed is not None and w.resnet18_fv_mix > 0
            and "mixing_img_align" in out):
        # the reference computes this on only the first bs_resnet18_fv_mix batch
        # elements (prod 2; va_losses_and_visuals.py:331-343)
        bs_fv = max(min(cfg.train.bs_resnet18_fv_mix,
                        out["mixing_img_align"].shape[0]), 1)
        m = towers.face_vector_embed(towers.face_vector_params,
                                     out["mixing_img_align"][:bs_fv])
        t = jax.lax.stop_gradient(towers.face_vector_embed(
            towers.face_vector_params, out["target_img_align_orig"][:bs_fv]))
        losses["resnet18_fv_mix"] = g_mix * w.resnet18_fv_mix * cosine_embedding_loss(
            m, t, target=1)

    if w.l1_weight > 0:
        losses["l1"] = w.l1_weight * jnp.mean(jnp.abs(pred - target))

    # --- match_neutral losses (va_losses_and_visuals.py:88-96) ---
    if w.neutral_expr_l1 > 0 and "pred_neutral_expr_vector" in out:
        # pull the neutral face's expression vector to zero
        losses["neutral_expr_l1"] = w.neutral_expr_l1 * jnp.mean(
            jnp.abs(out["pred_neutral_expr_vector"]))
    if (w.vgg19_neutral > 0 and "pred_neutral_img" in out
            and "target_img_full_align" in out
            and towers.vgg19_apply is not None):
        # warmup-only (reference gates on epoch==0 and iteration<200): perceptual
        # match of the neutral decode vs the theta-aligned prediction
        gate = (step_count < 200).astype(pred.dtype) if step_count is not None else 1.0
        losses["vgg19_neutral"] = w.vgg19_neutral * gate * perceptual_loss(
            towers.vgg19_apply, towers.vgg19_params, out["pred_neutral_img"],
            jax.lax.stop_gradient(out["target_img_full_align"]), num_scales=1)

    # --- volume-rendering RGB supervision (volume_rendering=True; reference
    #     va_losses_and_visuals.py:245-256: L1s at a 64px bilinear resize) ---
    if "pred_tar_img_vol" in out and w.l1_vol_rgb > 0:
        def rs64(img):
            return jax.image.resize(img, (img.shape[0], 64, 64, 3), method="linear")

        vol_rgb = rs64(out["pred_tar_img_vol"])
        if w.targ_vol_loss_scale > 0:
            losses["l1_vol_rgb_tar"] = (w.l1_vol_rgb / 2) * jnp.mean(
                jnp.abs(vol_rgb - jax.lax.stop_gradient(rs64(target))))
        losses["l1_vol_rgb"] = w.l1_vol_rgb * jnp.mean(
            jnp.abs(vol_rgb - rs64(pred)))
        if w.l1_vol_rgb_mix > 0 and "pred_mixing_img_vol" in out:
            losses["l1_vol_rgb_mix"] = w.l1_vol_rgb * jnp.mean(
                jnp.abs(rs64(out["pred_mixing_img_vol"])
                        - rs64(out["pred_mixing_img"])))

    # --- canonical-volume self-supervision (predict_target_canon_vol, va.py:554-566;
    #     loss at va_losses_and_visuals.py:98-141) ---
    if "canon_volume_from_target" in out and w.volumes_l1 > 0:
        # schedule (va_losses_and_visuals.py:99-107): active once
        # epoch >= vol_loss_epoch and the within-epoch iteration > 20, weight
        # ramped by min((epoch - vol_loss_epoch + 1) / vol_loss_grad, 1)
        if step_count is not None:
            ep_len = max(cfg.train.train_epoch_len, 1)
            ep = step_count // ep_len
            g_vol = jnp.logical_and(
                ep >= cfg.train.vol_loss_epoch,
                step_count % ep_len > cfg.train.vol_loss_iter_start,
            ).astype(pred.dtype)
            if cfg.train.vol_loss_grad > 0:
                g_vol = g_vol * jnp.minimum(
                    (ep - cfg.train.vol_loss_epoch + 1.0)
                    / cfg.train.vol_loss_grad, 1.0).astype(pred.dtype)
        else:
            g_vol = 1.0
        losses["volumes_l1"] = g_vol * w.volumes_l1 * jnp.mean(jnp.abs(
            out["canonical_volume"]
            - jax.lax.stop_gradient(out["canon_volume_from_target"])))
    # canonical-volume cosine pull/push (0 in prod; va_losses_and_visuals.py:117-141:
    # per-sample cosine-embedding pull to the detached target-canon volume, push vs
    # the roll-1 pairing; the per-sample loop + /b telescopes to the batch mean)
    if "canon_volume_from_target" in out and (w.volumes_pull > 0
                                              or w.volumes_push > 0):
        b_ = out["canonical_volume"].shape[0]
        cv = out["canonical_volume"].reshape(b_, -1)
        ct = jax.lax.stop_gradient(out["canon_volume_from_target"]).reshape(b_, -1)
        if w.volumes_pull > 0:
            losses["volumes_pull"] = w.volumes_pull * cosine_embedding_loss(
                cv, ct, target=1, margin=0.0)
        if w.volumes_push > 0:
            losses["volumes_push"] = w.volumes_push * cosine_embedding_loss(
                cv, jnp.roll(ct, 1, axis=0), target=-1, margin=0.0)

    # warp-delta regularizer (0 in prod; va_losses_and_visuals.py:430-432 — the
    # reference reads 'target_motion_deltas' which nothing produces; the real
    # generated warp deltas are regularized here)
    if w.warping_reg > 0 and "target_delta_uv" in out:
        from ..losses.extras import warp_reg_loss

        deltas = [out["target_delta_uv"]]
        if "source_delta_xy" in out:
            deltas.append(out["source_delta_xy"])
        losses["warping_reg"] = w.warping_reg * warp_reg_loss(
            deltas, step_count if step_count is not None else jnp.zeros((), jnp.int32))

    # --- expression contrastive family (va_losses_and_visuals.py:457-578; gated on
    #     epoch >= contr_losses_start, :458) ---
    if "pred_cycle_exp" in out:
        t_emb = out["target_pose_embed"]
        p_cyc = out["pred_cycle_exp"]
        m_cyc = out.get("mixing_cycle_exp")
        mls = cfg.train.mix_losses_start
        ep_len = max(cfg.train.train_epoch_len, 1)
        if step_count is not None:
            ep_ = step_count // ep_len
            # mixing-term weight schedules (va_losses_and_visuals.py:462-463
            # pull 0.5 -> 2 -> 3 across mix_losses_start; :489 push 0.5 -> 3)
            mw_pull = jnp.where(ep_ <= mls, 0.5,
                                jnp.where(ep_ <= 2 * mls, 2.0, 3.0))
            mw_push = jnp.where(ep_ <= mls, 0.5, 3.0)
        else:
            mw_pull = mw_push = 0.5
        losses["pull_exp"] = g_contr * w.pull_exp * (
            pull_loss(p_cyc, t_emb)
            + (mw_pull * pull_loss(m_cyc, t_emb) if m_cyc is not None else 0.0))
        # push negatives list (va_losses_and_visuals.py:480-497): the reference
        # appends the CURRENT target embed to the ring before the loop, so the
        # entries are the last (num_b_negs - 1) DETACHED previous targets plus the
        # current one (with grad); every push/stm term is then divided by
        # num_b_negs (:518). The ring here holds the previous targets only.
        k = max(prev_targets.shape[0], 1)
        negs_list = [jax.lax.stop_gradient(prev_targets[i]) for i in range(1, k)]
        negs_list.append(t_emb)
        push = jnp.zeros((), jnp.result_type(p_cyc))
        for negs in negs_list:
            term = push_loss(p_cyc, negs)
            if m_cyc is not None:
                term = term + mw_push * push_loss(m_cyc, negs)
            push = push + term
        losses["push_exp"] = g_contr * w.push_exp * push / k
        # stm gates on epoch >= mix_losses_start (:499), NOT the contrastive gate.
        # Prod separate_stm=True (:500-506): on FEED-spliced iterations
        # (within-epoch i % (sec_dataset_every//2) == 0, same parity the splice
        # cadence uses — train.py:245-249) batch element 0 (the spliced
        # extreme-emotion sample) is pushed at fixed weight 1.5 and the rest at
        # weights.stm; other iterations use plain stm over the whole batch.
        src_e = out["source_pose_embed"]
        if (cfg.train.separate_stm and src_e.shape[0] > 1
                and step_count is not None):
            per = stm_loss_elems(src_e, t_emb)
            it = step_count % ep_len
            sep = (it % max(cfg.train.sec_dataset_every // 2, 1)) == 0
            stm_val = jnp.where(sep,
                                w.stm * jnp.mean(per[1:])
                                + 1.5 * jnp.mean(per[:1]),
                                w.stm * jnp.mean(per))
        else:
            stm_val = w.stm * stm_loss(src_e, t_emb)
        losses["stm"] = g_mix * w.push_exp * stm_val / k
        # Barlow twins (0 in prod; va_losses_and_visuals.py:436-455, epoch-gated on
        # contr_losses_start): batch-standardized cross-correlation of each cycle
        # expression with the target expression. The reference all_reduces the
        # correlation matrix across ranks; under GSPMD data parallelism the batch
        # statistics and the (D,B)x(B,D) contraction already run over the GLOBAL
        # sharded batch, so no explicit collective is needed (same argument as
        # TrainBatchNorm in ops/blocks.py).
        if w.barlow > 0:
            from ..losses.expression import barlow_twins_loss

            bl = barlow_twins_loss(p_cyc, t_emb)
            if m_cyc is not None:
                bl = bl + barlow_twins_loss(m_cyc, t_emb)
            losses["barlow"] = g_contr * w.barlow * bl
        if w.contrastive_exp > 0:
            losses["contrastive_exp_pred"] = (
                g_contr * w.contrastive_exp * contrastive_exp_loss(
                    p_cyc, t_emb, out["source_pose_embed"]))
            if m_cyc is not None:
                losses["contrastive_exp_mix"] = (
                    g_contr * w.contrastive_exp * contrastive_exp_loss(
                        m_cyc, t_emb, out["source_pose_embed"]))

    # --- contrastive_idt (0 in prod; va_losses_and_visuals.py:581-622 with
    #     reconstructed idt_embed_face_* inputs): InfoNCE (t=0.2, m=0.2) of the
    #     identity embeds of target/pred/mix aligned crops vs the rolled source
    #     identity; the mix term waits epoch>=1 with weight 0.5 -> 2 after
    #     mix_losses_start ---
    if w.contrastive_idt > 0 and "idt_embed_face" in out and pred.shape[0] > 1:
        from ..losses.expression import contrastive_loss, cosine_sim

        b_ = pred.shape[0]
        srcv = out["idt_embed_face"].reshape(b_, -1)

        def _idt_nce(v):
            v = v.reshape(b_, -1)
            pos = cosine_sim(v, srcv)
            negs = jnp.stack([cosine_sim(v, jnp.roll(srcv, i, axis=0))
                              for i in range(1, b_)])
            return contrastive_loss(pos, negs, t=0.2, m=0.2)

        losses["contrastive_idt_tar"] = w.contrastive_idt * _idt_nce(
            out["idt_embed_face_target"])
        losses["contrastive_idt_pred"] = w.contrastive_idt * _idt_nce(
            out["idt_embed_face_pred"])
        if "idt_embed_face_mix" in out:
            if step_count is not None:
                ep_ = step_count // max(cfg.train.train_epoch_len, 1)
                mix_w = jnp.where(ep_ <= cfg.train.mix_losses_start, 0.5, 2.0)
                gate1 = (ep_ >= 1).astype(pred.dtype)
            else:
                mix_w, gate1 = 2.0, 1.0
            losses["contrastive_idt_mix"] = (
                gate1 * mix_w * w.contrastive_idt
                * _idt_nce(out["idt_embed_face_mix"]))

    # --- face-part L1s (eyes/mouth/ears, weight 500 each) ---
    # The reference runs its parser live on the target each step, sums SOFT class
    # probabilities into per-sample part masks, and ACCUMULATES one full-batch-mean
    # L1 per sample with that sample's mask broadcast over the whole batch
    # (va_losses_and_visuals.py:183-243: `losses['l1_eyes'] += w * l1(pred*mask_i,
    # target*mask_i)`). For nonnegative masks that sum telescopes exactly to
    # `w * mean(|pred - target| * sum_i mask_i)` — implemented vectorized here, so
    # the magnitude matches the reference at any batch size. (The reference's ears
    # branch masks its i==0 term with mouth_mask — a plain bug; ears use ears masks
    # here.) Masks may also arrive precomputed in the batch (input-pipeline option).
    if w.eyes_l1 > 0 or w.mouth_l1 > 0 or w.ears_l1 > 0:
        part_masks: Dict[str, jax.Array] = {}
        if towers.face_parsing_apply is not None:
            logits = jax.lax.stop_gradient(towers.face_parsing_apply(
                towers.face_parsing_params, batch["target_img"]))
            part_masks = soft_part_masks(logits)
        else:
            for part in ("eyes", "mouth", "ears"):
                if f"{part}_mask" in batch:
                    part_masks[part] = jax.lax.stop_gradient(batch[f"{part}_mask"])
        diff = jnp.abs(pred - target)
        for part, weight in (("eyes", w.eyes_l1), ("mouth", w.mouth_l1),
                             ("ears", w.ears_l1)):
            if part in part_masks and weight > 0:
                m_sum = jnp.sum(part_masks[part].astype(pred.dtype), axis=0,
                                keepdims=True)
                losses[f"{part}_l1"] = g_parts * weight * jnp.mean(diff * m_sum)

    total = jnp.zeros(())
    for v in losses.values():
        total = total + v
    return total, losses


def make_train_step(
    cfg: ExperimentConfig,
    gen_apply: Callable,      # (variables, batch, rngs, prev_targets-aware) -> out dict
    dis_apply_raw: Callable,  # (variables, img) -> (scores, features)
    towers: LossTowers,
    dis2_apply_raw: Optional[Callable] = None,  # second D (use_mix_dis)
    sg_apply_raw: Optional[Callable] = None,    # StyleGAN2 D: img in [-1,1] -> score
):
    """Returns train_step(state, batch, rng) -> (state, metrics). Jit/pjit-ready."""
    gen_opt = make_optimizer(cfg.gen_opt)
    dis_opt = make_optimizer(cfg.dis_opt)

    def dis_apply(params_and_sn, img):
        params, sn = params_and_sn
        return dis_apply_raw({"params": params, "sn_state": sn}, img)

    if cfg.train.remat_towers:
        towers = remat_towers(towers)
    fns_only = towers._replace(**{f: None for f in TOWER_PARAM_FIELDS})

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array,
                   tower_params: Optional[Dict[str, Any]] = None):
        """tower_params: optional frozen-tower param pytree (tower_params_pytree).
        Passing it keeps the hundreds of MB of frozen weights OUT of the compiled
        program (they arrive as device buffers); omitting it falls back to closure
        constants (fine for tiny test towers)."""
        metrics = {}
        use_dis2 = dis2_apply_raw is not None and state.dis2_params is not None
        use_sg = sg_apply_raw is not None and state.sg_params is not None
        if tower_params is None:
            run_towers = towers
        else:
            run_towers = fns_only._replace(
                **{f: tower_params[f] for f in TOWER_PARAM_FIELDS
                   if tower_params.get(f) is not None})

        # AdaptiveConv annealing (va_arguments.py:277-280): alpha ramps 0 -> 1 over
        # max_iter as a traced function of the step — one compiled program, no recompile
        gen_aux = tower_params
        if cfg.train.gen_adaptive_use_annealing \
                and cfg.model.warp_generator.use_adaconv:
            from ..ops.adaptive import annealing_alpha
            gen_aux = dict(tower_params or {})
            gen_aux["conv_alpha"] = annealing_alpha(
                state.step, cfg.train.gen_adaptive_annealing_type,
                cfg.train.gen_adaptive_annealing_max_iter)
        if state.thetas_pool is not None:
            gen_aux = dict(gen_aux or {})
            gen_aux["thetas_pool"] = state.thetas_pool
            gen_aux["thetas_pool_count"] = state.thetas_pool_count
        if cfg.model.detach_lat_vol > 0:
            gen_aux = dict(gen_aux or {})
            gen_aux["step"] = state.step

        # ---------------- generator pass ----------------
        def gen_loss_fn(gen_params):
            out, new_sn = gen_apply(
                {"params": gen_params, "sn_state": state.gen_sn_state}, batch, rng,
                aux_params=gen_aux)
            loss, losses = gen_losses(
                cfg, out, batch,
                lambda p, img: dis_apply((p, state.dis_sn_state), img),
                state.dis_params, run_towers, state.prev_targets,
                dis2_apply=(lambda p, img: dis2_apply_raw(
                    {"params": p, "sn_state": state.dis2_sn_state}, img))
                if use_dis2 else None,
                dis2_params=state.dis2_params,
                sg_apply=(lambda p, img: sg_apply_raw({"params": p}, img))
                if use_sg else None,
                sg_params=state.sg_params,
                step_count=state.step)
            return loss, (losses, out, new_sn)

        (gen_loss, (gen_losses_dict, out, new_gen_sn)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gen_updates, gen_opt_state = gen_opt.update(
            gen_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)
        if cfg.train.freeze_proc_nw > 0:
            # periodic freeze of the 3D U-Net (va.py:517-524 toggles
            # requires_grad): on frozen iterations its params and Adam moments are
            # held at their previous values (torch's None-grad skip — no update,
            # no weight decay, no moment decay). The global Adam `count` still
            # increments, a bias-correction detail torch's per-param steps avoid.
            frozen = (state.step % cfg.train.freeze_proc_nw) == 0

            def _hold(old_tree, new_tree):
                def f(path, o, n):
                    in_sub = any(
                        getattr(p, "key", getattr(p, "name", None))
                        == "volume_process_nw" for p in path)
                    return jnp.where(frozen, o, n) if in_sub else n
                return jax.tree_util.tree_map_with_path(f, old_tree, new_tree)

            gen_params = _hold(state.gen_params, gen_params)
            gen_opt_state = _hold(state.gen_opt_state, gen_opt_state)

        # ---------------- discriminator pass ----------------
        # D sees the generator's RAW output vs the composited target (reference
        # va.py:1003-1015): compositing the fake would hide G's background from D.
        pred_detached = jax.lax.stop_gradient(out["pred_target_img"])
        target = composite_target(
            cfg, batch["target_img"],
            out.get("refined_target_mask", batch.get("target_mask")))

        def dis_loss_fn(dis_params):
            real_scores, _ = dis_apply((dis_params, state.dis_sn_state), target)
            fake_scores, _ = dis_apply((dis_params, state.dis_sn_state), pred_detached)
            return adversarial_loss_dis(real_scores, fake_scores)

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        dis_updates, dis_opt_state = dis_opt.update(
            dis_grads, state.dis_opt_state, state.dis_params)
        dis_params = optax.apply_updates(state.dis_params, dis_updates)

        # ---------------- second-discriminator pass (use_mix_dis) ----------------
        # D2 separates the generator's own outputs: pred_target (real) vs
        # pred_mixing (fake), both detached (reference va.py:1005-1008).
        dis2_params, dis2_opt_state = state.dis2_params, state.dis2_opt_state
        if use_dis2 and "pred_mixing_img" in out:
            mix_detached = jax.lax.stop_gradient(out["pred_mixing_img"])

            def dis2_loss_fn(p):
                real_s, _ = dis2_apply_raw(
                    {"params": p, "sn_state": state.dis2_sn_state}, pred_detached)
                fake_s, _ = dis2_apply_raw(
                    {"params": p, "sn_state": state.dis2_sn_state}, mix_detached)
                return adversarial_loss_dis(real_s, fake_s)

            dis2_loss, dis2_grads = jax.value_and_grad(dis2_loss_fn)(state.dis2_params)
            d2_updates, dis2_opt_state = dis_opt.update(
                dis2_grads, state.dis2_opt_state, state.dis2_params)
            dis2_params = optax.apply_updates(state.dis2_params, d2_updates)
            metrics["dis/adversarial_mix"] = dis2_loss

        # ---------------- StyleGAN2-D pass (use_stylegan_d) ----------------
        # d_logistic on [-1,1] images + mixing softplus + LAZY R1 every d_reg_every
        # steps, scaled by d_reg_every*r1 (reference va.py:1020-1046).
        sg_params, sg_opt_state = state.sg_params, state.sg_opt_state
        if use_sg:
            from ..losses.gan import d_logistic_loss, r1_penalty

            def sg_loss_fn(p):
                fake_p = sg_apply_raw({"params": p}, pred_detached * 2.0 - 1.0)
                real_p = sg_apply_raw({"params": p}, target * 2.0 - 1.0)
                loss = d_logistic_loss(real_p, fake_p)
                if "pred_mixing_img" in out:
                    mix_p = sg_apply_raw(
                        {"params": p},
                        jax.lax.stop_gradient(out["pred_mixing_img"]) * 2.0 - 1.0)
                    loss = loss + jnp.mean(jax.nn.softplus(mix_p))
                # LAZY R1: the double-backprop penalty runs only every d_reg_every
                # steps (reference va.py:1023-1046); lax.cond keeps the expensive
                # branch out of the off-step execution path entirely.
                r1 = jax.lax.cond(
                    state.step % cfg.train.d_reg_every == 0,
                    lambda q: r1_penalty(
                        lambda qq, img: sg_apply_raw({"params": qq},
                                                     img * 2.0 - 1.0),
                        q, target),
                    lambda q: jnp.zeros((), target.dtype),
                    p)
                loss = loss + cfg.train.d_reg_every * cfg.weights.r1 * r1
                return loss

            sg_loss, sg_grads = jax.value_and_grad(sg_loss_fn)(state.sg_params)
            sgu, sg_opt_state = make_stylegan_optimizer(cfg.train, cfg.dis_opt).update(
                sg_grads, state.sg_opt_state, state.sg_params)
            sg_params = optax.apply_updates(state.sg_params, sgu)
            metrics["dis/style"] = sg_loss

        # ---------------- negatives queue ring update ----------------
        prev = state.prev_targets
        if prev is not None and "target_pose_embed" in out:
            new_neg = jax.lax.stop_gradient(out["target_pose_embed"])[None]
            prev = jnp.concatenate([prev[1:], new_neg.astype(prev.dtype)], axis=0)

        metrics.update({f"gen/{k}": v for k, v in gen_losses_dict.items()})
        metrics["gen/total"] = gen_loss
        metrics["dis/adversarial"] = dis_loss

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            gen_sn_state=new_gen_sn,
            gen_opt_state=gen_opt_state,
            dis_params=dis_params,
            dis_opt_state=dis_opt_state,
            prev_targets=prev,
            thetas_pool=out.get("thetas_pool", state.thetas_pool),
            thetas_pool_count=out.get("thetas_pool_count",
                                      state.thetas_pool_count),
            dis2_params=dis2_params,
            dis2_opt_state=dis2_opt_state,
            sg_params=sg_params,
            sg_opt_state=sg_opt_state,
        )
        if state.ema_params is not None:
            from ..utils.ema import ema_update
            new_state = new_state.replace(
                ema_params=ema_update(state.ema_params, gen_params,
                                      cfg.train.ema_decay))
        return new_state, metrics

    return train_step
