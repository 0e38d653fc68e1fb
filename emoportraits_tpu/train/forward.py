"""Training-time generator forward: wires the VolumetricAvatar module, the frozen
head-pose regressor, and the mixing/cycle/self-supervision branches into a single
`gen_apply(variables, batch, rng) -> (out, new_sn_state)` used by the train step.

Reference flow (va.py:287-765 G_forward + :899-1020 Model.forward 'gen' pass):
  * thetas for source/target from the frozen HeadPoseRegressor (:375-378, no-grad);
  * mixing theta by polar decomposition of source/target poses (non_specific.py:128);
  * cycle expressions: the frozen regressor re-runs on the GENERATED images, whose
    aligned crops are re-embedded (va.py:700-765) -> pred_cycle_exp / mixing_cycle_exp;
  * canonical volume re-derived from the target frame (no-grad) for volumes_l1
    (:554-566) using theta_st = (source scale, target rotation, target translation).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from ..geometry.transforms import get_mixing_theta, get_transform_matrix, inverse_theta_4x4
from ..models.stage1 import VolumetricAvatar


def make_gen_apply(
    cfg: ExperimentConfig,
    model: VolumetricAvatar,
    head_pose_apply: Callable,   # (params, img, return_srt) -> theta / (theta, s, r, t)
    head_pose_params: Any,
):
    train_cfg = cfg.train

    def gen_apply(variables: Dict, batch: Dict[str, jax.Array], rng: jax.Array):
        src, tgt = batch["source_img"], batch["target_img"]
        src_mask = batch.get("source_mask", jnp.ones_like(src[..., :1]))
        tgt_mask = batch.get("target_mask", jnp.ones_like(tgt[..., :1]))

        # Frozen head pose (reference va.py:375-378, under no_grad).
        hp = lambda img: head_pose_apply(head_pose_params, jax.lax.stop_gradient(img),
                                         return_srt=True)
        src_theta, src_scale, src_rot, src_tr = jax.tree.map(jax.lax.stop_gradient,
                                                             hp(src))
        tgt_theta, tgt_scale, tgt_rot, tgt_tr = jax.tree.map(jax.lax.stop_gradient,
                                                             hp(tgt))

        mixing_theta = None
        if train_cfg.pred_mixing:
            # stop_gradient: the reference computes this on host in numpy/scipy with no
            # gradient (non_specific.py:128-190); it also shields the SVD VJP, which is
            # NaN for degenerate singular values (e.g. identity poses).
            mixing_theta = jax.lax.stop_gradient(
                get_mixing_theta(src_theta[:, :3], tgt_theta[:, :3]))

        out, muts = model.apply(
            variables, src, src_mask, tgt, src_theta, tgt_theta,
            mixing_theta=mixing_theta, deterministic=False,
            method=model.generate,
            match_neutral=train_cfg.match_neutral,
            # elastic-warped expression-net inputs (reference feeds
            # source/target_warp_aug to the embedder in training,
            # expression_embedder.py:163-169, so it can't cheat on texture cues)
            source_expr_img=batch.get("source_warp_aug"),
            target_expr_img=batch.get("target_warp_aug"),
            mutable=["sn_state"], rngs={"dropout": rng},
        )

        frozen = {"params": variables["params"],
                  "sn_state": muts.get("sn_state", variables.get("sn_state", {}))}

        # ---- cycle expression re-embeds (reference va.py:700-765) ----
        if train_cfg.pred_mixing:
            pred_img = out["pred_target_img"]
            pred_theta = jax.lax.stop_gradient(
                head_pose_apply(head_pose_params, jax.lax.stop_gradient(pred_img),
                                return_srt=False))
            out["pred_cycle_exp"] = model.apply(
                frozen, pred_img, pred_theta, method=model.expression_vector)
            mix_img = out["pred_mixing_img"]
            mix_theta_pred = jax.lax.stop_gradient(
                head_pose_apply(head_pose_params, jax.lax.stop_gradient(mix_img),
                                return_srt=False))
            out["mixing_cycle_exp"] = model.apply(
                frozen, mix_img, mix_theta_pred, method=model.expression_vector)

        # ---- canonical volume from target (no-grad; volumes_l1) ----
        if train_cfg.predict_target_canon_vol:
            theta_st = get_transform_matrix(src_scale, tgt_rot, tgt_tr)
            inv_theta_st = inverse_theta_4x4(theta_st)
            canon_t = model.apply(
                frozen, tgt, tgt_mask, out["target_pose_embed"], out["idt_embed"],
                inv_theta_st, method=model.canonical_from_target)
            out["canon_volume_from_target"] = jax.lax.stop_gradient(canon_t)

        out["source_theta"] = src_theta
        out["target_theta"] = tgt_theta
        return out, muts.get("sn_state", {})

    return gen_apply
