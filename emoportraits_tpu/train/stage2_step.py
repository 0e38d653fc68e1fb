"""Stage-2 GAN training step: refine frozen stage-1 outputs with the enhancer.

Reference: models/stage_2/base/volumetric_avatar_two.py — same Trainer-style
multi-optimizer loop (:787 forward, :1096 configure_optimizers) with its own
MultiScaleDiscriminator (+optional second D / StyleGAN2 D, :495-540), adversarial +
feature-matching + perceptual losses against the 512px ground truth (:700-780).

Stage-1 runs frozen (stop_gradient) to produce `pred_target_img`; the enhancer is the
only trainable generator here.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

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


@struct.dataclass
class Stage2TrainState:
    step: jax.Array
    enh_params: Any
    enh_sn_state: Any
    enh_opt_state: optax.OptState
    dis_params: Any
    dis_sn_state: Any
    dis_opt_state: optax.OptState

    @classmethod
    def create(cls, cfg: ExperimentConfig, enh_variables, dis_variables):
        enh_opt = make_optimizer(cfg.gen_opt)
        dis_opt = make_optimizer(cfg.dis_opt)
        return cls(
            step=jnp.zeros((), jnp.int32),
            enh_params=enh_variables["params"],
            enh_sn_state=enh_variables.get("sn_state", {}),
            enh_opt_state=enh_opt.init(enh_variables["params"]),
            dis_params=dis_variables["params"],
            dis_sn_state=dis_variables.get("sn_state", {}),
            dis_opt_state=dis_opt.init(dis_variables["params"]),
        )


def make_stage2_train_step(
    cfg: ExperimentConfig,
    enhancer_apply: Callable,   # (variables, pred, mask) -> (refined, mutated vars)
    dis_apply: Callable,        # (variables, img) -> (scores, feats)
    vgg19_apply: Callable = None,
    vgg19_params: Any = None,
):
    enh_opt = make_optimizer(cfg.gen_opt)
    dis_opt = make_optimizer(cfg.dis_opt)
    w = cfg.weights

    def train_step(state: Stage2TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        """batch: pred_target_img (frozen stage-1 output), target_img_ffhq,
        face_mask."""
        pred_s1 = jax.lax.stop_gradient(batch["pred_target_img"])
        target = batch["target_img_ffhq"]
        mask = batch.get("face_mask", jnp.ones_like(pred_s1[..., :1]))

        def enh_loss_fn(params):
            refined, enh_muts = enhancer_apply(
                {"params": params, "sn_state": state.enh_sn_state}, pred_s1, mask)
            dis_vars = {"params": state.dis_params, "sn_state": state.dis_sn_state}
            real_scores, real_feats = dis_apply(dis_vars, target)
            fake_scores, fake_feats = dis_apply(dis_vars, refined)
            losses = {
                "adv": w.adversarial * adversarial_loss_gen(fake_scores),
                "fm": w.feature_matching * feature_matching_loss(
                    jax.tree.map(jax.lax.stop_gradient, real_feats), fake_feats),
                "l1": 10.0 * jnp.mean(jnp.abs(refined - target)),
            }
            if vgg19_apply is not None and w.vgg19 > 0:
                losses["vgg19"] = w.vgg19 * perceptual_loss(
                    vgg19_apply, vgg19_params, refined, target, num_scales=2)
            total = sum(losses.values())
            return total, (losses, refined, enh_muts)

        (enh_loss, (losses, refined, enh_muts)), grads = jax.value_and_grad(
            enh_loss_fn, has_aux=True)(state.enh_params)
        updates, enh_opt_state = enh_opt.update(grads, state.enh_opt_state,
                                                state.enh_params)
        enh_params = optax.apply_updates(state.enh_params, updates)

        refined_d = jax.lax.stop_gradient(refined)

        def dis_loss_fn(dis_params):
            dis_vars = {"params": dis_params, "sn_state": state.dis_sn_state}
            real_scores, _ = dis_apply(dis_vars, target)
            fake_scores, _ = dis_apply(dis_vars, refined_d)
            return adversarial_loss_dis(real_scores, fake_scores)

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        d_updates, dis_opt_state = dis_opt.update(dis_grads, state.dis_opt_state,
                                                  state.dis_params)
        dis_params = optax.apply_updates(state.dis_params, d_updates)

        metrics = {f"s2/{k}": v for k, v in losses.items()}
        metrics["s2/total"] = enh_loss
        metrics["s2/dis"] = dis_loss
        new_state = state.replace(
            step=state.step + 1, enh_params=enh_params,
            enh_sn_state=enh_muts.get("sn_state", state.enh_sn_state),
            enh_opt_state=enh_opt_state, dis_params=dis_params,
            dis_opt_state=dis_opt_state)
        return new_state, metrics

    return train_step
