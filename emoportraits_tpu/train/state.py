"""Training state: generator + discriminator parameter trees, two optax optimizers with
cosine schedules, spectral-norm power-iteration state, and the expression-negatives queue.

Replaces the reference's reflection-based optimizer wiring (suffix scan in
utils/non_specific.py:51-57 feeding Model.configure_optimizers, va.py:1082-1128) with an
explicit, typed state. Scheduler parity: AdamW(lr 2e-4, betas (0.5, 0.999)) with cosine
decay to 1e-6 over 400k iters (va.py:1130-1180; experiments/args.txt).
"""
from __future__ import annotations

from typing import Any, Optional

import chex
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ExperimentConfig, OptimizerConfig


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=cfg.shd_max_iters,
        alpha=cfg.shd_lr_min / cfg.lr,
    )
    if cfg.opt_type == "adamw":
        return optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                           weight_decay=cfg.weight_decay)
    if cfg.opt_type == "adam":
        return optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps)
    raise ValueError(cfg.opt_type)


def make_stylegan_optimizer(train_cfg, dis_opt_cfg: OptimizerConfig
                            ) -> optax.GradientTransformation:
    """StyleGAN-D optimizer (va.py:1119-1126): plain Adam with the lazy-R1
    compensation ratio d_reg_ratio = d_reg_every/(d_reg_every+1) folded into the
    lr and betas — lr = dis_stylegan_lr * ratio, betas = (0, 0.99) ** ratio —
    then cosine-annealed to dis_shd_lr_min like the other opts (va.py:1169-1177;
    torch CosineAnnealingLR anneals from the opt's own initial lr)."""
    ratio = train_cfg.d_reg_every / (train_cfg.d_reg_every + 1)
    lr0 = train_cfg.dis_stylegan_lr * ratio
    schedule = optax.cosine_decay_schedule(
        init_value=lr0,
        decay_steps=dis_opt_cfg.shd_max_iters,
        alpha=dis_opt_cfg.shd_lr_min / lr0,
    )
    return optax.adam(schedule, b1=0.0 ** ratio, b2=0.99 ** ratio,
                      eps=dis_opt_cfg.eps)


@struct.dataclass
class TrainState:
    step: jax.Array
    gen_params: Any
    gen_sn_state: Any          # spectral-norm `u` vectors (mutable collection)
    gen_opt_state: optax.OptState
    dis_params: Any
    dis_sn_state: Any
    dis_opt_state: optax.OptState
    # Expression negatives queue (reference `prev_targets`,
    # va_losses_and_visuals.py:480-487) as a fixed ring buffer (K, B, D).
    prev_targets: Optional[jax.Array] = None
    # Mixing-pose history pool (reference `thetas_pool` host list of the last 50
    # target-theta batches, non_specific.py:137-152; prod random_theta=True samples
    # the mixing pose from it with prob 0.5). Ring buffer (P, B, 3, 4) + fill count.
    thetas_pool: Optional[jax.Array] = None
    thetas_pool_count: Optional[jax.Array] = None
    # EMA of generator params for serving (reference utils/weight_avg.py role);
    # None when cfg.train.ema_decay == 0.
    ema_params: Any = None
    # Second discriminator (use_mix_dis, va.py:238): pred_target (real) vs
    # pred_mixing (fake). Shares the dis optimizer hyperparameters (va.py:1105
    # chains dis+dis2 params into one AdamW — per-parameter, so separate opt
    # state is numerically identical).
    dis2_params: Any = None
    dis2_sn_state: Any = None
    dis2_opt_state: Any = None
    # StyleGAN2 discriminator (use_stylegan_d, va.py:241-247 + 1020-1046).
    sg_params: Any = None
    sg_opt_state: Any = None

    @classmethod
    def create(cls, cfg: ExperimentConfig, gen_variables, dis_variables,
               batch_size: int, dis2_variables=None, sg_variables=None) -> "TrainState":
        gen_opt = make_optimizer(cfg.gen_opt)
        dis_opt = make_optimizer(cfg.dis_opt)
        gen_params = gen_variables["params"]
        dis_params = dis_variables["params"]
        k = max(cfg.train.num_b_negs, 1)
        prev = jnp.zeros((k, batch_size, cfg.model.expression_dim), jnp.float32)
        thetas_pool = thetas_pool_count = None
        if cfg.train.pred_mixing and cfg.train.random_theta:
            thetas_pool = jnp.zeros(
                (max(cfg.train.thetas_pool_size, 1), batch_size, 3, 4), jnp.float32)
            thetas_pool_count = jnp.zeros((), jnp.int32)
        ema = None
        if getattr(cfg.train, "ema_decay", 0.0) > 0.0:
            from ..utils.ema import ema_init
            ema = ema_init(gen_params)
        dis2_params = dis2_sn = dis2_opt_state = None
        if dis2_variables is not None:
            dis2_params = dis2_variables["params"]
            dis2_sn = dis2_variables.get("sn_state", {})
            dis2_opt_state = dis_opt.init(dis2_params)
        sg_params = sg_opt_state = None
        if sg_variables is not None:
            sg_params = sg_variables["params"]
            sg_opt_state = make_stylegan_optimizer(cfg.train, cfg.dis_opt).init(sg_params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_sn_state=gen_variables.get("sn_state", {}),
            gen_opt_state=gen_opt.init(gen_params),
            dis_params=dis_params,
            dis_sn_state=dis_variables.get("sn_state", {}),
            dis_opt_state=dis_opt.init(dis_params),
            prev_targets=prev,
            thetas_pool=thetas_pool,
            thetas_pool_count=thetas_pool_count,
            ema_params=ema,
            dis2_params=dis2_params,
            dis2_sn_state=dis2_sn,
            dis2_opt_state=dis2_opt_state,
            sg_params=sg_params,
            sg_opt_state=sg_opt_state,
        )


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
