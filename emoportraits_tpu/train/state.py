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
            sg_opt_state = make_optimizer(cfg.dis_opt).init(sg_params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            gen_sn_state=gen_variables.get("sn_state", {}),
            gen_opt_state=gen_opt.init(gen_params),
            dis_params=dis_params,
            dis_sn_state=dis_variables.get("sn_state", {}),
            dis_opt_state=dis_opt.init(dis_params),
            prev_targets=prev,
            ema_params=ema,
            dis2_params=dis2_params,
            dis2_sn_state=dis2_sn,
            dis2_opt_state=dis2_opt_state,
            sg_params=sg_params,
            sg_opt_state=sg_opt_state,
        )


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
