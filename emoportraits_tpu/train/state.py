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


def _scale_by_adam_nu_bf16(b1: float, b2: float, eps: float,
                           mu_dtype=None) -> optax.GradientTransformation:
    """optax.scale_by_adam with the SECOND moment persisted in bf16.

    optax only exposes `mu_dtype`; a naive wrapper that tree-casts nu
    bf16 -> f32 before `inner.update` and back after MEASURED WORSE than f32 nu
    on the batch-2 512px step (15.88G vs 15.76G program HBM): the tree-level
    convert materializes a full f32 copy of nu that cannot alias the donated
    bf16 buffer. Here the casts are elementwise INSIDE the moment update, so
    XLA fuses convert -> multiply-add -> rsqrt into one loop and the only
    full-size buffers are the bf16 nu itself (aliasing the donated input) and
    the unavoidable update. Update math follows optax exactly: moments and the
    step are computed in f32 from the f32 accumulators, storage is cast last
    — the one deviation from f32 Adam is the ~0.4%-relative rounding of the
    PERSISTED nu between steps."""
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None

    def _store_dtype(p, want):
        if want is not None and jnp.issubdtype(p.dtype, jnp.floating):
            return want
        return p.dtype

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=_store_dtype(p, mu_dtype)), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=_store_dtype(p, jnp.bfloat16)),
            params)
        return optax.ScaleByAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** cf
        bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** cf

        def upd(g, m, n):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            u = (m32 / bc1) / (jnp.sqrt(n32 / bc2) + eps)
            return u.astype(g.dtype), m32.astype(m.dtype), n32.astype(n.dtype)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = jax.tree_util.tree_leaves(state.mu)
        flat_n = jax.tree_util.tree_leaves(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_g, flat_m, flat_n)]
        updates = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr,
        decay_steps=cfg.shd_max_iters,
        alpha=cfg.shd_lr_min / cfg.lr,
    )
    mu_dtype = jnp.bfloat16 if cfg.mu_bf16 else None
    if cfg.opt_type not in ("adamw", "adam"):
        raise ValueError(cfg.opt_type)
    if cfg.nu_bf16:
        # mirror optax.adam(w)'s own chain so the opt-state pytree structure
        # (ScaleByAdamState, [EmptyState], ScaleByScheduleState) matches the
        # f32 path for checkpointing
        parts = [_scale_by_adam_nu_bf16(cfg.beta1, cfg.beta2, cfg.eps, mu_dtype)]
        if cfg.opt_type == "adamw":
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*parts)
    if cfg.opt_type == "adamw":
        return optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                           weight_decay=cfg.weight_decay, mu_dtype=mu_dtype)
    return optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                      mu_dtype=mu_dtype)


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
