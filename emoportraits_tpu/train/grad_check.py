"""Per-loss gradient diagnostics (reference --check_grads_of_every_loss role).

The reference's flag only retains the input-image gradient for inspection in a
debugger (train.py:59,407-409,428-431 + flag at :531). The JAX-native version is
strictly stronger: one shared generator forward, then one VJP pullback per loss
term, yielding the global gradient norm each individual loss induces on the
generator parameters — the question the torch flag existed to answer ("which loss
is driving/killing training?") — plus the reference's literal artifact, the
gradient of the total loss w.r.t. ``source_img``.

Cost: the forward is traced once (`jax.vjp`); each requested loss key adds one
backward pass inside the same compiled program. Pass ``keys`` to bound compile
time; default is every loss in the dict.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import ExperimentConfig
from .state import TrainState
from .step import LossTowers, gen_losses


def _global_norm(tree) -> jax.Array:
    leaves = [jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.zeros(())


def make_grad_check(
    cfg: ExperimentConfig,
    gen_apply: Callable,
    dis_apply_raw: Callable,
    towers: LossTowers,
    keys: Optional[Sequence[str]] = None,
):
    """Returns grad_check(state, batch, rng) -> {loss_key: grad_norm, ...,
    "total": ..., "d(total)/d(source_img)": ...}. Jittable; intended for
    offline debugging, not the hot training loop."""

    def dis_apply(params_and_sn, img):
        params, sn = params_and_sn
        return dis_apply_raw({"params": params, "sn_state": sn}, img)

    def grad_check(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array) -> Dict[str, jax.Array]:
        gen_aux = None
        if state.thetas_pool is not None:
            gen_aux = {"thetas_pool": state.thetas_pool,
                       "thetas_pool_count": state.thetas_pool_count}

        def losses_fn(gen_params, source_img):
            b = dict(batch)
            b["source_img"] = source_img
            out, _ = gen_apply(
                {"params": gen_params, "sn_state": state.gen_sn_state}, b, rng,
                aux_params=gen_aux)
            total, losses = gen_losses(
                cfg, out, b,
                lambda p, img: dis_apply((p, state.dis_sn_state), img),
                state.dis_params, towers, state.prev_targets,
                step_count=state.step)
            losses = dict(losses)
            losses["total"] = total
            return losses

        losses, pullback = jax.vjp(losses_fn, state.gen_params,
                                   batch["source_img"])
        wanted = list(keys) if keys is not None else list(losses)
        zeros = {k: jnp.zeros_like(v) for k, v in losses.items()}
        report: Dict[str, jax.Array] = {}
        for k in wanted:
            ct = dict(zeros)
            ct[k] = jnp.ones_like(losses[k])
            g_params, g_src = pullback(ct)
            report[k] = _global_norm(g_params)
            if k == "total":
                # the reference's retained source_img.grad (train.py:407-409)
                report["d(total)/d(source_img)"] = _global_norm(g_src)
        return report

    return grad_check
