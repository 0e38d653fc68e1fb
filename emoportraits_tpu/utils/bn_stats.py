"""BatchNorm standing ("standing/accumulated") statistics recalculation.

Reference `utils/stats_calc.py`: before eval, BN modules get momentum=1.0 plus a
forward hook that accumulates `running_mean`/`running_var` over N calibration
batches and finally replaces the running stats with the plain average — i.e.
running stats become the MEAN of per-batch statistics instead of a momentum EMA
(the "standing statistics" trick).

Functional TPU version: our `TrainBatchNorm` (ops/blocks.py) EMA-updates
`running_mean`/`running_var` inside the mutable `sn_state` collection with
torch semantics `new = (1-m)*old + m*batch`. Running one training-mode forward
from the SAME base variables therefore lets us recover the pure batch statistic
exactly: `batch = (new - (1-m)*old) / m`. Accumulate that over the calibration
batches and write the average back — no module surgery, no hooks, and the
spectral-norm `u`/`v` leaves riding in the same collection are left untouched.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax


_BN_KEYS = ("running_mean", "running_var")


def _is_bn_leaf(path) -> bool:
    last = path[-1]
    name = getattr(last, "key", getattr(last, "name", None))
    return name in _BN_KEYS


def recalculate_bn_stats(run_batch: Callable[[dict, object], dict],
                         variables: dict, batches: Iterable,
                         momentum: float = 0.1) -> dict:
    """Replace every BN running_mean/running_var in `variables['sn_state']` with
    the average of per-batch statistics over `batches`.

    run_batch(variables, batch) -> the mutated `sn_state` collection of ONE
    training-mode forward (e.g. `model.apply(v, x, mutable=['sn_state'])[1]
    ['sn_state']`). `momentum` must match the modules' EMA momentum.
    Returns a new `variables` dict; input is not mutated.
    """
    if "sn_state" not in variables:
        return variables
    base = variables["sn_state"]
    acc = None
    n = 0
    for batch in batches:
        new_sn = run_batch(variables, batch)
        stats = jax.tree_util.tree_map_with_path(
            lambda p, new, old: ((new - (1.0 - momentum) * old) / momentum
                                 if _is_bn_leaf(p) else old),
            new_sn, base)
        acc = stats if acc is None else jax.tree.map(
            lambda a, s: a + s, acc, stats)
        n += 1
    if n == 0:
        return variables
    standing = jax.tree_util.tree_map_with_path(
        lambda p, a, old: a / n if _is_bn_leaf(p) else old, acc, base)
    # numerical floor: averaged variances must stay positive
    standing = jax.tree_util.tree_map_with_path(
        lambda p, x: (jax.numpy.maximum(x, 0.0)
                      if getattr(p[-1], "key", None) == "running_var" else x),
        standing)
    return {**variables, "sn_state": standing}


def has_batch_norm(variables: dict) -> bool:
    """True when any running_mean/var leaf exists (i.e. the net uses BN)."""
    if "sn_state" not in variables:
        return False
    found = []
    jax.tree_util.tree_map_with_path(
        lambda p, x: found.append(True) if _is_bn_leaf(p) else None,
        variables["sn_state"])
    return bool(found)


__all__ = ["recalculate_bn_stats", "has_batch_norm"]
