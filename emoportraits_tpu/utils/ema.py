"""Exponential moving average of parameter trees.

Reference: utils/weight_avg.py (EMA helper, SURVEY.md §2.7). Pure-functional here:
`ema = ema_update(ema, params, decay)` inside or outside the jitted step.
"""
from __future__ import annotations

import jax


def ema_init(params):
    return jax.tree.map(lambda x: x, params)


def ema_update(ema, params, decay: float = 0.999):
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)
