"""Weight-init functors for flax param trees.

Reference: utils/weight_init.py:9-52 — a kaiming/xavier init functor applied to the
discriminators (`dis_init_type`/`dis_init_gain`, va.py:234-239). Our Conv/Dense default
to torch's kaiming-uniform(a=sqrt(5)); this reinitializer rewrites an existing tree for
the explicit init types.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def _fan_in_out(shape):
    if len(shape) == 2:
        return shape[0], shape[1]
    rf = 1
    for k in shape[:-2]:
        rf *= k
    return shape[-2] * rf, shape[-1] * rf


def reinit_tree(params: Any, rng: jax.Array, init_type: str = "xavier",
                gain: float = 0.02) -> Any:
    """Reinitialize every `kernel` leaf; biases zeroed. init_type: 'normal' |
    'xavier' | 'kaiming' | 'orthogonal' (reference choices)."""
    leaves, treedef = jax.tree.flatten_with_path(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "bias":
            out.append(jnp.zeros_like(leaf))
            continue
        if name not in ("kernel",) or leaf.ndim < 2:
            out.append(leaf)
            continue
        fan_in, fan_out = _fan_in_out(leaf.shape)
        if init_type == "normal":
            w = jax.random.normal(key, leaf.shape) * gain
        elif init_type == "xavier":
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            w = jax.random.normal(key, leaf.shape) * std
        elif init_type == "kaiming":
            std = math.sqrt(2.0 / fan_in)
            w = jax.random.normal(key, leaf.shape) * std
        elif init_type == "orthogonal":
            flat = jax.random.normal(key, (leaf.shape[-1],
                                           int(leaf.size // leaf.shape[-1])))
            q, _ = jnp.linalg.qr(flat.T if flat.shape[0] > flat.shape[1] else flat)
            q = q.T if flat.shape[0] > flat.shape[1] else q
            w = (gain * q.reshape(leaf.shape[::-1]).T).reshape(leaf.shape) \
                if q.size == leaf.size else leaf
        else:
            raise ValueError(init_type)
        out.append(w.astype(leaf.dtype))
    return jax.tree.unflatten(treedef, out)
