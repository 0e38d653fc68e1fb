"""Spatial (sp) sharding: partition image/volume HEIGHT across chips.

The reference's only strategy is replicated data parallelism (SURVEY.md §2.3 —
train.py:66,182-187); there is no tensor/spatial parallelism to port. On TPU the
natural beyond-DP axis for this model is SPATIAL: the drive step is dominated by the
512px decoder, which round-2 profiling measured at 87% of the HBM-bandwidth roofline
(DESIGN.md "up-block commute"). Sharding activation height over `sp` gives each chip
1/n of every conv's bytes, so multi-chip serving latency scales with aggregate HBM
bandwidth; GSPMD inserts the one-row halo exchanges for 3x3 convs over ICI
automatically (collective-permute, not all-gather).

Mechanism: models call `sp_image`/`sp_volume` at their activation boundaries. The
constraints self-activate only when the CALLER traces inside
`jax.sharding.set_mesh(mesh)` with an `sp` axis of size > 1 — under a plain jit (or
the pure data-parallel mesh, which has no `sp` axis) they are identity, so
single-chip serving, tests, and checkpoints are untouched.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

SPATIAL_AXIS = "sp"


def _active_axis() -> Optional[str]:
    """The spatial mesh axis name iff the current trace runs under a mesh that has
    it with size > 1 (jax.sharding.set_mesh context)."""
    am = jax.sharding.get_abstract_mesh()
    if am is None or SPATIAL_AXIS not in am.axis_names:
        return None
    if am.shape[SPATIAL_AXIS] <= 1:
        return None
    return SPATIAL_AXIS


def sp_dim(x: jax.Array, dim: int) -> jax.Array:
    """Constrain dimension `dim` of x to the spatial axis (no-op without a mesh).

    On a 2-D (data x sp) training mesh the constraint must also pin the leading
    batch dim to `data` — a bare P(None, ..., sp) would force the batch dim
    REPLICATED, fighting the propagated batch sharding and triggering involuntary
    full rematerialization in the SPMD partitioner."""
    ax = _active_axis()
    if ax is None:
        return x
    spec = [None] * x.ndim
    spec[dim] = ax
    am = jax.sharding.get_abstract_mesh()
    if dim != 0 and "data" in am.axis_names and am.shape["data"] > 1:
        spec[0] = "data"
    return jax.lax.with_sharding_constraint(x, P(*spec))


def sp_image(x: jax.Array) -> jax.Array:
    """(B, H, W, C) image/feature map: shard H."""
    return sp_dim(x, 1)


def sp_volume(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) latent volume: shard H."""
    return sp_dim(x, 2)


def make_space_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over `sp` for latency-oriented single-stream serving."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


def make_dp_sp_mesh(dp: int, sp: int) -> Mesh:
    """2-D (data x space) mesh: batch over `data`, activation height over `sp`.

    Training use: batch sharded over `data` exactly as the 1-D mesh
    (parallel/mesh.py), while the model-internal sp constraints partition the 512px
    conv activations — the way to scale PER-SAMPLE memory/bandwidth past one chip,
    which replicated DDP (the reference's ceiling) cannot do at all."""
    devices = jax.devices()
    assert len(devices) >= dp * sp, f"need {dp * sp} devices, have {len(devices)}"
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("data", SPATIAL_AXIS))
