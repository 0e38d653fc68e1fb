"""Device mesh + sharding for data-parallel training over ICI.

Replaces the reference's NCCL DDP stack (torch.distributed.init_process_group +
DDP(find_unused_parameters=True), train.py:66,182-187; DistributedSampler,
voxceleb2hq_pairs.py:654-683) with the single-controller JAX model:

  * a 1-D `data` mesh over all devices (ICI within a slice, DCN across slices);
  * the batch sharded over `data`, parameters/optimizer state replicated;
  * gradient reduction emerges as XLA `psum` collectives from jit-of-mean-loss —
    no hand-written allreduce (SURVEY.md §2.3).

The reference hard-fails above 8 GPUs (train.py:70-71); this mesh scales to any device
count JAX exposes, including multi-host.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a host-side batch onto the mesh's data axis.

    Single-process: a plain sharded device_put. Multi-process: each host passes its
    LOCAL shard (global_batch / process_count rows) and the global array is assembled
    with make_array_from_process_local_data — device_put of per-host arrays against a
    global sharding would silently treat each host's data as the whole batch.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def _leaf_sharding(mesh: Mesh, x, axis: str, min_bytes: int = 1 << 16):
    """FSDP rule for one array: shard the largest axis-divisible dim over `axis`;
    small or indivisible leaves stay replicated."""
    if not hasattr(x, "shape") or x.ndim == 0:
        return replicated(mesh)
    n = mesh.shape[axis]
    itemsize = getattr(getattr(x, "dtype", None), "itemsize", 4)
    if x.size * itemsize < min_bytes:
        return replicated(mesh)
    for d in sorted(range(x.ndim), key=lambda i: x.shape[i], reverse=True):
        if x.shape[d] % n == 0:
            spec = [None] * x.ndim
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def fsdp_state_sharding(mesh: Mesh, state: Any, axis: str = "data") -> Any:
    """Sharding pytree for a TrainState under FSDP-style parameter sharding.

    Every large parameter / optimizer-moment leaf is sharded over the data axis
    (ZeRO-3 semantics): XLA's GSPMD inserts the all-gathers before each use and
    reduce-scatters the gradients from the output shardings — the TPU-native way to
    scale past per-chip HBM without hand-written collectives. The reference has no
    counterpart (its DDP replicates everything and hard-caps at 8 GPUs,
    train.py:66-71,182-187)."""
    return jax.tree.map(lambda x: _leaf_sharding(mesh, x, axis), state)


def shard_state_fsdp(state: Any, mesh: Mesh, axis: str = "data") -> Any:
    sh = fsdp_state_sharding(mesh, state, axis)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), state, sh)


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "data",
                            with_tower_params: bool = False,
                            state_sharding=None):
    """jit the train step with explicit shardings: batch split over `data`, state
    replicated (or FSDP-sharded via `state_sharding=fsdp_state_sharding(...)`).
    AD of the mean loss inserts the cross-device psum automatically.

    with_tower_params: the step takes the frozen-tower param pytree as a 4th,
    replicated argument (step.tower_params_pytree) — keeping the frozen weights out
    of the compiled program instead of inlined as constants."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)
    st = state_sharding if state_sharding is not None else repl

    return jax.jit(
        train_step,
        in_shardings=(st, data, repl, repl) if with_tower_params
        else (st, data, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )
