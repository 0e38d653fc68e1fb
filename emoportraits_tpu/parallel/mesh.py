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


def make_sharded_train_step(train_step, mesh: Mesh, axis: str = "data",
                            with_tower_params: bool = False):
    """jit the train step with explicit shardings: batch split over `data`, state
    replicated. AD of the mean loss inserts the cross-device psum automatically.

    with_tower_params: the step takes the frozen-tower param pytree as a 4th,
    replicated argument (step.tower_params_pytree) — keeping the frozen weights out
    of the compiled program instead of inlined as constants."""
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis)

    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl) if with_tower_params
        else (repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
