"""Checkpoint round-trip with the OPTIONAL state populated (dis2, StyleGAN-D, EMA):
orbax StandardSave/Restore must reproduce every leaf, not just the always-on core."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.train.checkpoint import CheckpointManager
from emoportraits_tpu.train.state import TrainState


def test_roundtrip_with_dis2_sg_ema(tmp_path):
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train,
                                                             ema_decay=0.99))
    k = jax.random.PRNGKey(0)
    mk = lambda *shape: jax.random.normal(jax.random.fold_in(k, sum(shape)), shape)
    gen_vars = {"params": {"w": mk(4, 4)}, "sn_state": {"u": mk(4)}}
    dis_vars = {"params": {"w": mk(3, 3)}, "sn_state": {}}
    dis2_vars = {"params": {"w": mk(5, 5)}, "sn_state": {"u": mk(5)}}
    sg_vars = {"params": {"w": mk(6, 6)}}
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=2,
                              dis2_variables=dis2_vars, sg_variables=sg_vars)
    assert state.dis2_params is not None and state.sg_params is not None
    assert state.ema_params is not None
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    ckpt = CheckpointManager(str(tmp_path / "ck"), cfg, max_to_keep=1)
    ckpt.save(7, state)
    ckpt.wait()
    like = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(like, step=7)
    flat_a, _ = jax.tree_util.tree_flatten(state)
    flat_b, _ = jax.tree_util.tree_flatten(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
