"""FSDP-style parameter sharding: the sharded step must (a) actually shard large
leaves over the data axis, (b) reproduce the replicated step's metrics — GSPMD
all-gather/reduce-scatter is a layout change, not a math change."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.parallel.mesh import (
    fsdp_state_sharding,
    make_data_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
    shard_state_fsdp,
)
from emoportraits_tpu.train.forward import make_gen_apply
from emoportraits_tpu.train.state import TrainState
from emoportraits_tpu.train.step import make_train_step, tower_params_pytree
from emoportraits_tpu.train.towers import build_loss_towers

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick loop


@pytest.fixture(scope="module")
def pieces():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    model = VolumetricAvatar(cfg.model)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    b, s = 8, cfg.train.image_size
    rng = np.random.default_rng(0)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    dis_vars = dis.init(key, batch["target_img"])
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting)
    state = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = make_train_step(cfg, gen_apply, lambda v, img: dis.apply(v, img), towers)
    tp = tower_params_pytree(towers, frozen)
    mesh = make_data_mesh(8)
    return cfg, state, step, tp, mesh, batch


def test_fsdp_step_matches_replicated(pieces):
    cfg, state, step, tp, mesh, batch = pieces
    sb = shard_batch(batch, mesh)
    rngk = jax.device_put(
        jax.random.PRNGKey(1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    tp_r = replicate_state(tp, mesh)

    def fresh(s):
        # independent buffers per path: the steps donate their state argument, and
        # device_put may no-op (alias) when shardings already match
        return jax.tree.map(lambda x: jnp.array(x) if hasattr(x, "shape") else x, s)

    repl_step = make_sharded_train_step(step, mesh, with_tower_params=True)
    _, m_repl = repl_step(replicate_state(fresh(state), mesh), sb, rngk, tp_r)

    sharding = fsdp_state_sharding(mesh, state)
    fsdp_step = make_sharded_train_step(step, mesh, with_tower_params=True,
                                        state_sharding=sharding)
    fsdp_state = shard_state_fsdp(fresh(state), mesh)
    # large leaves must actually be sharded, not replicated
    leaves = [x for x in jax.tree.leaves(fsdp_state)
              if hasattr(x, "sharding") and x.size * x.dtype.itemsize >= (1 << 16)]
    assert leaves, "expected large leaves in the tiny state"
    assert any(not x.sharding.is_fully_replicated for x in leaves), \
        "FSDP sharding left every large leaf replicated"

    new_state, m_fsdp = fsdp_step(fsdp_state, sb, rngk, tp_r)
    EXP_KEYS = ("contrastive", "push", "pull", "stm", "total")  # total sums them
    for k in m_repl:
        # resharded reductions reorder float32 sums; spectral-norm sigmas drift a
        # few ulp per layer and COMPOUND multiplicatively through ~30 SN'd convs,
        # so the expression-embedding losses (cosine/InfoNCE on those activations)
        # legitimately move ~1%; image-space losses must stay tight.
        loose = any(t in k for t in EXP_KEYS)
        np.testing.assert_allclose(float(m_fsdp[k]), float(m_repl[k]),
                                   rtol=5e-2 if loose else 2e-3,
                                   atol=5e-3 if loose else 2e-4, err_msg=k)
    # updated params keep their sharding (steady-state training layout)
    out_leaves = [x for x in jax.tree.leaves(new_state.gen_params)
                  if hasattr(x, "sharding") and x.size * x.dtype.itemsize >= (1 << 16)]
    assert any(not x.sharding.is_fully_replicated for x in out_leaves)
