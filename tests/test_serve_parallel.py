"""Multi-chip serving paths: spatial-parallel (sp) drive, dp x sp training,
and the stage-cascade pipeline.

The reference has no distributed inference at all (notebooks/infer.py is strictly
one GPU) — these tests gate the beyond-reference TPU scale-out story:
GSPMD spatial sharding must be a LAYOUT change (same math), and the cascade
pipeline must reproduce the sequential stage-1 -> stage-2 composition exactly.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.parallel.serve import CascadePipeline, SpatialDriveServer
from emoportraits_tpu.parallel.spatial import make_dp_sp_mesh, make_space_mesh

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the quick loop


@pytest.fixture(scope="module")
def stage1_pieces():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    cfg = tiny_config()
    model = VolumetricAvatar(cfg.model)
    b, s = 1, cfg.train.image_size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32))
    drv = jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32))
    mask = jnp.ones((b, s, s, 1), jnp.float32)
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), src, mask, src,
                                    theta, theta)
    return cfg, model, variables, src, drv, mask, theta


def test_spatial_drive_matches_single_device(stage1_pieces):
    cfg, model, variables, src, drv, mask, theta = stage1_pieces
    state = jax.jit(lambda v, s_, m_, t_: model.apply(
        v, s_, m_, t_, method=model.encode_source))(variables, src, mask, theta)
    ref = jax.jit(lambda v, st, d, t: model.apply(
        v, st, d, t, method=model.drive)[0])(variables, state, drv, theta)

    srv = SpatialDriveServer(cfg, variables, mesh=make_space_mesh(8))
    srv.set_source(src, mask, theta)
    out = srv.drive(drv, theta)

    # the cached canonical volume must actually live sharded across the mesh
    vol_spec = srv._state.canonical_volume.sharding.spec
    assert "sp" in jax.tree.leaves(tuple(vol_spec)), vol_spec
    assert not out.sharding.is_fully_replicated
    # GSPMD reshard = reduction reordering only; GN stats + SN sigmas drift ulps
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=0)
    assert float(jnp.mean(jnp.abs(out - ref))) < 2e-3


def test_dp_sp_train_step_matches_replicated():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
    from emoportraits_tpu.parallel.mesh import (
        make_data_mesh, make_sharded_train_step, replicate_state, shard_batch)
    from emoportraits_tpu.train.forward import make_gen_apply
    from emoportraits_tpu.train.state import TrainState
    from emoportraits_tpu.train.step import make_train_step, tower_params_pytree
    from emoportraits_tpu.train.towers import build_loss_towers

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
    state0 = TrainState.create(cfg, gen_vars, dis_vars, batch_size=b)
    step = make_train_step(cfg, gen_apply, lambda v, img: dis.apply(v, img),
                           towers)
    tp = tower_params_pytree(towers, frozen)

    def fresh(st):
        return jax.tree.map(
            lambda x: jnp.array(x) if hasattr(x, "shape") else x, st)

    def rk(m):
        return jax.device_put(
            jax.random.PRNGKey(1),
            jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec()))

    mesh1 = make_data_mesh(8)
    st1 = make_sharded_train_step(step, mesh1, with_tower_params=True)
    _, m_ref = st1(replicate_state(fresh(state0), mesh1),
                   shard_batch(batch, mesh1), rk(mesh1),
                   replicate_state(tp, mesh1))
    m_ref = {k: float(v) for k, v in m_ref.items()}

    mesh2 = make_dp_sp_mesh(2, 4)
    st2 = make_sharded_train_step(step, mesh2, with_tower_params=True)
    with jax.sharding.set_mesh(mesh2):  # activates the model's sp constraints
        new_state, m_sp = st2(replicate_state(fresh(state0), mesh2),
                              shard_batch(batch, mesh2), rk(mesh2),
                              replicate_state(tp, mesh2))
    m_sp = {k: float(v) for k, v in m_sp.items()}

    EXP_KEYS = ("contrastive", "push", "pull", "stm", "total")
    for k in m_ref:
        # same drift budget as the FSDP test: resharded float32 reductions move
        # SN sigmas a few ulp each and the expression-loss family compounds them
        loose = any(t in k for t in EXP_KEYS)
        np.testing.assert_allclose(m_sp[k], m_ref[k],
                                   rtol=6e-2 if loose else 5e-3,
                                   atol=6e-3 if loose else 5e-4, err_msg=k)
    assert int(new_state.step) == 1


def test_cascade_pipeline_matches_sequential(stage1_pieces):
    cfg, model, variables, src, drv, mask, theta = stage1_pieces
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    from emoportraits_tpu.models.stage2 import Stage2Enhancer

    s2cfg = dataclasses.replace(
        cfg.stage2, image_size=cfg.train.image_size, latent_size=16,
        latent_channels=8, latent_depth=2, num_channels=4, max_channels=16,
        dec_num_blocks=1)
    cfg2 = dataclasses.replace(cfg, stage2=s2cfg)
    enh = Stage2Enhancer(s2cfg)
    s2_vars = enh.init(jax.random.PRNGKey(1), src,
                       jnp.ones_like(src[..., :1]))

    # sequential single-device reference
    state = jax.jit(lambda v, s_, m_, t_: model.apply(
        v, s_, m_, t_, method=model.encode_source))(variables, src, mask, theta)
    img1, _ = jax.jit(lambda v, st, d, t: model.apply(
        v, st, d, t, stage_two=True, method=model.drive))(
        variables, state, drv, theta)
    ref = jax.jit(lambda v, i, m: enh.apply(v, i, m))(
        s2_vars, img1, jnp.ones_like(img1[..., :1]))

    pipe = CascadePipeline(cfg2, variables, s2_vars,
                           dev_stage1=jax.devices()[0],
                           dev_stage2=jax.devices()[1])
    pipe.set_source(src, mask, theta)
    out = pipe.forward(drv, theta)
    assert out.device == jax.devices()[1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # streaming: frames come back finished and in order
    frames = [drv, src, drv]
    for f in frames:
        pipe.submit(f, theta)
    outs = [pipe.ready() for _ in frames]
    assert pipe.ready() is None
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(out),
                               atol=1e-6, rtol=1e-6)
    assert all(o is not None and o.shape == out.shape for o in outs)
