"""Stage-2 enhancer + volume renderer tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import Stage2Config, VolumeRendererConfig
from emoportraits_tpu.models.stage2 import Stage2Enhancer
from emoportraits_tpu.models.volume_renderer import VolumeRenderer, ray_march

KEY = jax.random.PRNGKey(0)


def test_stage2_residual_refinement():
    cfg = Stage2Config(image_size=64, num_channels=8, max_channels=32,
                       dec_num_blocks=2, latent_size=16, latent_channels=8,
                       latent_depth=4, enc_channel_mult=1.0, dec_channel_mult=1.0,
                       dec_feat_channels=(16, 16, 8, 8))
    m = Stage2Enhancer(cfg)
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    mask = jnp.ones((2, 64, 64, 1))
    p = m.init(KEY, pred, mask)
    out = m.apply(p, pred, mask)
    assert out.shape == pred.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # zero mask must pass the stage-1 prediction through unchanged
    out_nomask = m.apply(p, pred, jnp.zeros_like(mask))
    np.testing.assert_allclose(np.asarray(out_nomask), np.clip(np.asarray(pred), 0, 1),
                               atol=1e-6)


def test_ray_march_opaque_front():
    # A single very dense sample near the front should dominate the composite.
    b, r, s = 1, 4, 8
    depths = jnp.broadcast_to(jnp.linspace(-1, 1, s).reshape(1, 1, s, 1), (b, r, s, 1))
    colors = jnp.zeros((b, r, s, 3)).at[:, :, :3].set(1.0)
    dens = jnp.full((b, r, s, 1), -10.0).at[:, :, :3].set(50.0)
    comp, depth, w = ray_march(colors, dens, depths)
    assert comp.shape == (b, r, 3)
    # composite ~ 2*color-1 at the opaque front sample
    assert float(comp[0, 0, 0]) > 0.5
    assert float(depth[0, 0, 0]) < 0.0  # front of the volume


def test_volume_renderer_shapes():
    cfg = VolumeRendererConfig(depth_resolution=8, hidden_dim=32, features=8,
                               squeeze_dim=16)
    m = VolumeRenderer(cfg)
    vol = jnp.asarray(np.random.default_rng(1).random((1, 4, 8, 8, 8),
                                                      dtype=np.float32))
    p = m.init(KEY, vol)
    feat, rgb, depth = m.apply(p, vol)
    assert feat.shape == (1, 8, 8, 32)  # features*4
    assert rgb.shape == (1, 8, 8, 3)
    assert depth.shape == (1, 8, 8, 1)
    # jittered sampling path
    feat2, _, _ = m.apply(p, vol, rng=jax.random.PRNGKey(1))
    assert feat2.shape == feat.shape


@pytest.mark.slow
def test_stage2_full_loss_step():
    """The complete stage-2 training step (va_losses_and_visuals_two.py:14-113):
    main D + second (mixing) D, vgg19, L1_ffhq + diff-masked L1, the cycle_stage2
    down-res consistency family, live matte/face-idt masks — every loss present,
    finite, and all three parameter sets updated."""
    import dataclasses

    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator
    from emoportraits_tpu.train.stage2_step import (
        Stage2TrainState,
        make_stage2_train_step,
    )
    from emoportraits_tpu.train.towers import build_loss_towers

    cfg = tiny_config()
    s2 = dataclasses.replace(
        cfg.stage2, image_size=64, latent_size=16, latent_channels=8,
        latent_depth=4, num_channels=8, enc_channel_mult=1.0,
        dec_channel_mult=1.0, max_channels=32, dec_num_blocks=2,
        dec_feat_channels=(16, 16, 8, 8),
        l1_weight=1.0, cycle_stage2=1.0, resize_s2=32)
    cfg = dataclasses.replace(cfg, stage2=s2)
    towers, frozen = build_loss_towers(cfg, KEY, tiny=True)
    assert frozen.matting is not None and frozen.face_parsing is not None

    enh = Stage2Enhancer(s2)
    dis = MultiScaleDiscriminator(cfg.model.discriminator)
    dis2 = MultiScaleDiscriminator(cfg.model.discriminator)
    rng = np.random.default_rng(3)
    img = lambda: jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    pred, mix, tgt = img(), img(), img()
    ones = jnp.ones((2, 64, 64, 1))
    enh_vars = enh.init(KEY, pred, ones)
    dis_vars = dis.init(KEY, tgt)
    dis2_vars = dis2.init(jax.random.PRNGKey(7), tgt)

    step = jax.jit(make_stage2_train_step(
        cfg,
        lambda v, p, m, mt=None: enh.apply(v, p, m, mt, mutable=["sn_state"]),
        lambda v, i: dis.apply(v, i),
        second_dis_apply=lambda v, i: dis2.apply(v, i),
        vgg19_apply=towers.vgg19_apply, vgg19_params=towers.vgg19_params,
        face_parsing=frozen.face_parsing, matting=frozen.matting))
    state = Stage2TrainState.create(cfg, enh_vars, dis_vars, dis2_vars)
    batch = {"pred_target_img": pred, "pred_mixing_img": mix,
             "target_img_ffhq": tgt}
    new_state, m = step(state, batch, jax.random.PRNGKey(1))

    required = {"s2/gen_adversarial", "s2/feature_matching", "s2/vgg19",
                "s2/gen_adversarial_2", "s2/L1_ffhq", "s2/L1_ffhq_diff",
                "s2/vgg19_cycle", "s2/L1_ffhq_cycle", "s2/vgg19_mix",
                "s2/L1_ffhq_mix", "s2/dis_adversarial", "s2/dis_adversarial_2"}
    missing = required - set(m)
    assert not missing, f"missing stage-2 losses: {missing}"
    for k in required:
        assert np.isfinite(float(m[k])), f"{k} not finite"
    assert int(new_state.step) == 1
    for old, new in ((state.enh_params, new_state.enh_params),
                     (state.dis_params, new_state.dis_params),
                     (state.dis2_params, new_state.dis2_params)):
        delta = jax.tree.reduce(
            lambda a, l: a + float(jnp.sum(jnp.abs(l))),
            jax.tree.map(lambda a, b: a - b, old, new), 0.0)
        assert delta > 0, "a parameter set did not update"

    # donated-state aliasing audit (mirror of the stage-1
    # test_donated_state_fully_aliased): the Trainer jits the stage-2 step with
    # donate_argnums=(0,) — the bulk of the Stage2TrainState (all three param
    # sets + moments) must alias through the compiled program
    donated = jax.jit(make_stage2_train_step(
        cfg,
        lambda v, p, m, mt=None: enh.apply(v, p, m, mt, mutable=["sn_state"]),
        lambda v, i: dis.apply(v, i),
        second_dis_apply=lambda v, i: dis2.apply(v, i),
        vgg19_apply=towers.vgg19_apply, vgg19_params=towers.vgg19_params,
        face_parsing=frozen.face_parsing, matting=frozen.matting),
        donate_argnums=(0,))
    ma = donated.lower(state, batch, jax.random.PRNGKey(1)).compile(
        ).memory_analysis()
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(state) if hasattr(x, "dtype"))
    assert ma is not None
    coverage = ma.alias_size_in_bytes / state_bytes
    assert coverage >= 0.9, (
        f"donated stage-2 state only {coverage:.2%} aliased "
        f"({ma.alias_size_in_bytes} of {state_bytes} bytes)")
