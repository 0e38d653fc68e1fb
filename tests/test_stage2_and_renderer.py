"""Stage-2 enhancer + volume renderer tests."""
import numpy as np

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
