"""InferenceWrapper end-to-end on the tiny config: set_source -> forward frames, pose
momentum, mixed-pose drive, stage-2 cascade."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import Stage2Config, tiny_config
from emoportraits_tpu.infer.wrapper import InferenceWrapper
from emoportraits_tpu.models.head_pose import HeadPoseRegressor
from emoportraits_tpu.models.stage1 import VolumetricAvatar

# compile-heavy e2e: excluded from the quick loop via `-m "not slow"`
pytestmark = pytest.mark.slow
from emoportraits_tpu.models.stage2 import Stage2Enhancer

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def wrapper():
    cfg = tiny_config()
    model = VolumetricAvatar(cfg.model)
    s = cfg.train.image_size
    z = jnp.zeros((1, s, s, 3))
    m1 = jnp.ones((1, s, s, 1))
    th = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    variables = model.init(KEY, z, m1, z, th, th)
    hp = HeadPoseRegressor()
    hp_vars = hp.init(KEY, z)
    return InferenceWrapper(cfg, variables, head_pose_variables=hp_vars,
                            theta_momentum=0.5)


def test_set_source_and_forward(wrapper):
    rng = np.random.default_rng(0)
    src = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    wrapper.set_source(src)
    out1 = np.asarray(wrapper.forward((rng.random((64, 64, 3)) * 255).astype(np.uint8)))
    assert out1.shape == (1, 64, 64, 3)
    assert 0.0 <= out1.min() and out1.max() <= 1.0
    # momentum state advanced
    assert wrapper._prev_theta is not None
    out2 = np.asarray(wrapper.forward((rng.random((64, 64, 3)) * 255).astype(np.uint8)))
    assert not np.allclose(out1, out2)


def test_forward_frame_fused_streaming(wrapper):
    """The fused uint8 streaming path must match the flexible float path: same
    pose estimate, same drive, 8-bit quantization at the end."""
    rng = np.random.default_rng(3)
    frame = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    wrapper.set_source((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    ref = np.asarray(wrapper.forward(frame, smooth_pose=False))[0]
    wrapper._prev_theta = None  # reset the momentum chain
    out = np.asarray(wrapper.forward_frame(frame))
    assert out.dtype == np.uint8 and out.shape == (64, 64, 3)
    assert np.abs(out.astype(np.float32) / 255.0 - ref).max() < 2e-2
    # momentum chain engages from the second frame
    out2 = np.asarray(wrapper.forward_frame(frame))
    assert out2.shape == (64, 64, 3)


def test_forward_mixed_pose(wrapper):
    rng = np.random.default_rng(1)
    out = np.asarray(wrapper.forward_mixed_pose(
        (rng.random((64, 64, 3)) * 255).astype(np.uint8)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_stage2_cascade():
    cfg = tiny_config()
    model = VolumetricAvatar(cfg.model)
    s = cfg.train.image_size
    z = jnp.zeros((1, s, s, 3))
    m1 = jnp.ones((1, s, s, 1))
    th = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    variables = model.init(KEY, z, m1, z, th, th)
    s2cfg = Stage2Config(image_size=s, num_channels=4, max_channels=16,
                         dec_num_blocks=1, latent_size=16, latent_channels=4,
                         latent_depth=2, dec_feat_channels=(8, 8))
    enh = Stage2Enhancer(s2cfg)
    s2_vars = enh.init(KEY, jnp.zeros((1, s, s, 3)), jnp.ones((1, s, s, 1)))
    # wrapper must accept the matching stage2 module config
    w = InferenceWrapper(dataclasses.replace(cfg, stage2=s2cfg), variables,
                         stage2_variables=s2_vars)
    rng = np.random.default_rng(2)
    w.set_source((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    out = np.asarray(w.forward((rng.random((64, 64, 3)) * 255).astype(np.uint8)))
    assert out.shape == (1, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_parser_supplies_source_mask_and_crop(wrapper):
    """When face-parsing variables are wired, set_source derives the face mask
    from the parser (reference infer.py:410-424) and auto_crop preprocesses raw
    frames of ANY resolution into (S, S) crops."""
    calls = []

    class FakeParser:
        variables = None

        def __call__(self, img):
            calls.append(img.shape)
            return {"mask": jnp.ones_like(img[..., :1]) * 0.5}

    wrapper._parser = FakeParser()
    rng = np.random.default_rng(5)
    wrapper.set_source((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    assert calls == [(1, 64, 64, 3)]  # parser ran on the prepped source
    out = np.asarray(wrapper.forward(
        (rng.random((64, 64, 3)) * 255).astype(np.uint8)))
    assert out.shape == (1, 64, 64, 3)
    wrapper._parser = None

    # auto-crop path: raw 100x80 frame -> detector+cropper -> (64, 64) prep
    from emoportraits_tpu.infer.face_crop import make_crop_fn
    from emoportraits_tpu.models.face_parsing import BiSeNet

    pvars = BiSeNet().init(KEY, jnp.zeros((1, 32, 32, 3)))
    wrapper.set_crop_fn(make_crop_fn(pvars, image_size=64, detect_size=32))
    wrapper.set_source((rng.random((100, 80, 3)) * 255).astype(np.uint8))
    out = np.asarray(wrapper.forward(
        (rng.random((100, 80, 3)) * 255).astype(np.uint8)))
    assert out.shape == (1, 64, 64, 3)
    wrapper._crop_fn = None
