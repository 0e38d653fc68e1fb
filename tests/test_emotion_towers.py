"""Emotion + landmark tower tests."""
import numpy as np

import jax
import jax.numpy as jnp

from emoportraits_tpu.losses.emotion import (
    make_emotion_tower,
    make_landmark_tower,
    to_grayscale3,
)
from emoportraits_tpu.losses.perceptual import perceptual_loss

KEY = jax.random.PRNGKey(0)


def test_grayscale3():
    img = jnp.asarray([[[[1.0, 0.0, 0.0]]]])
    g = to_grayscale3(img)
    assert g.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), [0.299] * 3, rtol=1e-5)


def test_emotion_tower_as_perceptual_backbone():
    apply_fn, params = make_emotion_tower(KEY, image_size=55)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    # gray-resize path like the reference vgg_emotions config (resize 55, gray)
    loss = perceptual_loss(apply_fn, params, to_grayscale3(a), to_grayscale3(b),
                           num_scales=1, normalization="none", resize_to=55)
    assert np.isfinite(float(loss)) and float(loss) > 0
    same = perceptual_loss(apply_fn, params, to_grayscale3(a), to_grayscale3(a),
                           num_scales=1, normalization="none", resize_to=55)
    assert float(same) < 1e-6


def test_emotion_resnet_taps():
    from emoportraits_tpu.losses.emotion import make_emotion_resnet_tower

    apply_fn, params = make_emotion_resnet_tower(KEY, image_size=64, width=8)
    feats = apply_fn(params, jnp.ones((1, 64, 64, 3)))
    assert set(feats) == {"layer_1", "layer_2", "layer_3", "layer_4"}
    assert feats["layer_4"].shape == (1, 2, 2, 64)  # width 8 -> 64 at stage 4


def test_senet_block_taps():
    from emoportraits_tpu.models.backbones.senet import SENet50

    net = SENet50(layers=(3, 4, 6, 3), block_taps=True)
    # tap NAMES must match the reference face_resnet config (relu1..relu16)
    # without running the full net: init at a tiny size then inspect tap dict
    net_small = SENet50(layers=(1, 1, 1, 1), block_taps=True)
    p = net_small.init(KEY, jnp.ones((1, 32, 32, 3)))
    _, taps = net_small.apply(p, jnp.ones((1, 32, 32, 3)))
    assert set(taps) == {"relu1", "relu2", "relu3", "relu4"}
    assert sum((3, 4, 6, 3)) == 16  # full config yields relu1..relu16


def test_perceptual_scale_factor():
    from emoportraits_tpu.losses.perceptual import perceptual_loss

    calls = []

    def fake_tower(_p, img):
        calls.append(img.shape[1])
        return {"relu_1_1": img}

    a = jnp.ones((1, 100, 100, 3))
    perceptual_loss(fake_tower, None, a, a, num_scales=3,
                    layers=("relu_1_1",), layer_weights=(1.0,),
                    normalization="none", scale_factor=0.8)
    assert calls == [100, 80, 64]  # 0.8 pyramid (reference vgg_emotions)


def test_crop_faces_for_landmarks_golden_vs_reference():
    """Golden vs the REAL reference utils/prepare_for_landmark.py: same boxes,
    same images -> identical 112px crops (zero padding + nearest resize)."""
    import pytest

    from ref_oracle import install_stubs, reference_available

    from emoportraits_tpu.losses.emotion import crop_faces_for_landmarks

    if not reference_available():
        pytest.skip("reference not present")
    install_stubs()
    import torch

    from utils.prepare_for_landmark import prepare_face_for_landmarks

    rng = np.random.default_rng(0)
    imgs = rng.random((4, 96, 80, 3)).astype(np.float32)
    boxes = np.array([
        [10, 12, 60, 70, 0.9],     # interior box
        [-8, -4, 40, 50, 0.8],     # overflows top-left -> zero pad
        [30, 40, 100, 120, 0.7],   # overflows bottom-right
        [0, 0, 0, 0, 1.0],         # the reference's degenerate fallback box
    ], np.float32)

    ref = prepare_face_for_landmarks(
        torch.from_numpy(imgs).permute(0, 3, 1, 2),
        [torch.from_numpy(b) for b in boxes])
    ref = ref.permute(0, 2, 3, 1).numpy()

    got = np.asarray(crop_faces_for_landmarks(
        jnp.asarray(imgs), jnp.asarray(boxes)))
    assert got.shape == ref.shape == (4, 112, 112, 3)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_landmark_loss_assembly():
    from emoportraits_tpu.losses.emotion import landmark_loss

    apply_fn, params = make_landmark_tower(KEY, image_size=112)
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    boxes = jnp.asarray([[8, 8, 48, 52], [4, 10, 40, 44]], jnp.float32)
    loss, (pl, tl) = landmark_loss(apply_fn, params, pred, tgt, boxes)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert pl.shape == tl.shape == (2, 128)
    same, _ = landmark_loss(apply_fn, params, pred, pred, boxes)
    assert float(same) < 1e-6
    # differentiable through the crop gather
    g = jax.grad(lambda p: landmark_loss(apply_fn, params, p, tgt, boxes)[0])(pred)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_landmark_tower_taps():
    apply_fn, params = make_landmark_tower(KEY, image_size=64)
    x = jnp.ones((1, 64, 64, 3))
    feats = apply_fn(params, x)
    expected = {"conv1", "conv2_dw", "conv_23", "conv_3", "conv_34", "conv_4",
                "conv_45", "conv_5", "conv_6_sep", "output_layer"}
    assert set(feats) == expected
    assert feats["output_layer"].shape == (1, 1, 1, 128)
