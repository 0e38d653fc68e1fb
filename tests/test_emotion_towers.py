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


def test_landmark_tower_taps():
    apply_fn, params = make_landmark_tower(KEY, image_size=64)
    x = jnp.ones((1, 64, 64, 3))
    feats = apply_fn(params, x)
    expected = {"conv1", "conv2_dw", "conv_23", "conv_3", "conv_34", "conv_4",
                "conv_45", "conv_5", "conv_6_sep", "output_layer"}
    assert set(feats) == expected
    assert feats["output_layer"].shape == (1, 1, 1, 128)
