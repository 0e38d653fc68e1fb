"""Built-in face detection + square crop (infer/face_crop.py): remove_overflow
geometry, crop_image semantics (reference notebooks/infer.py:245-352), EMA
smoothing, and the BiSeNet-driven detector contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.infer.face_crop import (FaceBoxDetector, FaceCropper,
                                              make_crop_fn, remove_overflow)


def test_remove_overflow_in_bounds_and_shrink():
    # fully inside: size preserved (even)
    assert remove_overflow(np.array([50, 50]), 40, 100, 100) == 40
    # sticking out left by 10: trimmed from BOTH sides -> 40 - 2*10 = 20
    assert remove_overflow(np.array([10, 50]), 40, 100, 100) == 20
    # odd result rounds down to even
    assert remove_overflow(np.array([11, 50]), 40, 100, 100) % 2 == 0
    # max overflow across edges wins
    assert remove_overflow(np.array([10, 5]), 40, 100, 100) == 10


def test_cropper_centers_the_box():
    img = np.zeros((100, 80, 3), np.float32)
    img[46:52, 30:36] = 1.0  # bright patch
    box = np.asarray([26.0, 42.0, 40.0, 56.0])  # 14x14 box around the patch
    out = FaceCropper(image_size=32).crop(img, box)
    assert out.shape == (32, 32, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # crop square side = (w + h) * scale = 28 at center (33, 49): the patch
    # center lands at the output center
    w_map = out.sum(-1)
    ys, xs = np.mgrid[:32, :32]
    cy = (w_map * ys).sum() / w_map.sum()
    cx = (w_map * xs).sum() / w_map.sum()
    assert abs(cy - 16) <= 2 and abs(cx - 16) <= 2


def test_cropper_smoothing_ema():
    c = FaceCropper(image_size=16, momentum=0.9)
    img = np.zeros((64, 64, 3), np.float32)
    c.crop(img, np.asarray([10.0, 10.0, 30.0, 30.0]), smooth=True)
    first_center = c.center.copy()
    c.crop(img, np.asarray([30.0, 30.0, 50.0, 50.0]), smooth=True)
    # reference convention: momentum weights the NEW observation (infer.py:323)
    np.testing.assert_allclose(c.center, 0.9 * np.array([40.0, 40.0])
                               + 0.1 * first_center)
    c.reset()
    assert c.center is None and c.size is None
    # fixed_bounding_box freezes the first box
    f = FaceCropper(image_size=16, fixed_bounding_box=True)
    f.crop(img, np.asarray([10.0, 10.0, 30.0, 30.0]), smooth=True)
    f.crop(img, np.asarray([30.0, 30.0, 50.0, 50.0]), smooth=True)
    np.testing.assert_allclose(f.center, [20.0, 20.0])


def test_cropper_none_box_full_frame_fallback():
    img = np.random.default_rng(0).random((48, 96, 3)).astype(np.float32)
    out = FaceCropper(image_size=24).crop(img, None)
    assert out.shape == (24, 24, 3)
    assert np.isfinite(out).all()


def test_detector_contract_and_crop_fn():
    """Randomly-initialized BiSeNet: the detector must return None or a valid
    in-bounds widened box, and the composed crop_fn always yields a well-formed
    (S, S, 3) [0,1] image either way."""
    from emoportraits_tpu.models.face_parsing import BiSeNet

    d = 64
    variables = BiSeNet().init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)))
    det = FaceBoxDetector(variables, detect_size=d)
    rng = np.random.default_rng(1)
    img = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
    box = det(img)
    if box is not None:
        x0, y0, x1, y1 = box
        assert 0 <= x0 < x1 <= 100 and 0 <= y0 < y1 <= 80 - 1 + 1e-6

    fn = make_crop_fn(variables, image_size=32, detect_size=d)
    out = fn(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
