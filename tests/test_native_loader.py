"""Native C++ loader tests: build, store round-trip, batch sampling, throughput sanity,
and agreement with the Python pipeline's contracts."""
import numpy as np
import pytest

from emoportraits_tpu.data.native import (
    NativePairLoader,
    build_library,
    write_native_store,
)


@pytest.fixture(scope="module")
def native_root(tmp_path_factory):
    build_library()
    root = str(tmp_path_factory.mktemp("native_store"))
    rng = np.random.default_rng(0)
    clips = {}
    for c in range(4):
        frames = rng.integers(0, 255, (6, 48, 48, 3), dtype=np.uint8)
        masks = rng.integers(0, 255, (6, 48, 48), dtype=np.uint8)
        kps = rng.random((6, 68, 3)).astype(np.float32)
        clips[f"clip_{c}"] = {"frames": frames, "masks": masks, "keypoints": kps}
    write_native_store(root, clips)
    return root


def test_native_loader_basic(native_root):
    loader = NativePairLoader(native_root, image_size=48, augment=False, seed=0)
    assert loader.num_clips == 4
    batch = loader.sample_batch(3)
    assert batch["source_img"].shape == (3, 48, 48, 3)
    assert batch["target_mask"].shape == (3, 48, 48, 1)
    assert 0.0 <= batch["source_img"].min() and batch["source_img"].max() <= 1.0
    assert batch["source_img"].std() > 0.01  # actually filled


def test_native_loader_resize_and_augment(native_root):
    loader = NativePairLoader(native_root, image_size=64, augment=True, seed=1)
    batch = loader.sample_batch(2)
    assert batch["source_img"].shape == (2, 64, 64, 3)
    assert "source_warp_aug" in batch and batch["source_warp_aug"].shape == (2, 64, 64, 3)
    # warp_aug must differ from the plain image (elastic warp applied)
    assert not np.allclose(batch["source_warp_aug"], batch["source_img"])


def test_native_loader_deterministic_per_step(native_root):
    a = NativePairLoader(native_root, image_size=48, augment=False, seed=7)
    b = NativePairLoader(native_root, image_size=48, augment=False, seed=7)
    np.testing.assert_array_equal(a.sample_batch(2)["source_img"],
                                  b.sample_batch(2)["source_img"])
    # consecutive steps differ
    x1 = a.sample_batch(2)["source_img"]
    x2 = a.sample_batch(2)["source_img"]
    assert not np.array_equal(x1, x2)


def test_native_loader_batches_iterator(native_root):
    loader = NativePairLoader(native_root, image_size=48, augment=False)
    it = loader.batches(2)
    b1, b2 = next(it), next(it)
    assert set(b1) == {"source_img", "target_img", "source_mask", "target_mask",
                       "source_keypoints", "target_keypoints"}
    assert b1["source_img"].shape == b2["source_img"].shape


@pytest.fixture(scope="module")
def native_v2_root(tmp_path_factory):
    """EMOS2 store: full reference geometry payload (thetas/3DMM/crop/scale)."""
    build_library()
    root = str(tmp_path_factory.mktemp("native_store_v2"))
    rng = np.random.default_rng(3)
    clips = {}
    for c in range(3):
        T = 5
        frames = rng.integers(0, 255, (T, 48, 48, 3), dtype=np.uint8)
        masks = rng.integers(0, 255, (T, 48, 48), dtype=np.uint8)
        kps = rng.uniform(-1, 1, (T, 68, 3)).astype(np.float32)
        thetas = np.tile(np.array([[0.5, 0.0, 0.1], [0.0, 0.5, -0.1]],
                                  np.float32), (T, 1, 1))
        clips[f"clip_{c}"] = {
            "frames": frames, "masks": masks, "keypoints": kps,
            "ffhq_theta": thetas,
            "params_3dmm": rng.random((T, 17)).astype(np.float32),
            "crop_box": rng.random((T, 4)).astype(np.float32),
            "face_scale": rng.random((T,)).astype(np.float32),
        }
    write_native_store(root, clips)
    return root


def test_native_v2_keypoints_and_ffhq(native_v2_root):
    """EMOS2 payload flows through emod_sample_pairs2: keypoints arrive with the
    batch and the FFHQ-aligned target crop is a genuine theta warp (zoomed-in
    center region, not a resize of the plain target)."""
    loader = NativePairLoader(native_v2_root, image_size=48, augment=False,
                              seed=0, ffhq_size=32, align_scale=1.0)
    batch = loader.sample_batch(2)
    assert batch["source_keypoints"].shape == (2, 68, 3)
    assert batch["target_keypoints"].shape == (2, 68, 3)
    assert batch["target_img_ffhq"].shape == (2, 32, 32, 3)
    assert batch["target_mask_ffhq"].shape == (2, 32, 32, 1)
    assert batch["target_img_ffhq"].std() > 0.01
    # theta scales by 0.5 -> crop is a 2x zoom of the frame center, so it must
    # differ from a plain bilinear resize of the target image
    from emoportraits_tpu.data.augment import bilinear_resize
    plain = np.stack([bilinear_resize(t, 32, 32) for t in batch["target_img"]])
    assert np.abs(batch["target_img_ffhq"] - plain).mean() > 0.02


def test_native_v2_keypoint_flip_consistency(native_v2_root):
    """With augmentation the photometric flip also mirrors keypoint x ([-1,1])."""
    loads = [NativePairLoader(native_v2_root, image_size=48, augment=aug, seed=11)
             for aug in (False, True)]
    plain = loads[0].sample_batch(4)
    auged = loads[1].sample_batch(4)
    # same seed -> same clip/frame picks; kp equal up to an x-sign per element
    for b in range(4):
        kp0, kp1 = plain["target_keypoints"][b], auged["target_keypoints"][b]
        same = np.allclose(kp0, kp1)
        flipped = np.allclose(kp0 * np.array([-1.0, 1.0, 1.0]), kp1)
        assert same or flipped


def test_ffhq_align_warp_python_matches_cpp(tmp_path):
    """The Python ffhq_align_warp and the C++ warp_frame_ffhq produce the same
    crop (single-clip single-frame store makes the C++ pick deterministic)."""
    from emoportraits_tpu.data.augment import ffhq_align_warp

    build_library()
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 255, (1, 40, 40, 3), dtype=np.uint8)
    mask = rng.integers(0, 255, (1, 40, 40), dtype=np.uint8)
    theta = np.array([[[0.6, 0.05, 0.1], [-0.05, 0.6, -0.2]]], np.float32)
    root = str(tmp_path / "one")
    write_native_store(root, {"c": {
        "frames": frame, "masks": mask,
        "keypoints": np.zeros((1, 68, 3), np.float32), "ffhq_theta": theta}})
    loader = NativePairLoader(root, image_size=40, augment=False, seed=5,
                              ffhq_size=24, align_scale=1.33)
    batch = loader.sample_batch(1)
    py = ffhq_align_warp(frame[0].astype(np.float32) / 255.0, theta[0], 24, 1.33)
    np.testing.assert_allclose(batch["target_img_ffhq"][0], py, atol=2e-3)
    py_mask = ffhq_align_warp(mask[0, ..., None].astype(np.float32) / 255.0,
                              theta[0], 24, 1.33)
    np.testing.assert_allclose(batch["target_mask_ffhq"][0], py_mask, atol=2e-3)
