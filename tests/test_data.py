"""Data pipeline tests: synthetic store round-trip, pair sampling, augmentation, splice
and interleave semantics."""
import numpy as np
import pytest

from emoportraits_tpu.data.augment import color_jitter, elastic_warp, random_flip_pair
from emoportraits_tpu.data.pairs import InterleavedStream, PairDataset, splice_batches
from emoportraits_tpu.data.records import ShardedClipStore, make_synthetic_store


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    make_synthetic_store(root, num_clips=6, frames_per_clip=8, image_size=64)
    return ShardedClipStore(root, split="train")


def test_store_reads_frames(store):
    assert len(store) > 0
    data = store.frames(0, [0, 3])
    assert data["frames"].shape == (2, 64, 64, 3)
    assert data["masks"].shape == (2, 64, 64)
    assert data["keypoints"].shape == (2, 68, 3)


def test_pair_dataset_batches(store):
    ds = PairDataset(store, image_size=64, augment=True, seed=1)
    batch = next(ds.batches(2))
    assert batch["source_img"].shape == (2, 64, 64, 3)
    assert batch["target_mask"].shape == (2, 64, 64, 1)
    assert batch["source_warp_aug"].shape == (2, 64, 64, 3)
    assert 0.0 <= batch["source_img"].min() and batch["source_img"].max() <= 1.0


def test_per_host_sharding(store):
    a = PairDataset(store, image_size=64, process_index=0, process_count=2)
    b = PairDataset(store, image_size=64, process_index=1, process_count=2)
    assert set(a.clip_ids).isdisjoint(set(b.clip_ids))
    assert len(a.clip_ids) + len(b.clip_ids) == len(store)


def test_splice_batches_semantics():
    main = {"x": np.zeros((4, 2)), "only_main": np.ones((4, 1))}
    second = {"x": np.ones((4, 2))}
    out = splice_batches(main, second, keep_first=1)
    assert (out["x"][0] == 0).all() and (out["x"][1:] == 1).all()
    assert (out["only_main"] == 1).all()


def test_interleave_cadence():
    def const_stream(v):
        while True:
            yield {"x": np.full((2, 1), v)}

    # prod cadence E=4 (even): reference else-branch splices at i % (E//2) == 0
    # (train.py:240-249), i.e. every 2nd iteration
    s = InterleavedStream(const_stream(0.0), const_stream(1.0), sec_dataset_every=4)
    b0, b1, b2 = next(s), next(s), next(s)
    assert b0["x"][1, 0] == 1.0   # step 0: spliced
    assert b1["x"][1, 0] == 0.0   # step 1: main only
    assert b2["x"][1, 0] == 1.0   # step 2: spliced
    # odd E: splice at i % E in {0, E-1} (train.py:240-243)
    s = InterleavedStream(const_stream(0.0), const_stream(1.0), sec_dataset_every=3)
    vals = [next(s)["x"][1, 0] for _ in range(6)]
    assert vals == [1.0, 0.0, 1.0, 1.0, 0.0, 1.0]


def test_interleave_mead_alternation():
    """FEED fires on every mead_every-th splice, MEAD on the rest
    (reference train.py:233-237 second_iter_count alternation)."""
    def const_stream(v):
        while True:
            yield {"x": np.full((2, 1), v)}

    s = InterleavedStream(const_stream(0.0), const_stream(1.0), const_stream(2.0),
                          sec_dataset_every=4, mead_every=3)
    spliced = [next(s)["x"][1, 0] for _ in range(8)]
    # steps 0,2,4,6 splice; splice counter 0 -> FEED, 1 -> MEAD, 2 -> MEAD, 3 -> FEED
    assert spliced == [1.0, 0.0, 2.0, 0.0, 2.0, 0.0, 1.0, 0.0]


def test_augment_shapes_and_ranges():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    cj = color_jitter(img, rng)
    assert cj.shape == img.shape and cj.min() >= 0 and cj.max() <= 1
    ew = elastic_warp(img, rng)
    assert ew.shape == img.shape
    assert not np.allclose(ew, img)  # actually warped
    (f1, f2) = random_flip_pair((img, img.copy()), np.random.default_rng(4), p=1.0)
    assert np.allclose(f1, img[:, ::-1])


def test_random_rotate_and_shift_pairs():
    """Rotate/shift augs (reference rot_aug/rand_crop composes,
    voxceleb2hq_pairs.py:106-117): pair-consistent, zero border, keypoints
    remapped with the same transform."""
    from emoportraits_tpu.data.augment import (random_rotate_pair,
                                               random_shift_pair)

    rng = np.random.default_rng(0)
    img = rng.random((33, 33, 3)).astype(np.float32)
    mask = np.ones((33, 33, 1), np.float32)
    kp = np.stack([np.array([[0.5, 0.25, 0.1]], np.float32)])

    # shift by an exact integer number of pixels -> pure translation
    class FixedRng:
        def uniform(self, lo, hi):
            return 8.0 / 33.0  # dx = dy = +8 px
        def random(self):
            return 0.0  # always fire

    (s_img, s_mask), skp = random_shift_pair((img, mask), FixedRng(),
                                             shift_limit=0.5, p=1.0,
                                             keypoints=kp)
    np.testing.assert_allclose(s_img[8:, 8:], img[:-8, :-8], atol=1e-6)
    assert (s_img[:8] == 0).all() and (s_mask[:, :8] == 0).all()  # zero border
    np.testing.assert_allclose(skp[0, 0, :2],
                               kp[0, 0, :2] + 2.0 * 8.0 / 33.0, atol=1e-6)

    # rotation: identity at angle 0 sampling path is skipped; check keypoint
    # rotation matches the image rotation via a bright dot
    dot = np.zeros((65, 65, 3), np.float32)
    dot[16, 48] = 1.0  # (x=48, y=16) -> kp (+0.5, -0.5) in [-1,1]
    kp2 = np.array([[[0.5, -0.5]]], np.float32)

    class Rot90:
        def uniform(self, lo, hi):
            return 90.0

    (r_img,), rkp = random_rotate_pair((dot,), Rot90(), limit_deg=90.0,
                                       keypoints=kp2)
    iy, ix = np.unravel_index(np.argmax(r_img[..., 0]), r_img[..., 0].shape)
    ex = (rkp[0, 0, 0] + 1) / 2 * 64
    ey = (rkp[0, 0, 1] + 1) / 2 * 64
    assert abs(ix - ex) <= 1 and abs(iy - ey) <= 1
    # no-op paths return inputs unchanged
    out, k = random_rotate_pair((img,), rng, 0.0, keypoints=kp)
    assert out[0] is img and k is kp


def test_pair_dataset_rotate_shift_knobs(store):
    ds = PairDataset(store, image_size=64, augment=True, seed=3,
                     rot_aug_angle=10.0, shift_limit=0.1, rand_shift_prob=1.0)
    batch = next(ds.batches(2))
    assert batch["source_img"].shape == (2, 64, 64, 3)
    assert np.isfinite(batch["source_keypoints"]).all()


def test_prefetcher_passthrough():
    from emoportraits_tpu.data.pairs import Prefetcher

    def gen():
        for i in range(5):
            yield {"x": np.full((1,), i)}

    pf = Prefetcher(gen(), depth=2)
    vals = [next(pf)["x"][0] for _ in range(5)]
    assert vals == [0, 1, 2, 3, 4]
    pf.close()


def test_train_test_split_disjoint(tmp_path):
    """Split discipline: the test split must hold out clips the train split never
    sees (guards the eval loop against train/test leakage)."""
    root = str(tmp_path / "store")
    make_synthetic_store(root, num_clips=12, frames_per_clip=4, image_size=32)
    train = ShardedClipStore(root, split="train")
    test = ShardedClipStore(root, split="test")
    train_keys = {(c.shard_path, c.clip_key) for c in train.clips}
    test_keys = {(c.shard_path, c.clip_key) for c in test.clips}
    assert test_keys, "synthetic store must produce a nonempty test split"
    assert not (train_keys & test_keys), "train/test clips overlap"
    assert len(train_keys) + len(test_keys) == 12
