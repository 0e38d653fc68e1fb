"""Pair-sampling dataset + multi-stream interleave + per-host sharding.

Reference parity:
  * source/target frame-pair sampling within a clip (`random_frames`,
    datasets/voxceleb2hq_pairs.py:213-220);
  * error-retry resample loop (:186-199) — any clip failure resamples a fresh index;
  * DataModule with DDP samplers (:650-683) -> replaced by per-host contiguous sharding
    of the clip list (each JAX process reads its slice; no DistributedSampler);
  * FEED/MEAD second-stream batch splicing every `sec_dataset_every` iters
    (train.py:233-249): batch element 0 from the main stream, elements 1.. from the
    second stream, spliced per key.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .augment import (
    apply_jitter,
    bilinear_resize,
    color_jitter,
    elastic_warp,
    geometric_crop,
    random_grayscale,
    random_rotate_pair,
    random_shift_pair,
    sample_jitter_params,
    to_grayscale3,
)
from .records import ShardedClipStore


class PairDataset:
    """Yields dict batches of (source, target) frame pairs from one clip each."""

    def __init__(self, store: ShardedClipStore, image_size: int, *,
                 augment: bool = True, augment_geometric: bool = True, seed: int = 0,
                 rot_aug_angle: float = 0.0, shift_limit: float = 0.0,
                 rand_shift_prob: float = 0.0,
                 augment_color: bool = True, aug_color_coef: float = 1.0,
                 warp_aug_color_coef: float = 1.0, gray_source_prob: float = 0.0,
                 ffhq_size: int = 0, align_scale: float = 1.33,
                 process_index: int = 0, process_count: int = 1):
        self.store = store
        self.image_size = image_size
        self.augment = augment
        self.augment_geometric = augment_geometric
        # color pipeline strengths (reference voxceleb2hq_pairs.py:89-97: one
        # ColorJitter(hue .03c, brightness .06*max(1, c/2), contrast .03c,
        # saturation .03c, p=0.8) + ToGray(gray_source_prob), pair-consistent
        # params; prod aug_color_coef=10 => ~0.3 each)
        self.augment_color = augment_color
        c = aug_color_coef
        self.jitter = dict(hue=min(0.03 * c, 0.5),
                           brightness=0.06 * max(1.0, c / 2.0),
                           contrast=0.03 * c, saturation=0.03 * c, p=0.8)
        # warp_aug stream ColorJitter(brightness .4, contrast/saturation/hue .4w)
        # + RandomGrayscale(p=.05), independent per stream (:385-391, :399-400)
        wc = warp_aug_color_coef
        self.warp_jitter = dict(brightness=0.4, contrast=0.4 * wc,
                                saturation=0.4 * wc, hue=min(0.4 * wc, 0.5))
        self.gray_source_prob = gray_source_prob
        # reference rot_aug / rand_crop knobs (voxceleb2hq_pairs.py:40-47; all 0
        # in prod -> off): rotation limit in degrees, shift as a side fraction
        self.rot_aug_angle = rot_aug_angle
        self.shift_limit = shift_limit
        self.rand_shift_prob = rand_shift_prob
        # >0: also emit target_img_ffhq/target_mask_ffhq crops at this resolution
        # from the stored per-frame FFHQ theta (stage-2 ground truth; the reference
        # aligns with theta @ diag(align_scale), voxceleb2hq_pairs.py:321-348).
        # Crops come from the UN-augmented frame — the stored theta addresses
        # original frame coordinates.
        self.ffhq_size = ffhq_size
        self.align_scale = align_scale
        self.rng = np.random.default_rng(seed + process_index)
        # per-host shard of the clip list (replaces DistributedSampler)
        n = len(store)
        idx = np.arange(n)
        self.clip_ids = idx[idx % process_count == process_index]
        if len(self.clip_ids) == 0:
            self.clip_ids = idx

    def _resize(self, img: np.ndarray) -> np.ndarray:
        return bilinear_resize(img, self.image_size, self.image_size)

    def sample_pair(self) -> Dict[str, np.ndarray]:
        """One (source, target) example; retries on failure like the reference's
        __getitem__ loop (voxceleb2hq_pairs.py:186-199)."""
        for _ in range(10):
            try:
                ci = int(self.rng.choice(self.clip_ids))
                n = self.store.clips[ci].num_frames
                si, ti = self.rng.integers(0, n, 2)
                data = self.store.frames(ci, [int(si), int(ti)])
                frames = data["frames"].astype(np.float32) / 255.0
                masks = data["masks"].astype(np.float32)[..., None] / 255.0
                src, tgt = self._resize(frames[0]), self._resize(frames[1])
                smask, tmask = self._resize(masks[0]), self._resize(masks[1])
                skp = data["keypoints"][0] if "keypoints" in data else None
                tkp = data["keypoints"][1] if "keypoints" in data else None
                out = {}
                if self.ffhq_size > 0 and "ffhq_theta" in data:
                    from .augment import ffhq_align_warp

                    # stage-2 ground truth from the stored theta + raw frame
                    out["target_img_ffhq"] = ffhq_align_warp(
                        frames[1], data["ffhq_theta"][1], self.ffhq_size,
                        self.align_scale)
                    out["target_mask_ffhq"] = ffhq_align_warp(
                        masks[1], data["ffhq_theta"][1], self.ffhq_size,
                        self.align_scale)
                if self.augment:
                    if self.augment_geometric:
                        # independent crop params per frame (reference
                        # preprocess_data, voxceleb2hq_pairs.py:433-441)
                        src, smask, skp = geometric_crop(src, smask, self.rng,
                                                         keypoints=skp)
                        tgt, tmask, tkp = geometric_crop(tgt, tmask, self.rng,
                                                         keypoints=tkp)
                    if self.rng.random() < 0.5:  # pair-consistent horizontal flip
                        src, tgt, smask, tmask = (
                            np.ascontiguousarray(a[:, ::-1])
                            for a in (src, tgt, smask, tmask))
                        if skp is not None:
                            skp = skp.copy()
                            tkp = tkp.copy()
                            skp[..., 0] *= -1.0  # keypoints live in [-1, 1]
                            tkp[..., 0] *= -1.0
                    # pair-consistent rotate then shift (reference applies rot_aug
                    # then rand_crop to the imgs+masks dict after the flip,
                    # voxceleb2hq_pairs.py:267-287)
                    if self.rot_aug_angle > 0 or (
                            self.shift_limit > 0 and self.rand_shift_prob > 0):
                        kp = (np.stack([skp, tkp]) if skp is not None else None)
                        arrs = (src, tgt, smask, tmask)
                        arrs, kp = random_rotate_pair(arrs, self.rng,
                                                      self.rot_aug_angle,
                                                      keypoints=kp)
                        arrs, kp = random_shift_pair(arrs, self.rng,
                                                     self.shift_limit,
                                                     self.rand_shift_prob,
                                                     keypoints=kp)
                        src, tgt, smask, tmask = arrs
                        if kp is not None:
                            skp, tkp = kp[0], kp[1]
                    if self.augment_color:
                        # one param draw for the pair (reference applies a single
                        # albumentations Compose over source+target)
                        params = sample_jitter_params(self.rng, **self.jitter)
                        src = apply_jitter(src, params)
                        tgt = apply_jitter(tgt, params)
                        if (self.gray_source_prob > 0
                                and self.rng.random() < self.gray_source_prob):
                            src, tgt = to_grayscale3(src), to_grayscale3(tgt)
                    # expression-net stream: elastic warp -> ColorJitter ->
                    # RandomGrayscale(.05), independent per stream (:399-400)
                    out["source_warp_aug"] = random_grayscale(
                        color_jitter(elastic_warp(src, self.rng), self.rng,
                                     **self.warp_jitter), self.rng, p=0.05)
                    out["target_warp_aug"] = random_grayscale(
                        color_jitter(elastic_warp(tgt, self.rng), self.rng,
                                     **self.warp_jitter), self.rng, p=0.05)
                out.update({
                    "source_img": np.ascontiguousarray(src),
                    "target_img": np.ascontiguousarray(tgt),
                    "source_mask": np.ascontiguousarray(smask),
                    "target_mask": np.ascontiguousarray(tmask),
                })
                if skp is not None:
                    out["source_keypoints"] = skp
                    out["target_keypoints"] = tkp
                return out
            except Exception:
                continue
        raise RuntimeError("failed to sample a pair after 10 retries")

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            samples = [self.sample_pair() for _ in range(batch_size)]
            yield {k: np.stack([s[k] for s in samples])
                   for k in samples[0] if all(k in s for s in samples)}


def splice_batches(main: Dict[str, np.ndarray], second: Dict[str, np.ndarray],
                   keep_first: int = 1) -> Dict[str, np.ndarray]:
    """FEED/MEAD batch splicing: keep `keep_first` elements from the main stream and the
    rest from the second (reference train.py:233-249
    `torch.cat([data_dict[k][:1], data_dict_[k][1:]])`)."""
    out = {}
    for k in main:
        if k in second:
            out[k] = np.concatenate([main[k][:keep_first], second[k][keep_first:]])
        else:
            out[k] = main[k]
    return out


class Prefetcher:
    """Background-thread batch prefetching so host sampling/augmentation overlaps
    device compute (the reference relies on torch DataLoader workers for this;
    voxceleb2hq_pairs.py:650-683). Exhaustion of the wrapped stream raises
    StopIteration in the consumer (sentinel-based); close() unblocks the worker."""

    _SENTINEL = object()

    def __init__(self, stream: Iterator, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = False

        def worker():
            try:
                for batch in stream:
                    while not self._stop:
                        try:
                            self._q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stop:
                        return
            finally:
                while not self._stop:
                    try:
                        self._q.put(self._SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            raise StopIteration
        return item

    def close(self):
        self._stop = True


class InterleavedStream:
    """Main stream + optional FEED/MEAD streams with the reference cadence
    (train.py:233-249). Exactly ONE auxiliary stream splices any given batch:

      * even `sec_dataset_every` E (prod E=4): splice at steps where
        `step % (E//2) == 0`, i.e. every E/2 iterations (reference else-branch);
      * odd E: splice at `step % E in {0, E-1}` (the `i%E==0 or (i+1)%E==0` branch);
      * stream choice per splice: MEAD when `mead_every > 0` and the running splice
        counter is NOT a multiple of `mead_every`, otherwise FEED — so FEED fires on
        every `mead_every`-th splice and MEAD on the rest (train.py:233-237). The
        reference only advances the counter on the even-E path; we advance it on
        every splice (the odd-E reference path would otherwise never reach MEAD).
    """

    def __init__(self, main: Iterator, second: Optional[Iterator] = None,
                 third: Optional[Iterator] = None, sec_dataset_every: int = 4,
                 mead_every: int = 0):
        self.main = main
        self.second = second
        self.third = third
        self.sec_every = sec_dataset_every
        self.mead_every = mead_every
        self.step = 0
        self.splice_count = 0

    def __iter__(self):
        return self

    def _should_splice(self) -> bool:
        e = self.sec_every
        if self.second is None and self.third is None or e <= 0:
            return False
        if e % 2 == 0:
            return self.step % max(e // 2, 1) == 0
        return self.step % e in (0, e - 1)

    def __next__(self) -> Dict[str, np.ndarray]:
        batch = next(self.main)
        if self._should_splice():
            use_mead = (self.third is not None and self.mead_every > 0
                        and self.splice_count % self.mead_every != 0)
            aux = self.third if use_mead else self.second
            if aux is None:  # FEED slot but only MEAD supplied
                aux = self.third
            batch = splice_batches(batch, next(aux))
            self.splice_count += 1
        self.step += 1
        return batch
