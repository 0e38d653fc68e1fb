"""Still-image and video-frame datasets.

Reference: datasets/ffhq_crops.py (FFHQ stills used as an auxiliary image stream) and
datasets/infer_dataset.py (sequential video-frame dataset for inference). Both are thin
readers; here they share the clip-store formats (records.py npz / native.py EMOS1) or a
plain image directory.
"""
from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np


class StillsDataset:
    """Single-frame samples (source == target identity stills, FFHQ-style)."""

    def __init__(self, root: str, image_size: int, seed: int = 0):
        from PIL import Image

        self._Image = Image
        exts = (".png", ".jpg", ".jpeg")
        self.paths: List[str] = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.lower().endswith(exts))
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.image_size = image_size
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def _load(self, path: str) -> np.ndarray:
        img = self._Image.open(path).convert("RGB").resize(
            (self.image_size, self.image_size))
        return np.asarray(img, np.float32) / 255.0

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        """Still batches: the same frame serves as source and target (the reference
        uses FFHQ crops for identity-rich self-reconstruction)."""
        while True:
            idx = self.rng.integers(0, len(self.paths), batch_size)
            imgs = np.stack([self._load(self.paths[i]) for i in idx])
            ones = np.ones_like(imgs[..., :1])
            yield {"source_img": imgs, "target_img": imgs,
                   "source_mask": ones, "target_mask": ones}


class VideoFrameDataset:
    """Ordered frames of one driving video (reference infer_dataset.py): iterate a
    directory of frames for streaming inference."""

    def __init__(self, frames_dir: str, image_size: Optional[int] = None):
        from PIL import Image

        self._Image = Image
        exts = (".png", ".jpg", ".jpeg")
        self.paths = sorted(
            os.path.join(frames_dir, f) for f in os.listdir(frames_dir)
            if f.lower().endswith(exts))
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        for p in self.paths:
            img = self._Image.open(p).convert("RGB")
            if self.image_size:
                img = img.resize((self.image_size, self.image_size))
            yield np.asarray(img, np.uint8)
