"""Built-in face-box detection + square crop for raw-image inference.

The reference preprocesses raw photos/frames with an EXTERNAL detector (mediapipe
FaceDetection, notebooks/infer.py:379-403): the detection box is widened
(y0*0.9, y1 extended to y0 + 1.2*h), then `crop_image` (infer.py:301-352) cuts a
square of side (w + h) * scale at the box center — shrunk symmetrically to stay
in-frame (`remove_overflow`, infer.py:245-263) — bicubic-resizes it to
`image_size`, and clips to [0, 1]; for video the center/size ride an EMA
(`use_smoothed_crop`, infer.py:317-327).

Here the detector is our OWN frozen BiSeNet face parser run at a small fixed
resolution, so the serving stack has no external-detector dependency: the box is
the bounding rectangle of the face-interior labels (skin/brows/eyes/ears/nose/
mouth — the region mediapipe's box covers). Any external detector can still be
plugged in through `InferenceWrapper.set_crop_fn`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CelebAMask-HQ label ids 1..13: skin, l/r brow, l/r eye, glasses, l/r ear,
# earring, nose, mouth, u/l lip — the face interior (no neck/cloth/hair/hat),
# matching what an off-the-shelf face DETECTOR box covers.
DETECT_LABELS = tuple(range(1, 14))


def _resize_np(img: np.ndarray, size: Tuple[int, int],
               resample: str = "bilinear") -> np.ndarray:
    """float [0,1] HWC resize via PIL (host-side preprocessing, not jitted)."""
    from PIL import Image

    modes = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}
    out = Image.fromarray(
        (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)).resize(
            (size[1], size[0]), modes[resample])
    return np.asarray(out).astype(np.float32) / 255.0


def _to_float01(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img.astype(np.float32)


class FaceBoxDetector:
    """BiSeNet-driven face box (the mediapipe role, infer.py:379-392).

    Runs the frozen parser once at `detect_size` (one small jitted program,
    compiled once), takes the bounding rectangle of the face-interior labels,
    rescales it to the input resolution, and applies the reference's box widening
    (y0*0.9; y1 -> y0 + 1.2*h capped at H-1).
    """

    def __init__(self, parser_variables, detect_size: int = 256,
                 min_area_frac: float = 1e-3):
        from ..models.face_parsing import BiSeNet, normalize_for_parsing

        net = BiSeNet()
        self.detect_size = detect_size
        self.min_area = min_area_frac * detect_size * detect_size

        def _mask(v, img):  # img (1, D, D, 3) in [0,1]
            logits = net.apply(v, normalize_for_parsing(img))
            labels = jnp.argmax(logits, axis=-1)
            m = jnp.zeros_like(labels, jnp.bool_)
            for i in DETECT_LABELS:
                m = m | (labels == i)
            return m[0]

        self._variables = parser_variables
        self._mask = jax.jit(_mask)

    def __call__(self, image: np.ndarray) -> Optional[np.ndarray]:
        """HWC uint8/float image -> [x0, y0, x1, y1] in input pixels, or None."""
        img = _to_float01(image)
        h, w = img.shape[:2]
        d = self.detect_size
        small = _resize_np(img[..., :3], (d, d))
        mask = np.asarray(self._mask(self._variables, small[None]))
        ys, xs = np.nonzero(mask)
        if ys.size < self.min_area:
            return None
        x0, x1 = xs.min() * (w / d), (xs.max() + 1) * (w / d)
        y0, y1 = ys.min() * (h / d), (ys.max() + 1) * (h / d)
        # reference widening of the raw detection box (infer.py:386-392)
        return np.asarray([x0, y0 * 0.9, x1, min(y0 + (y1 - y0) * 1.2, h - 1)])


def remove_overflow(center: np.ndarray, size: int, w: int, h: int) -> int:
    """Shrink a square (center, size) symmetrically until it fits in (w, h) —
    exact `remove_overflow` semantics (infer.py:245-263): the max edge overflow is
    trimmed from BOTH sides (center preserved), result rounded down to even."""
    x0, y0 = center[0] - size / 2, center[1] - size / 2
    x1, y1 = center[0] + size / 2, center[1] + size / 2
    shift = max(0.0, -x0, -y0, x1 - w, y1 - h)
    out = int((x1 - x0 + y1 - y0) / 2 - 2 * shift)
    return out - out % 2


class FaceCropper:
    """`crop_image` semantics (infer.py:301-352) + optional EMA smoothing for
    video (infer.py:317-327). Stateful: call `reset()` between clips."""

    def __init__(self, image_size: int = 512, scale: float = 1.0,
                 momentum: float = 0.95, fixed_bounding_box: bool = False):
        self.image_size = image_size
        self.scale = scale
        self.momentum = momentum
        self.fixed_bounding_box = fixed_bounding_box
        self.center: Optional[np.ndarray] = None
        self.size: Optional[float] = None

    def reset(self) -> None:
        self.center, self.size = None, None

    def crop(self, image: np.ndarray, box: Optional[np.ndarray],
             smooth: bool = False) -> np.ndarray:
        """HWC image + [x0,y0,x1,y1] box -> (S, S, 3) float32 [0,1] crop.
        box=None falls back to a full-frame center square (the reference emits a
        zeros frame, infer.py:308-312 — a resized full frame degrades gentler)."""
        img = _to_float01(image)[..., :3]
        h, w = img.shape[:2]
        if box is None:
            s = min(h, w)
            center = np.asarray([w / 2, h / 2])
            size = float(s)
        else:
            center = np.asarray([(box[2] + box[0]) // 2, (box[3] + box[1]) // 2],
                                np.float64)
            size = float(box[2] - box[0] + box[3] - box[1]) * self.scale
        if smooth:
            if self.center is None:
                self.center, self.size = center, size
            elif not self.fixed_bounding_box:
                # NOTE the reference's convention: momentum weights the NEW
                # observation (infer.py:323-324)
                self.center = center * self.momentum + self.center * (1 - self.momentum)
                self.size = size * self.momentum + self.size * (1 - self.momentum)
            center, size = self.center, self.size
        center = np.round(center).astype(int)
        size = int(round(size))
        size -= size % 2
        size = remove_overflow(center, size, w, h)
        if size < 2:  # degenerate/out-of-frame box -> full-frame center square
            size = min(h, w) - (min(h, w) % 2)
            center = np.asarray([w // 2, h // 2])
        y0, x0 = center[1] - size // 2, center[0] - size // 2
        crop = img[y0:y0 + size, x0:x0 + size]
        out = _resize_np(crop, (self.image_size, self.image_size), "bicubic")
        return np.clip(out, 0.0, 1.0)


def make_crop_fn(parser_variables, image_size: int = 512, scale: float = 1.0,
                 smooth: bool = False, momentum: float = 0.95,
                 detect_size: int = 256):
    """Detector + cropper composed into an `InferenceWrapper.set_crop_fn`
    callable: raw HWC image (any resolution) -> (S, S, 3) float32 [0,1]."""
    detector = FaceBoxDetector(parser_variables, detect_size=detect_size)
    cropper = FaceCropper(image_size=image_size, scale=scale, momentum=momentum)

    def crop_fn(image: np.ndarray) -> np.ndarray:
        return cropper.crop(image, detector(image), smooth=smooth)

    crop_fn.detector = detector  # type: ignore[attr-defined]
    crop_fn.cropper = cropper  # type: ignore[attr-defined]
    return crop_fn
