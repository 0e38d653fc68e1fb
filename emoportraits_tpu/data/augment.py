"""Host-side (numpy) augmentations for the pair datasets.

Reference parity (datasets/voxceleb2hq_pairs.py):
  * color jitter / grayscale / flip (albumentations pipeline, :89-126) -> numpy
    equivalents here;
  * geometric crop augmentation (:421-483);
  * DeepFaceLab-style elastic warp (`augment_via_warp`, :485-511) producing the
    `source/target_warp_aug` images that feed the expression net during training.

All run in the input-pipeline worker processes on uint8 numpy arrays; nothing here is
traced by XLA.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    """Vectorized RGB->HSV on float [0,1] HWC arrays (colorsys conventions)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    v = maxc
    rng_ = maxc - minc
    s = np.where(maxc > 0, rng_ / np.maximum(maxc, 1e-12), 0.0)
    safe = np.maximum(rng_, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = np.where(maxc == r, bc - gc,
                 np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(rng_ > 0, (h / 6.0) % 1.0, 0.0)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int64) % 6
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([r, g, b], axis=-1)


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.1, contrast: float = 0.1,
                 saturation: float = 0.1, hue: float = 0.0,
                 p: float = 1.0) -> np.ndarray:
    """torchvision/albumentations ColorJitter semantics on float [0,1] HWC images:
    factors drawn uniform in [max(0, 1-x), 1+x] (hue shift in [-hue, hue] turns),
    the four adjustments applied in a RANDOM ORDER with per-op clamping, the whole
    transform applied with probability p. Prod strengths come from aug_color_coef
    (reference voxceleb2hq_pairs.py:91-95: hue .03c, brightness .06*max(1, c/2),
    contrast/saturation .03c, p=0.8; c=10 => ~0.3 each)."""
    params = sample_jitter_params(rng, brightness, contrast, saturation, hue, p)
    return apply_jitter(img, params)


def sample_jitter_params(rng: np.random.Generator, brightness: float,
                         contrast: float, saturation: float, hue: float,
                         p: float = 1.0):
    """Draw one set of jitter factors (or None when the p-gate skips). One draw
    shared across frames reproduces the reference's pair-consistent albumentations
    Compose call (voxceleb2hq_pairs.py:264-266: one `self.aug(**imgs_dict)` over
    source+target via additional_targets)."""
    if p < 1.0 and rng.random() >= p:
        return None
    fb = rng.uniform(max(0.0, 1.0 - brightness), 1.0 + brightness) \
        if brightness > 0 else 1.0
    fc = rng.uniform(max(0.0, 1.0 - contrast), 1.0 + contrast) \
        if contrast > 0 else 1.0
    fs = rng.uniform(max(0.0, 1.0 - saturation), 1.0 + saturation) \
        if saturation > 0 else 1.0
    fh = rng.uniform(-hue, hue) if hue > 0 else 0.0
    return fb, fc, fs, fh, rng.permutation(4)


def apply_jitter(img: np.ndarray, params) -> np.ndarray:
    if params is None:
        return img
    fb, fc, fs, fh, order = params
    out = img.astype(np.float32)
    for op in order:
        if op == 0 and fb != 1.0:
            out = np.clip(out * fb, 0.0, 1.0)
        elif op == 1 and fc != 1.0:
            # torch blends toward the MEAN OF THE GRAYSCALE image
            gm = np.float32((out @ _GRAY_W).mean())
            out = np.clip((out - gm) * fc + gm, 0.0, 1.0)
        elif op == 2 and fs != 1.0:
            g = (out @ _GRAY_W)[..., None]
            out = np.clip((out - g) * fs + g, 0.0, 1.0)
        elif op == 3 and fh != 0.0:
            hsv = _rgb_to_hsv(out)
            hsv[..., 0] = (hsv[..., 0] + fh) % 1.0
            out = np.clip(_hsv_to_rgb(hsv), 0.0, 1.0)
    return out


def to_grayscale3(img: np.ndarray) -> np.ndarray:
    g = img @ _GRAY_W.astype(img.dtype)
    return np.repeat(g[..., None], 3, axis=-1)


def random_grayscale(img: np.ndarray, rng: np.random.Generator,
                     p: float = 0.05) -> np.ndarray:
    if rng.random() < p:
        return to_grayscale3(img)
    return img


def random_flip_pair(arrays: Tuple[np.ndarray, ...], rng: np.random.Generator,
                     p: float = 0.5) -> Tuple[np.ndarray, ...]:
    """Horizontal flip applied consistently to a (source, target, masks...) tuple."""
    if rng.random() < p:
        return tuple(a[..., ::-1, :] if a.ndim >= 3 else a for a in arrays)
    return arrays


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized numpy bilinear resize, half-pixel centers (PIL/jax 'linear'
    semantics) — replaces integer-index subsampling, which aliases on downscale."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * w / out_w - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    out = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx
    return out.astype(img.dtype)


def geometric_crop(
    img: np.ndarray,
    mask: np.ndarray,
    rng: np.random.Generator,
    keypoints: Optional[np.ndarray] = None,
    face_scale: float = 1.0,
    min_scale: float = 0.67,
):
    """Random square crop-zoom (reference preprocess_data,
    voxceleb2hq_pairs.py:421-483): scale drawn in [MIN_SCALE/face_scale, 1], random
    top-left translation, crop + bilinear resize back; keypoints are remapped into the
    crop's [-1, 1] frame with the same affine (:457-461). Returns (img, mask,
    keypoints)."""
    h, w = img.shape[:2]
    if face_scale < min_scale:
        return img, mask, keypoints
    lo = min_scale / face_scale
    scale = rng.random() * (1 - lo) + lo
    tx = rng.random() * (1 - scale)
    ty = rng.random() * (1 - scale)
    x0, y0 = int(round(w * tx)), int(round(h * ty))
    x1, y1 = int(round(w * (tx + scale))), int(round(h * (ty + scale)))
    img = bilinear_resize(img[y0:y1, x0:x1], h, w)
    mask = bilinear_resize(mask[y0:y1, x0:x1], h, w)
    if keypoints is not None:
        kp = keypoints.astype(np.float32).copy()
        # keypoints arrive in [-1, 1]; map through the crop box
        u = (kp[..., 0] + 1.0) / 2.0
        v = (kp[..., 1] + 1.0) / 2.0
        kp[..., 0] = ((u - tx) / scale) * 2.0 - 1.0
        kp[..., 1] = ((v - ty) / scale) * 2.0 - 1.0
        if kp.shape[-1] > 2:
            kp[..., 2] = kp[..., 2] / scale
        keypoints = kp
    return img, mask, keypoints


def _affine_sample(img: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Bilinear resample of HWC `img` through the 2x3 inverse affine `mat`
    (output pixel -> source pixel), zero border (albumentations border_mode=0)."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = mat[0, 0] * xx + mat[0, 1] * yy + mat[0, 2]
    sy = mat[1, 0] * xx + mat[1, 1] * yy + mat[1, 2]
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    out = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
           + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)
    return (out * inside).astype(img.dtype)


def ffhq_align_warp(img: np.ndarray, theta: np.ndarray, out_size: int,
                    align_scale: float = 1.33) -> np.ndarray:
    """FFHQ-aligned crop from the stored per-frame theta (2x3, normalized coords).

    Mirrors the reference align block (datasets/voxceleb2hq_pairs.py:321-348):
    theta_ = [theta; 0 0 1] @ diag(align_scale, align_scale, 1), then
    F.grid_sample(img, identity_grid @ theta_[:2]^T) with align_corners=False and
    zero padding. Output pixel (oy, ox) -> normalized (u, v) -> theta(u*s, v*s, 1)
    -> source pixel. Works on HWC float images and HW1 masks."""
    h, w = img.shape[:2]
    S = out_size
    idx = (2.0 * np.arange(S, dtype=np.float32) + 1.0) / S - 1.0
    u = idx[None, :] * align_scale           # (1, S)
    v = idx[:, None] * align_scale           # (S, 1)
    sx_n = theta[0, 0] * u + theta[0, 1] * v + theta[0, 2]
    sy_n = theta[1, 0] * u + theta[1, 1] * v + theta[1, 2]
    # unnormalize (align_corners=False): px = ((x + 1) * size - 1) / 2
    sx = ((sx_n + 1.0) * w - 1.0) * 0.5
    sy = ((sy_n + 1.0) * h - 1.0) * 0.5
    inside = ((sx >= -1) & (sx <= w) & (sy >= -1) & (sy <= h))[..., None]
    sx = np.clip(sx, 0, w - 1)
    sy = np.clip(sy, 0, h - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    out = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
           + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)
    return (out * inside).astype(np.float32)


def random_rotate_pair(arrays: Tuple[np.ndarray, ...], rng: np.random.Generator,
                       limit_deg: float,
                       keypoints: Optional[np.ndarray] = None):
    """Consistent random rotation of (img, mask, ...) about the center, zero fill
    (reference `rot_aug` A.Rotate(limit=rot_aug_angle, value=0),
    voxceleb2hq_pairs.py:106-109,267-276; prod rot_aug_angle=0 -> off). Unlike the
    reference compose (which has no keypoint_params), keypoints in [-1,1] are
    remapped through the same rotation so downstream keypoint losses stay valid."""
    if limit_deg <= 0:
        return arrays, keypoints
    ang = np.deg2rad(rng.uniform(-limit_deg, limit_deg))
    c, s = np.cos(ang), np.sin(ang)
    h, w = arrays[0].shape[:2]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # inverse map: rotate output coords by -ang about the center
    inv = np.array([[c, s, cx - c * cx - s * cy],
                    [-s, c, cy + s * cx - c * cy]], np.float32)
    out = tuple(_affine_sample(a, inv) for a in arrays)
    if keypoints is not None:
        kp = keypoints.astype(np.float32).copy()
        u, v = kp[..., 0].copy(), kp[..., 1].copy()  # [-1,1], square frame
        kp[..., 0] = c * u - s * v
        kp[..., 1] = s * u + c * v
        keypoints = kp
    return out, keypoints


def random_shift_pair(arrays: Tuple[np.ndarray, ...], rng: np.random.Generator,
                      shift_limit: float, p: float,
                      keypoints: Optional[np.ndarray] = None):
    """Consistent random translation by up to `shift_limit` of the side length,
    zero fill (reference `rand_crop` A.ShiftScaleRotate(shift_limit, scale=0,
    rotate=0, border_mode=0, p=rand_shift_prob), voxceleb2hq_pairs.py:111-117,
    278-287; prod rand_shift_prob=0 -> off). Keypoints are remapped."""
    if shift_limit <= 0 or rng.random() >= p:
        return arrays, keypoints
    h, w = arrays[0].shape[:2]
    dx = rng.uniform(-shift_limit, shift_limit) * w
    dy = rng.uniform(-shift_limit, shift_limit) * h
    inv = np.array([[1.0, 0.0, -dx], [0.0, 1.0, -dy]], np.float32)
    out = tuple(_affine_sample(a, inv) for a in arrays)
    if keypoints is not None:
        kp = keypoints.astype(np.float32).copy()
        kp[..., 0] = kp[..., 0] + 2.0 * dx / w
        kp[..., 1] = kp[..., 1] + 2.0 * dy / h
        keypoints = kp
    return out, keypoints


def elastic_warp(img: np.ndarray, rng: np.random.Generator,
                 grid: int = 5, magnitude: float = 0.05) -> np.ndarray:
    """DeepFaceLab-style random elastic warp (reference augment_via_warp,
    voxceleb2hq_pairs.py:485-511): a coarse random displacement grid is upsampled to a
    dense flow and the image is bilinearly resampled. Returns the warped image used as
    the expression-net input (source/target_warp_aug)."""
    h, w = img.shape[:2]
    disp = rng.uniform(-magnitude, magnitude, (2, grid, grid)).astype(np.float32)
    # upsample coarse grid to dense flow with bilinear interpolation
    ys = np.linspace(0, grid - 1, h, dtype=np.float32)
    xs = np.linspace(0, grid - 1, w, dtype=np.float32)
    y0 = np.clip(np.floor(ys).astype(int), 0, grid - 2)
    x0 = np.clip(np.floor(xs).astype(int), 0, grid - 2)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]

    def up(d):
        a = d[y0][:, x0]
        b = d[y0][:, x0 + 1]
        c = d[y0 + 1][:, x0]
        e = d[y0 + 1][:, x0 + 1]
        return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + e * wy * wx

    flow_y = up(disp[0]) * h
    flow_x = up(disp[1]) * w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    sy = np.clip(yy + flow_y, 0, h - 1)
    sx = np.clip(xx + flow_x, 0, w - 1)
    y0i = np.floor(sy).astype(int)
    x0i = np.floor(sx).astype(int)
    y1i = np.minimum(y0i + 1, h - 1)
    x1i = np.minimum(x0i + 1, w - 1)
    fy = (sy - y0i)[..., None]
    fx = (sx - x0i)[..., None]
    out = (img[y0i, x0i] * (1 - fy) * (1 - fx) + img[y0i, x1i] * (1 - fy) * fx
           + img[y1i, x0i] * fy * (1 - fx) + img[y1i, x1i] * fy * fx)
    return out.astype(img.dtype)
