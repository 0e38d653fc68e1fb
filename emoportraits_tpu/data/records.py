"""Sharded clip-record storage: the framework's native dataset format plus readers.

The reference reads 128 LMDB shards keyed by `keys_best.pkl`
(datasets/voxceleb2hq_pairs.py:52-54, 599); each pickled item carries a JPEG frame +
mask plus the full geometry payload (voxceleb2hq_pairs.py:233-256):
3D keypoints (`keypoints_3d`), 3DMM params (`3dmm.param` -> R/offset via
parse_3dmm_param, `3dmm.bbox` roi box), the FFHQ alignment theta
(`transform_ffhq.theta`, a 2x3 affine that grid-samples the stored frame into the
FFHQ-aligned crop; applied with an extra zoom at datasets/voxceleb2hq_pairs.py:321-348),
`face_scale` and the crop box. Those environment-specific stores don't travel; the
TPU-native pipeline defines a self-describing shard format carrying the SAME payload:

  * a dataset root holds `shard_{i:05d}.npz` files, each containing per-clip arrays:
      {clip}/frames     (T, S, S, 3) uint8
      {clip}/masks      (T, S, S)    uint8
      {clip}/keypoints  (T, 68, 3)   float32   [optional]
      {clip}/ffhq_theta (T, 2, 3)    float32   [optional]
      {clip}/params_3dmm(T, 17)      float32   [optional; R(9)+offset(3)+roi_box(4)+size(1)]
      {clip}/crop_box   (T, 4)       float32   [optional]
      {clip}/face_scale (T,)         float32   [optional]
    plus an `index.json` listing clips per shard and train/test split keys
    (parity with keys['train']/keys['test'], voxceleb2hq_pairs.py:593-622).

Readers are plain Python (host-side); device work stays in the jitted step. The LMDB
adapter lives in data/lmdb_reader.py + data/convert.py (reference-store ingestion).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# optional per-frame geometry fields and their trailing shapes
OPTIONAL_FIELDS: Dict[str, Tuple[int, ...]] = {
    "keypoints": (68, 3),
    "ffhq_theta": (2, 3),
    "params_3dmm": (17,),
    "crop_box": (4,),
    "face_scale": (),
}


@dataclass
class ClipRef:
    shard_path: str
    clip_key: str
    num_frames: int


class ShardedClipStore:
    """Reader over a directory of npz shards + index.json."""

    def __init__(self, root: str, split: str = "train"):
        self.root = root
        with open(os.path.join(root, "index.json")) as f:
            index = json.load(f)
        self.clips: List[ClipRef] = [
            ClipRef(os.path.join(root, e["shard"]), e["clip"], e["num_frames"])
            for e in index[split]
        ]
        self._cache: Dict[str, np.lib.npyio.NpzFile] = {}

    def __len__(self) -> int:
        return len(self.clips)

    def _shard(self, path: str):
        if path not in self._cache:
            self._cache[path] = np.load(path, allow_pickle=False)
        return self._cache[path]

    def frames(self, i: int, frame_ids: Sequence[int]):
        ref = self.clips[i]
        z = self._shard(ref.shard_path)
        out = {
            "frames": z[f"{ref.clip_key}/frames"][list(frame_ids)],
            "masks": z[f"{ref.clip_key}/masks"][list(frame_ids)],
        }
        for name in OPTIONAL_FIELDS:
            key = f"{ref.clip_key}/{name}"
            if key in z.files:
                out[name] = z[key][list(frame_ids)]
        return out


def write_store(root: str, clips: Dict[str, Dict[str, np.ndarray]],
                test_fraction: float = 0.1, shard_size: int = 8,
                splits: Optional[Dict[str, str]] = None) -> None:
    """Write clips into the shard format (tooling for dataset conversion).
    `splits` optionally pins each clip name to 'train'/'test' (the converter
    propagates the reference keys_best.pkl phases); otherwise every
    1/test_fraction-th clip goes to test."""
    os.makedirs(root, exist_ok=True)
    names = sorted(clips)
    index = {"train": [], "test": []}
    for si in range(0, len(names), shard_size):
        shard_names = names[si:si + shard_size]
        shard_file = f"shard_{si // shard_size:05d}.npz"
        payload = {}
        for name in shard_names:
            clip = clips[name]
            payload[f"{name}/frames"] = clip["frames"]
            payload[f"{name}/masks"] = clip["masks"]
            for field in OPTIONAL_FIELDS:
                if field in clip:
                    payload[f"{name}/{field}"] = np.asarray(clip[field], np.float32)
        np.savez(os.path.join(root, shard_file), **payload)
        for j, name in enumerate(shard_names):
            if splits is not None:
                split = splits.get(name, "train")
            else:
                split = "test" if (si + j) % max(
                    int(1 / max(test_fraction, 1e-9)), 1) == 0 else "train"
            index[split].append({
                "shard": shard_file, "clip": name,
                "num_frames": int(clips[name]["frames"].shape[0]),
            })
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump(index, f)


def make_synthetic_store(root: str, num_clips: int = 6, frames_per_clip: int = 8,
                         image_size: int = 64, seed: int = 0,
                         with_geometry: bool = False) -> None:
    """Deterministic synthetic 'head' clips (moving colored blobs) so the full train
    loop and benchmarks run without the proprietary datasets. `with_geometry` adds
    plausible FFHQ thetas / 3DMM params / crop boxes (the reference per-item payload)
    so the stage-2 FFHQ-crop path can be exercised end-to-end."""
    rng = np.random.default_rng(seed)
    clips = {}
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    for c in range(num_clips):
        base = rng.random(3).astype(np.float32)
        cx0, cy0 = rng.uniform(0.3, 0.7, 2)
        frames = np.zeros((frames_per_clip, image_size, image_size, 3), np.uint8)
        masks = np.zeros((frames_per_clip, image_size, image_size), np.uint8)
        kps = np.zeros((frames_per_clip, 68, 3), np.float32)
        thetas = np.zeros((frames_per_clip, 2, 3), np.float32)
        p3dmm = np.zeros((frames_per_clip, 17), np.float32)
        crop_boxes = np.zeros((frames_per_clip, 4), np.float32)
        fscales = np.zeros((frames_per_clip,), np.float32)
        for t in range(frames_per_clip):
            cx = cx0 + 0.1 * np.sin(t / 3 + c)
            cy = cy0 + 0.1 * np.cos(t / 4 + c)
            r2 = (xx - cx) ** 2 + (yy - cy) ** 2
            blob = np.exp(-r2 / 0.03)
            img = blob[..., None] * base + 0.1 * rng.random(3)
            frames[t] = np.clip(img * 255, 0, 255).astype(np.uint8)
            masks[t] = (blob > 0.3).astype(np.uint8) * 255
            ang = np.linspace(0, 2 * np.pi, 68, endpoint=False)
            kps[t] = np.stack([
                (cx - 0.5) * 2 + 0.3 * np.cos(ang),
                (cy - 0.5) * 2 + 0.3 * np.sin(ang),
                0.1 * np.sin(ang * 2),
            ], axis=-1)
            # FFHQ theta recentering the blob with a mild zoom: a real theta maps
            # the identity grid to crop coordinates, here grid*0.8 + blob offset
            thetas[t] = np.array([[0.8, 0.0, (cx - 0.5) * 2.0],
                                  [0.0, 0.8, (cy - 0.5) * 2.0]], np.float32)
            R = np.eye(3, dtype=np.float32).reshape(-1)
            p3dmm[t, :9] = R
            p3dmm[t, 9:12] = [cx, cy, 0.0]
            p3dmm[t, 12:16] = [0.1, 0.1, 0.9, 0.9]     # roi box
            p3dmm[t, 16] = image_size
            crop_boxes[t] = [0.0, 0.0, 1.0, 1.0]
            fscales[t] = 0.8
        clips[f"clip_{c:03d}"] = {"frames": frames, "masks": masks, "keypoints": kps}
        if with_geometry:
            clips[f"clip_{c:03d}"].update({
                "ffhq_theta": thetas, "params_3dmm": p3dmm,
                "crop_box": crop_boxes, "face_scale": fscales})
    write_store(root, clips)
