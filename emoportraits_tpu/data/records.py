"""Sharded clip-record storage: the framework's native dataset format plus readers.

The reference reads 128 LMDB shards of JPEG frames + masks + 3D keypoints + 3DMM params
+ FFHQ-align thetas, keyed by `keys_best.pkl` (datasets/voxceleb2hq_pairs.py:52-54,
233-256, 599). Those environment-specific stores don't travel; the TPU-native pipeline
defines a simple self-describing shard format instead:

  * a dataset root holds `shard_{i:05d}.npz` files, each containing per-clip arrays:
      {clip}/frames   (T, S, S, 3) uint8
      {clip}/masks    (T, S, S)    uint8
      {clip}/keypoints(T, 68, 3)   float32   [optional]
    plus an `index.json` listing clips per shard and train/test split keys
    (parity with keys['train']/keys['test'], voxceleb2hq_pairs.py:593-622).

Readers are plain Python (host-side); device work stays in the jitted step. An LMDB
adapter can be added where lmdb is available — the Dataset API below is storage-agnostic.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


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
        kp_key = f"{ref.clip_key}/keypoints"
        if kp_key in z.files:
            out["keypoints"] = z[kp_key][list(frame_ids)]
        return out


def write_store(root: str, clips: Dict[str, Dict[str, np.ndarray]],
                test_fraction: float = 0.1, shard_size: int = 8) -> None:
    """Write clips into the shard format (tooling for dataset conversion)."""
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
            if "keypoints" in clip:
                payload[f"{name}/keypoints"] = clip["keypoints"]
        np.savez(os.path.join(root, shard_file), **payload)
        for j, name in enumerate(shard_names):
            split = "test" if (si + j) % max(int(1 / max(test_fraction, 1e-9)), 1) == 0 \
                else "train"
            index[split].append({
                "shard": shard_file, "clip": name,
                "num_frames": int(clips[name]["frames"].shape[0]),
            })
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump(index, f)


def make_synthetic_store(root: str, num_clips: int = 6, frames_per_clip: int = 8,
                         image_size: int = 64, seed: int = 0) -> None:
    """Deterministic synthetic 'head' clips (moving colored blobs) so the full train
    loop and benchmarks run without the proprietary datasets."""
    rng = np.random.default_rng(seed)
    clips = {}
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    for c in range(num_clips):
        base = rng.random(3).astype(np.float32)
        cx0, cy0 = rng.uniform(0.3, 0.7, 2)
        frames = np.zeros((frames_per_clip, image_size, image_size, 3), np.uint8)
        masks = np.zeros((frames_per_clip, image_size, image_size), np.uint8)
        kps = np.zeros((frames_per_clip, 68, 3), np.float32)
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
        clips[f"clip_{c:03d}"] = {"frames": frames, "masks": masks, "keypoints": kps}
    write_store(root, clips)
