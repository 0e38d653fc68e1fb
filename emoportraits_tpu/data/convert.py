"""Reference LMDB store -> framework-native store converter.

The reference trains from 128 LMDB environments per dataset root
(`{root}/{i}_lmdb`, datasets/voxceleb2hq_pairs.py:52-54), each with a
`keys_best.pkl` describing train/test clips as (key_start, num_keys) runs
(voxceleb2hq_pairs.py:593-622) and per-frame pickled items carrying
(voxceleb2hq_pairs.py:233-256):

    image           JPEG bytes
    mask            PNG/JPEG bytes
    size            source frame size
    face_scale      float
    keypoints_3d    (68, 3) float
    3dmm            {'param': (62,), 'bbox': (4,)}
    transform_ffhq  {'theta': (2, 3)}  -- normalized-coords FFHQ-align affine

This module decodes that layout with the dependency-free LMDB reader
(data/lmdb_reader.py) and writes the same payload into the framework's stores:
the npz shard format (data/records.py, both splits) and optionally the EMOS2
binary shards the native C++ loader mmaps (data/native.py, train split).

CLI:
    python -m emoportraits_tpu.data.convert --src /data/voxceleb2hq \
        --dst /data/voxceleb2hq_emos --emos --num-envs 128

Security note: the reference items are Python pickles; `pickle.loads` executes
code embedded in malicious files, so only convert stores you trust — the same
exposure the reference's own readers have (voxceleb2hq_pairs.py:235).
"""
from __future__ import annotations

import io
import os
import pickle
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..geometry.point_transforms import parse_3dmm_param
from .lmdb_reader import LMDBReader


def expand_keys(keys_pickle: dict) -> Dict[str, List[List[bytes]]]:
    """keys_best.pkl phases -> per-video lists of frame keys, mirroring the
    reference expansion (voxceleb2hq_pairs.py:593-615): each (key_start, num_keys)
    run becomes keys '%06d'-numbered from key_start's frame index."""
    out: Dict[str, List[List[bytes]]] = {}
    for phase, videos in keys_pickle.items():
        phase_list = []
        for video in videos:
            video_keys: List[bytes] = []
            for key_start, num_keys in video:
                parts = key_start.split("/")
                frame_start = int(parts[-1])
                for i in range(num_keys):
                    parts[-1] = "%06d" % (frame_start + i)
                    video_keys.append("/".join(parts).encode())
            phase_list.append(video_keys)
        out[phase] = phase_list
    return out


def decode_item(raw: bytes) -> Dict[str, np.ndarray]:
    """One pickled LMDB item -> arrays (the reference per-item decode,
    voxceleb2hq_pairs.py:233-256)."""
    from PIL import Image

    item = pickle.loads(raw)
    image = np.asarray(Image.open(io.BytesIO(item["image"])).convert("RGB"),
                       dtype=np.uint8)
    mask = np.asarray(Image.open(io.BytesIO(item["mask"])), dtype=np.uint8)
    if mask.ndim == 3:
        mask = mask[..., 0]
    rot, offset, _shp, _exp = parse_3dmm_param(
        np.asarray(item["3dmm"]["param"], np.float32).reshape(-1))
    p3dmm = np.concatenate([
        rot.reshape(-1), offset.reshape(-1),
        np.asarray(item["3dmm"]["bbox"], np.float32).reshape(-1)[:4],
        np.asarray([item["size"]], np.float32).reshape(-1)[:1],
    ]).astype(np.float32)
    return {
        "frame": image,
        "mask": mask,
        "keypoints": np.asarray(item["keypoints_3d"], np.float32),
        "ffhq_theta": np.asarray(item["transform_ffhq"]["theta"],
                                 np.float32).reshape(2, 3),
        "params_3dmm": p3dmm,
        "face_scale": np.float32(item["face_scale"]),
    }


def clip_from_items(items: Iterable[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-frame decoded items into one clip record."""
    items = list(items)
    return {
        "frames": np.stack([it["frame"] for it in items]),
        "masks": np.stack([it["mask"] for it in items]),
        "keypoints": np.stack([it["keypoints"] for it in items]),
        "ffhq_theta": np.stack([it["ffhq_theta"] for it in items]),
        "params_3dmm": np.stack([it["params_3dmm"] for it in items]),
        "face_scale": np.stack([it["face_scale"] for it in items]),
    }


def convert_reference_root(
    src_root: str,
    dst_root: str,
    *,
    num_envs: int = 128,
    emos: bool = False,
    max_frames_per_clip: int = 0,
    keys_filename: str = "keys_best.pkl",
) -> Tuple[int, int]:
    """Convert `{src_root}/{i}_lmdb` environments into a framework store at
    `dst_root` (npz shards + index.json with the reference train/test split; plus
    EMOS2 shards under `{dst_root}/emos` when `emos=True` so the native C++
    loader can mmap the train split). Missing env dirs are skipped — the
    reference hard-requires all 128, but partial copies are common in practice.
    Returns (clips_converted, frames_converted)."""
    from .records import write_store

    clips: Dict[str, Dict[str, np.ndarray]] = {}
    splits: Dict[str, str] = {}
    n_frames = 0
    for i in range(num_envs):
        env_dir = os.path.join(src_root, f"{i}_lmdb")
        keys_path = os.path.join(env_dir, keys_filename)
        if not os.path.exists(keys_path):
            continue
        with open(keys_path, "rb") as f:
            keys = expand_keys(pickle.load(f))
        reader = LMDBReader(env_dir)
        for phase, videos in keys.items():
            for vi, video_keys in enumerate(videos):
                if max_frames_per_clip > 0:
                    video_keys = video_keys[:max_frames_per_clip]
                items = []
                for k in video_keys:
                    raw = reader.get(k)
                    if raw is None:
                        continue  # the reference resamples on missing keys too
                    items.append(decode_item(raw))
                if not items:
                    continue
                name = f"env{i:03d}_{phase}_{vi:05d}"
                clips[name] = clip_from_items(items)
                splits[name] = "test" if phase == "test" else "train"
                n_frames += len(items)
    if not clips:
        raise FileNotFoundError(f"no convertible LMDB envs under {src_root}")
    write_store(dst_root, clips, splits=splits)
    if emos:
        from .native import write_native_store

        train_clips = {n: c for n, c in clips.items() if splits[n] == "train"}
        write_native_store(os.path.join(dst_root, "emos"), train_clips)
    return len(clips), n_frames


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--src", required=True, help="reference dataset root "
                   "(contains {i}_lmdb environment dirs)")
    p.add_argument("--dst", required=True, help="output store root")
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--emos", action="store_true",
                   help="also write EMOS2 binary shards for the native loader")
    p.add_argument("--max-frames-per-clip", type=int, default=0)
    p.add_argument("--keys-filename", type=str, default="keys_best.pkl")
    args = p.parse_args(argv)
    n_clips, n_frames = convert_reference_root(
        args.src, args.dst, num_envs=args.num_envs, emos=args.emos,
        max_frames_per_clip=args.max_frames_per_clip,
        keys_filename=args.keys_filename)
    print(f"converted {n_clips} clips / {n_frames} frames -> {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
