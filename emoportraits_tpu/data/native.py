"""ctypes bindings + store writer for the native C++ data loader (native/emodata.cc).

The loader mmaps EMOS1 binary shards and fills float32 batch buffers from a worker
thread pool — replacing the reference's Python LMDB readers + torch DataLoader worker
processes (datasets/voxceleb2hq_pairs.py) with a native host pipeline that feeds
jax.device_put directly. Falls back to the pure-Python PairDataset when the shared
library hasn't been built (`python -m emoportraits_tpu.data.native --build`).
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "emodata.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libemodata.so")

MAGIC = 0x534F4D45  # 'EMOS'


def build_library(force: bool = False) -> str:
    """Compile native/emodata.cc -> libemodata.so (g++ -O3, no external deps)."""
    if os.path.exists(_LIB) and not force \
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _LIB],
        check=True)
    return _LIB


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB):
        try:
            build_library()
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB)
    lib.emod_open.restype = ctypes.c_void_p
    lib.emod_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.emod_num_clips.restype = ctypes.c_int
    lib.emod_num_clips.argtypes = [ctypes.c_void_p]
    fp = ctypes.POINTER(ctypes.c_float)
    lib.emod_sample_pairs.restype = ctypes.c_int
    lib.emod_sample_pairs.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        fp, fp, fp, fp, fp, fp]
    lib.emod_sample_pairs2.restype = ctypes.c_int
    lib.emod_sample_pairs2.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        fp, fp, fp, fp, fp, fp, fp, fp, fp, fp, ctypes.c_int, ctypes.c_float]
    lib.emod_close.argtypes = [ctypes.c_void_p]
    return lib


# optional per-frame geometry payload (EMOS2): flag bit + trailing shape; order
# matters (the C++ reader consumes fields in this sequence)
_V2_FIELDS = (
    ("keypoints", 1, (68, 3)),
    ("ffhq_theta", 2, (2, 3)),
    ("params_3dmm", 4, (17,)),
    ("crop_box", 8, (4,)),
    ("face_scale", 16, ()),
)


def write_native_store(root: str, clips: Dict[str, Dict[str, np.ndarray]],
                       shard_size: int = 8) -> None:
    """Write clips into EMOS binary shards (native-readable). Emits version 2 when any
    clip carries geometry payload beyond keypoints (FFHQ thetas / 3DMM params /
    crop boxes / face scales — the reference per-item payload,
    datasets/voxceleb2hq_pairs.py:233-256), else version 1."""
    os.makedirs(root, exist_ok=True)
    names = sorted(clips)
    version = 2 if any(
        f in clips[n] for n in names for f, _b, _s in _V2_FIELDS[1:]) else 1
    for si in range(0, len(names), shard_size):
        shard_names = names[si:si + shard_size]
        path = os.path.join(root, f"shard_{si // shard_size:05d}.emos")
        with open(path, "wb") as f:
            f.write(struct.pack("<III", MAGIC, version, len(shard_names)))
            for name in shard_names:
                c = clips[name]
                frames = np.ascontiguousarray(c["frames"], np.uint8)
                masks = np.ascontiguousarray(c["masks"], np.uint8)
                t, h, w, _ = frames.shape
                fields = _V2_FIELDS if version == 2 else _V2_FIELDS[:1]
                flags = sum(bit for fname, bit, _s in fields if fname in c)
                f.write(struct.pack("<IIII", t, h, w, flags))
                f.write(frames.tobytes())
                f.write(masks.tobytes())
                for fname, bit, shape in fields:
                    if fname in c:
                        arr = np.ascontiguousarray(c[fname], np.float32)
                        assert arr.shape == (t,) + shape, (fname, arr.shape)
                        f.write(arr.tobytes())


class NativePairLoader:
    """batches() API-compatible with data.pairs.PairDataset, backed by C++ threads."""

    def __init__(self, root: str, image_size: int, *, augment: bool = True,
                 seed: int = 0, num_threads: int = 0,
                 ffhq_size: int = 0, align_scale: float = 1.33):
        self.lib = _load_lib()
        if self.lib is None:
            raise RuntimeError("native loader library unavailable; "
                               "run data.native.build_library()")
        shards = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".emos"))
        if not shards:
            raise FileNotFoundError(f"no .emos shards under {root}")
        blob = b"\0".join(s.encode() for s in shards) + b"\0"
        threads = num_threads or min(8, os.cpu_count() or 1)
        self.handle = self.lib.emod_open(blob, len(shards), threads)
        if not self.handle:
            raise RuntimeError("emod_open failed (corrupt shard?)")
        self.image_size = image_size
        self.augment = augment
        self.seed = seed
        self._step = 0
        # >0 requests FFHQ-aligned target crops at this resolution (stage-2 ground
        # truth; requires the store to carry ffhq_theta — EMOS2 converter output)
        self.ffhq_size = ffhq_size
        self.align_scale = align_scale

    def __del__(self):
        if getattr(self, "handle", None) and getattr(self, "lib", None):
            self.lib.emod_close(self.handle)
            self.handle = None

    @property
    def num_clips(self) -> int:
        return self.lib.emod_num_clips(self.handle)

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        s = self.image_size
        fp = ctypes.POINTER(ctypes.c_float)

        def buf(shape):
            a = np.empty(shape, np.float32)
            return a, a.ctypes.data_as(fp)

        src, p_src = buf((batch_size, s, s, 3))
        tgt, p_tgt = buf((batch_size, s, s, 3))
        smask, p_smask = buf((batch_size, s, s, 1))
        tmask, p_tmask = buf((batch_size, s, s, 1))
        if self.augment:
            src_aug, p_sa = buf((batch_size, s, s, 3))
            tgt_aug, p_ta = buf((batch_size, s, s, 3))
        else:
            src_aug = tgt_aug = None
            p_sa = p_ta = ctypes.cast(None, fp)
        src_kp, p_skp = buf((batch_size, 68, 3))
        tgt_kp, p_tkp = buf((batch_size, 68, 3))
        sf = self.ffhq_size
        if sf > 0:
            ffhq, p_ff = buf((batch_size, sf, sf, 3))
            ffhq_mask, p_ffm = buf((batch_size, sf, sf, 1))
        else:
            ffhq = ffhq_mask = None
            p_ff = p_ffm = ctypes.cast(None, fp)
        rc = self.lib.emod_sample_pairs2(
            self.handle, batch_size, s,
            ctypes.c_uint64(self.seed * 1_000_003 + self._step),
            1 if self.augment else 0,
            p_src, p_tgt, p_smask, p_tmask, p_sa, p_ta,
            p_skp, p_tkp, p_ff, p_ffm, sf, self.align_scale)
        if rc < 0:
            raise RuntimeError(f"emod_sample_pairs2 failed rc={rc}")
        self._step += 1
        out = {"source_img": src, "target_img": tgt,
               "source_mask": smask, "target_mask": tmask}
        if self.augment:
            out["source_warp_aug"] = src_aug
            out["target_warp_aug"] = tgt_aug
        if rc & 1:  # store carries keypoints
            out["source_keypoints"] = src_kp
            out["target_keypoints"] = tgt_kp
        if sf > 0 and (rc & 2):  # store carries FFHQ thetas
            out["target_img_ffhq"] = ffhq
            out["target_mask_ffhq"] = ffhq_mask
        return out

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.sample_batch(batch_size)


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        print(build_library(force=True))
