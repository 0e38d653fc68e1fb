"""Checkpoint-porting CLI.

    python -m emoportraits_tpu.port.cli stage1 /path/to/..._model.pth out_dir
    python -m emoportraits_tpu.port.cli stage2 /path/to/s2_model.pth out_dir
    python -m emoportraits_tpu.port.cli bisenet /path/to/79999_iter.pth out_dir
    python -m emoportraits_tpu.port.cli head_pose /path/to/head_pose_regressor.pth out_dir
    python -m emoportraits_tpu.port.cli modnet /path/to/modnet_*.ckpt out_dir
    python -m emoportraits_tpu.port.cli gaze /path/to/vgg_16_2_forward_sum.pt out_dir
    python -m emoportraits_tpu.port.cli lpips /path/to/lpips_alex.pth out_dir
    python -m emoportraits_tpu.port.cli verify --stage1 X.pth --frames dir/  # PSNR gate

Loads the torch state_dict (CPU), ports it to flax variables, prints the
unmatched-key manifest, and writes `<name>.npz` (flattened param tree; load with
`load_ported`). `module.`-prefixed keys (DataParallel saves, e.g. MODNet's released
ckpt — reference va_losses_and_visuals.py:1115-1121) are stripped automatically.
"""
from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        d = tree
        parts = key.split("/")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return tree


def save_ported(variables: Any, path: str) -> None:
    np.savez(path, **_flatten(variables))


def load_ported(path: str) -> Dict[str, Any]:
    z = np.load(path, allow_pickle=False)
    return _unflatten({k: z[k] for k in z.files})


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] == "verify":
        # weights-parity protocol: port -> drive -> PSNR gate (port/verify.py)
        from .verify import main as verify_main

        return verify_main(argv[1:])
    if len(argv) != 3:
        print(__doc__)
        return 2
    kind, ckpt_path, out_dir = argv
    import torch

    from ..config import ExperimentConfig
    from . import (
        port_bisenet,
        port_gaze,
        port_head_pose,
        port_lpips,
        port_modnet,
        port_stage1,
        port_stage2,
    )

    sd = torch.load(ckpt_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}

    cfg = ExperimentConfig()
    porters = {
        "stage1": lambda: port_stage1(sd, cfg.model),
        "stage2": lambda: port_stage2(sd, cfg.stage2),
        "bisenet": lambda: port_bisenet(sd),
        "head_pose": lambda: port_head_pose(sd),
        "modnet": lambda: port_modnet(sd),
        "gaze": lambda: port_gaze(sd),
        "lpips": lambda: port_lpips(sd),
    }
    if kind not in porters:
        print(f"unknown kind {kind!r}; one of {sorted(porters)}")
        return 2
    variables, manifest = porters[kind]()
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{kind}.npz")
    save_ported(variables, out_path)
    with open(os.path.join(out_dir, f"{kind}_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    n_unused = len(manifest.get("unused_source_keys", []))
    n_missing = len(manifest.get("missing_target_keys", []))
    print(f"ported {kind} -> {out_path}")
    print(f"unused source keys: {n_unused}, missing target keys: {n_missing}")
    if n_missing:
        print("  missing:", manifest["missing_target_keys"][:10])
    return 0 if n_missing == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
