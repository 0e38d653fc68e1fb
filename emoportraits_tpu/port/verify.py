"""Weights-parity verification protocol: port -> drive -> PSNR gate.

The BASELINE north star (PSNR >= 35 dB vs reference-generated frames on the
released checkpoint) needs to be a single command the day real artifacts land
(VERDICT r2 #3/#4). This runs exactly that protocol:

    python -m emoportraits_tpu.port.cli verify \
        --stage1 199_model.pth --head-pose head_pose_regressor.pth \
        --frames fixtures/ --psnr-gate 35 [--config cfg.json]

`--frames DIR` layout (the fixture contract):
    source.png                     the avatar source portrait
    driver_XX.png                  driver frames (any number, XX = 00, 01, ...)
    expected_XX.png                the reference implementation's output for
                                   driver XX (e.g. saved from notebooks/infer.py)
    mask.png                       optional source matte; defaults to all-ones

Checkpoints may be torch `.pth` (ported on the fly) or already-ported `.npz`
from this CLI. The drive path mirrors the reference per-frame loop
(notebooks/infer.py:355-638): encode source once, then per driver frame
head-pose theta -> expression -> uv warp -> decode. PSNR is computed per frame
on [0,1] RGB; the command exits nonzero when min PSNR < gate.

Without a --head-pose checkpoint the thetas come from a randomly initialized
regressor — fine for synthetic fixtures whose expected frames were produced the
same way, wrong for real artifacts (a warning is printed).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def checkpoint_fingerprint(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Structural fingerprint of a checkpoint drop: key/param counts per subnet
    prefix plus a canonical sha256 over the sorted key:shape table. Two drops
    with the same fingerprint have byte-for-byte identical STRUCTURE (names +
    shapes; values excluded on purpose — the fingerprint identifies the
    artifact family, the PSNR gate identifies the values). Logged into the
    verify report so a wrong artifact is diagnosable from the report alone.
    Reference structure: models/stage_1/volumetric_avatar/va.py:126-279 (the
    `*_nw` subnet construction that the released state_dict flattens)."""
    import hashlib

    lines: List[str] = []
    n_params = 0
    prefixes: Dict[str, List[int]] = {}
    for k in sorted(sd):
        shape = tuple(int(d) for d in getattr(sd[k], "shape", ()))
        lines.append(f"{k}:{','.join(map(str, shape))}")
        n = 1
        for d in shape:
            n *= d
        n_params += n
        e = prefixes.setdefault(k.split(".")[0], [0, 0])
        e[0] += 1
        e[1] += n
    return {
        "n_keys": len(sd),
        "n_params": int(n_params),
        "sha256": hashlib.sha256("\n".join(lines).encode()).hexdigest(),
        "prefixes": {p: {"n_keys": c, "n_params": int(n)}
                     for p, (c, n) in sorted(prefixes.items())},
    }


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    if isinstance(tree, dict):
        out: Dict[str, Any] = {}
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    return {prefix[:-1]: tree}


def validate_stage1_port(variables: Dict[str, Any], manifest: Dict[str, Any],
                         cfg, strict: bool = False) -> Dict[str, Any]:
    """Manifest contract: every ported leaf must exist in the model's own init
    tree WITH the same shape (`jax.eval_shape` — no compile), so a wrong-config
    or wrong-stage artifact fails fast with a structured report instead of
    mid-drive with an XLA shape error. Missing leaves are reported (the
    reference reloads with strict=False, notebooks/infer.py:110-131, so absence
    alone is a warning unless `strict`); shape mismatches always raise."""
    import jax
    import jax.numpy as jnp

    from ..models.stage1 import VolumetricAvatar

    model = VolumetricAvatar(cfg.model)
    s = cfg.train.image_size
    src = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, s, s, 1), jnp.float32)
    theta = jax.ShapeDtypeStruct((1, 4, 4), jnp.float32)
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              src, mask, src, theta, theta)
    exp = _flatten({k: v for k, v in expected.items() if k != "quant"})
    got = _flatten(variables)

    shape_errors = [
        f"{p}: ported {tuple(np.shape(v))} != expected {tuple(exp[p].shape)}"
        for p, v in got.items()
        if p in exp and tuple(np.shape(v)) != tuple(exp[p].shape)]
    unknown = sorted(p for p in got if p not in exp)
    missing = sorted(p for p in exp if p not in got)
    report = {
        "n_matched": sum(1 for p in got
                         if p in exp and tuple(np.shape(got[p])) == tuple(exp[p].shape)),
        "n_expected": len(exp),
        "shape_errors": shape_errors,
        "unknown_target_paths": unknown,
        "missing_target_paths_n": len(missing),
        "unused_source_keys_n": len(manifest.get("unused_source_keys", [])),
        # model keys the SOURCE checkpoint did not provide, per the porter's
        # own manifest (named to match what it counts — r5 review fix)
        "manifest_missing_target_keys_n": len(
            manifest.get("missing_target_keys", [])),
    }
    if shape_errors or unknown:
        raise ValueError(
            "stage-1 checkpoint violates the port contract (wrong artifact or "
            f"wrong config): {len(shape_errors)} shape mismatches, "
            f"{len(unknown)} unknown paths. First errors: "
            f"{(shape_errors + unknown)[:5]}")
    if strict and missing:
        raise ValueError(
            f"stage-1 checkpoint leaves {len(missing)} model leaves unported "
            f"(strict mode). First: {missing[:5]}")
    return report


def _load_checkpoint(path: str, kind: str, cfg) -> Dict[str, Any]:
    """torch .pth -> ported variables; .npz -> load as saved."""
    from .cli import load_ported

    if path.endswith(".npz"):
        return load_ported(path)
    import torch

    from . import port_head_pose, port_stage1

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    if kind == "stage1":
        fp = checkpoint_fingerprint(sd)
        print(f"stage1 drop fingerprint: {fp['n_keys']} keys, "
              f"{fp['n_params'] / 1e6:.1f}M params, sha256 {fp['sha256'][:16]}")
        variables, manifest = port_stage1(sd, cfg.model)
        # fail fast on a wrong artifact (shape/path contract) before the drive
        contract = validate_stage1_port(variables, manifest, cfg)
        print(f"port contract: {contract['n_matched']}/{contract['n_expected']} "
              f"leaves matched, {contract['missing_target_paths_n']} missing "
              f"(strict=False), {contract['unused_source_keys_n']} unused source keys")
    else:
        variables, manifest = port_head_pose(sd)
    n_missing = len(manifest.get("missing_target_keys", []))
    if n_missing:
        print(f"WARNING: {kind} port has {n_missing} missing target keys "
              f"(strict=False semantics): {manifest['missing_target_keys'][:5]}")
    return variables


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))


def run_verify(stage1: str, frames_dir: str, head_pose: Optional[str] = None,
               psnr_gate: float = 35.0, config: Optional[str] = None,
               report_path: Optional[str] = None) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from ..config import ExperimentConfig
    from ..models.head_pose import HeadPoseRegressor
    from ..models.stage1 import VolumetricAvatar

    cfg = ExperimentConfig.from_json(config) if config else ExperimentConfig()
    model = VolumetricAvatar(cfg.model)
    variables = _load_checkpoint(stage1, "stage1", cfg)

    hp_net = HeadPoseRegressor()
    s = cfg.train.image_size
    if head_pose:
        hp_vars = _load_checkpoint(head_pose, "head_pose", cfg)
    else:
        print("WARNING: no --head-pose checkpoint; thetas from a random "
              "regressor (synthetic fixtures only)")
        hp_vars = jax.jit(hp_net.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, s, s, 3), jnp.float32))
    hp = jax.jit(lambda p, x: hp_net.apply(p, x))

    def load_at_size(path):
        img = _load_image(path)
        if img.shape[:2] != (s, s):
            img = np.asarray(jax.image.resize(jnp.asarray(img), (s, s, 3),
                                              method="linear"))
        return jnp.asarray(img)[None]

    src = load_at_size(os.path.join(frames_dir, "source.png"))
    mask_path = os.path.join(frames_dir, "mask.png")
    if os.path.exists(mask_path):
        mask = jnp.asarray(_load_image(mask_path)[..., :1])[None]
    else:
        mask = jnp.ones((1, s, s, 1), jnp.float32)

    drivers = sorted(f for f in os.listdir(frames_dir)
                     if f.startswith("driver_") and f.endswith(".png"))
    if not drivers:
        raise FileNotFoundError(f"no driver_XX.png frames in {frames_dir}")

    enc = jax.jit(lambda v, s_, m_, t_: model.apply(v, s_, m_, t_,
                                                    method=model.encode_source))
    drv = jax.jit(lambda v, st, d, t: model.apply(v, st, d, t,
                                                  method=model.drive)[0])
    state = enc(variables, src, mask, hp(hp_vars, src))

    per_frame: List[Dict[str, Any]] = []
    for name in drivers:
        idx = name[len("driver_"):-len(".png")]
        expected_path = os.path.join(frames_dir, f"expected_{idx}.png")
        if not os.path.exists(expected_path):
            raise FileNotFoundError(f"missing {expected_path} for {name}")
        d_img = load_at_size(os.path.join(frames_dir, name))
        out = np.asarray(drv(variables, state, d_img, hp(hp_vars, d_img)))[0]
        expected = _load_image(expected_path)
        if expected.shape[:2] != (s, s):
            raise ValueError(f"{expected_path}: expected {s}x{s} frames")
        per_frame.append({"frame": idx, "psnr_db": round(psnr(out, expected), 3)})

    values = [f["psnr_db"] for f in per_frame]
    report = {
        "stage1": stage1,
        "head_pose": head_pose,
        "frames": len(per_frame),
        "psnr_min_db": round(min(values), 3),
        "psnr_mean_db": round(float(np.mean(values)), 3),
        "psnr_gate_db": psnr_gate,
        "pass": bool(min(values) >= psnr_gate),
        "per_frame": per_frame,
    }
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)
    return report


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="emoportraits_tpu.port.cli verify",
        description="port -> drive -> PSNR gate vs reference frames")
    p.add_argument("--stage1", required=True, help=".pth or ported .npz")
    p.add_argument("--frames", required=True, help="fixture dir (see module doc)")
    p.add_argument("--head-pose", default=None, help=".pth or ported .npz")
    p.add_argument("--psnr-gate", type=float, default=35.0)
    p.add_argument("--config", default=None, help="ExperimentConfig JSON")
    p.add_argument("--report", default=None, help="write the JSON report here")
    args = p.parse_args(argv)
    report = run_verify(args.stage1, args.frames, head_pose=args.head_pose,
                        psnr_gate=args.psnr_gate, config=args.config,
                        report_path=args.report)
    print(json.dumps({k: v for k, v in report.items() if k != "per_frame"}))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
