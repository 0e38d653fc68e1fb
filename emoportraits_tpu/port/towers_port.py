"""Porters for the frozen auxiliary towers: head-pose, BiSeNet face parser, LPIPS.

Reference checkpoints these map (not present in this environment, so parity is proven
against torch-built oracle nets with random weights in tests/test_towers_port.py):
  * head-pose: `head_pose_regressor.pth` — a plain torchvision resnet18(num_classes=9)
    state_dict (networks/volumetric_avatar/head_pose_regressor.py:14-16);
  * face parser: `repos/face_par_off/res/cp/79999_iter.pth` — the zllrunning
    face-parsing BiSeNet (ResNet-18 context path, ARMs, FFM, aux heads), loaded by
    networks/volumetric_avatar/face_parcing.py:23-28;
  * LPIPS: the pip `lpips` package's LPIPS(net='alex') state_dict (losses/lpips.py:10)
    — torchvision AlexNet feature slices + per-layer 1x1 linear calibration heads.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .torch_port import Porter, conv2d_kernel, port_resnet, to_np


def port_head_pose(state_dict: Dict[str, Any]):
    """resnet18(num_classes=9) state_dict -> HeadPoseRegressor variables.

    Our HeadPoseRegressor wraps the backbone under module name 'net'
    (models/head_pose.py), so the ported tree is re-rooted there.
    """
    inner, manifest = port_resnet(state_dict, layers=(2, 2, 2, 2), block="basic")
    variables = {"params": {"net": inner["params"]}}
    if "batch_stats" in inner:
        variables["batch_stats"] = {"net": inner["batch_stats"]}
    return variables, manifest


# ------------------------------------------------------------------ BiSeNet (face_par_off)

def _port_cbr(p: Porter, key: str) -> Tuple[Dict, Dict]:
    """ConvBNReLU `X.conv` + `X.bn` -> our flat {conv, bn_scale, bn_bias} params and
    {mean, var} batch stats."""
    params: Dict[str, Any] = {"conv": p.conv(f"{key}.conv")}
    bn_p, bn_s = p.bn(f"{key}.bn")
    params["bn_scale"] = bn_p.get("scale")
    params["bn_bias"] = bn_p.get("bias")
    return params, bn_s


def _port_arm(p: Porter, key: str) -> Tuple[Dict, Dict]:
    cbr_p, cbr_s = _port_cbr(p, f"{key}.conv")
    params = {"conv": cbr_p, "conv_atten": p.conv(f"{key}.conv_atten")}
    bn_p, bn_s = p.bn(f"{key}.bn_atten")
    params["bn_atten_scale"] = bn_p.get("scale")
    params["bn_atten_bias"] = bn_p.get("bias")
    stats = {"conv": cbr_s,
             "atten_mean": bn_s.get("mean"), "atten_var": bn_s.get("var")}
    return params, stats


def port_bisenet(state_dict: Dict[str, Any]):
    """face_par_off BiSeNet (`79999_iter.pth` layout) -> our BiSeNet variables.

    The checkpoint's auxiliary training heads (conv_out16/conv_out32, unused at
    inference — the reference wrapper keeps only y[0], face_parcing.py:60) are consumed
    and reported under manifest['aux_head_keys'] rather than ported.
    """
    p = Porter(state_dict)

    # context-path ResNet-18 trunk: torchvision naming under 'cp.resnet.'
    trunk_sd = {k: v for k, v in state_dict.items() if k.startswith("cp.resnet.")}
    trunk, trunk_man = port_resnet(trunk_sd, layers=(2, 2, 2, 2), block="basic",
                                   prefix="cp.resnet.")
    p.used.update(set(trunk_sd) - set(trunk_man["unused_source_keys"]))
    p.missing.extend(trunk_man["missing_target_keys"])

    params: Dict[str, Any] = {"resnet": trunk["params"]}
    stats: Dict[str, Any] = {"resnet": trunk.get("batch_stats", {})}

    for ours, theirs in (("conv_avg", "cp.conv_avg"),
                         ("conv_head32", "cp.conv_head32"),
                         ("conv_head16", "cp.conv_head16")):
        params[ours], stats[ours] = _port_cbr(p, theirs)
    for ours, theirs in (("arm32", "cp.arm32"), ("arm16", "cp.arm16")):
        params[ours], stats[ours] = _port_arm(p, theirs)

    ffm_p: Dict[str, Any] = {}
    ffm_p["convblk"], ffm_s = _port_cbr(p, "ffm.convblk")
    ffm_p["conv1"] = p.conv("ffm.conv1")
    ffm_p["conv2"] = p.conv("ffm.conv2")
    params["ffm"] = ffm_p
    stats["ffm"] = {"convblk": ffm_s}

    params["conv_out"], stats["conv_out"] = _port_cbr(p, "conv_out.conv")
    params["conv_out_head"] = p.conv("conv_out.conv_out")

    aux: List[str] = []
    for k in list(state_dict):
        if k.startswith(("conv_out16.", "conv_out32.")):
            p.used.add(k)
            aux.append(k)
    manifest = p.manifest()
    manifest["aux_head_keys"] = sorted(aux)
    return {"params": params, "batch_stats": stats}, manifest


# ----------------------------------------------------------------- RT-GENE gaze towers

def port_gaze(state_dict: Dict[str, Any]):
    """RT-GENE `vgg_16_2_forward_sum.pt` (GazeEstimationModelVGG,
    rt_gaze_estimation_models.py:285-321) -> {'left', 'right'} VGGFeatures variables.

    The checkpoint carries two full torchvision-vgg16 feature towers
    (`left_features.{0..30}` / `right_features.{0..30}`); the gaze head
    (xl/xr/concat/fc) is not used by the feature-matching loss and is consumed into
    manifest['aux_head_keys'].
    """
    from ..losses.perceptual import VGG16_STAGES
    from .torch_port import port_vgg_features

    out: Dict[str, Any] = {}
    manifest: Dict[str, Any] = {"unused_source_keys": [], "missing_target_keys": []}
    consumed: set = set()
    for side in ("left", "right"):
        sub = {k: v for k, v in state_dict.items()
               if k.startswith(f"{side}_features.")}
        vars_, man = port_vgg_features(sub, VGG16_STAGES,
                                       prefix=f"{side}_features.")
        out[side] = vars_
        consumed.update(set(sub) - set(man["unused_source_keys"]))
        manifest["missing_target_keys"].extend(man["missing_target_keys"])
    aux: List[str] = []
    for k in state_dict:
        if k.startswith(("xl.", "xr.", "concat.", "fc.")):
            aux.append(k)
        elif k not in consumed:
            manifest["unused_source_keys"].append(k)
    manifest["aux_head_keys"] = sorted(aux)
    manifest["unused_source_keys"] = sorted(
        set(manifest["unused_source_keys"]) - set(aux))
    return out, manifest


# ----------------------------------------------------------------------------- MODNet

def _port_ibnr(p: Porter, key: str, channels: int):
    """Conv2dIBNormRelu `X.layers.0` (conv) + `X.layers.1` (IBNorm) -> our
    {conv, ibn/bnorm} params and stats. Heads without IBNorm just port the conv."""
    params = {"conv": p.conv(f"{key}.layers.0")}
    stats = {}
    if f"{key}.layers.1.bnorm.weight" in p.sd:
        bn_p, bn_s = p.bn(f"{key}.layers.1.bnorm")
        params["ibn"] = {"bnorm": bn_p}
        stats["ibn"] = {"bnorm": bn_s}
    return params, stats


def _port_inverted_residual(p: Porter, key: str):
    """InvertedResidual `X.conv.{i}` Sequential -> conv_{i}/bn_{i+1}; convs sit at
    Sequential indices 0, 3, 6 (ReLU6 at 2, 5; last conv has no trailing ReLU)."""
    params, stats = {}, {}
    i = 0
    while f"{key}.conv.{i}.weight" in p.sd:
        params[f"conv_{i}"] = {
            "kernel": _dw_aware_kernel(to_np(p.take(f"{key}.conv.{i}.weight")))}
        bn_p, bn_s = p.bn(f"{key}.conv.{i + 1}")
        params[f"bn_{i + 1}"] = bn_p
        stats[f"bn_{i + 1}"] = bn_s
        i += 3
    return params, stats


def _dw_aware_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I/g, kH, kW) -> HWIO; depthwise keeps I/g=1."""
    return np.transpose(w, (2, 3, 1, 0))


def port_modnet(state_dict: Dict[str, Any]):
    """MODNet `modnet_photographic_portrait_matting.ckpt` (module. prefix already
    stripped, va_losses_and_visuals.py:1115-1121) -> our models.modnet.MODNet
    variables. Training-only heads (lr_branch.conv_lr semantic head, hr_branch.conv_hr
    detail head) are consumed and reported under manifest['aux_head_keys']."""
    p = Porter(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(ours_path: Tuple[str, ...], pr, st):
        d, s = params, stats
        for seg in ours_path[:-1]:
            d = d.setdefault(seg, {})
            s = s.setdefault(seg, {})
        d[ours_path[-1]] = pr
        if st:
            s[ours_path[-1]] = st

    # ---- backbone (lr_branch.backbone.model.features.{0..18}) ----
    bb = "lr_branch.backbone.model.features"
    bb_params: Dict[str, Any] = {}
    bb_stats: Dict[str, Any] = {}
    for head, idx in (("features_0", 0), ("features_18", 18)):
        bb_params[f"{head}_conv"] = {
            "kernel": _dw_aware_kernel(to_np(p.take(f"{bb}.{idx}.0.weight")))}
        bn_p, bn_s = p.bn(f"{bb}.{idx}.1")
        bb_params[f"{head}_bn"] = bn_p
        bb_stats[f"{head}_bn"] = bn_s
    for idx in range(1, 18):
        ir_p, ir_s = _port_inverted_residual(p, f"{bb}.{idx}")
        bb_params[f"features_{idx}"] = ir_p
        bb_stats[f"features_{idx}"] = ir_s
    params["backbone"] = bb_params
    stats["backbone"] = bb_stats

    # ---- SE block (Linear fc.0 / fc.2, no bias) ----
    params["se_block"] = {
        "fc0": to_np(p.take("lr_branch.se_block.fc.0.weight")).T,
        "fc1": to_np(p.take("lr_branch.se_block.fc.2.weight")).T,
    }

    # ---- LR / HR / fusion IBNorm conv stacks ----
    singles = (("conv_lr16x", "lr_branch.conv_lr16x"),
               ("conv_lr8x", "lr_branch.conv_lr8x"),
               ("tohr_enc2x", "hr_branch.tohr_enc2x"),
               ("conv_enc2x", "hr_branch.conv_enc2x"),
               ("tohr_enc4x", "hr_branch.tohr_enc4x"),
               ("conv_enc4x", "hr_branch.conv_enc4x"),
               ("conv_lr4x", "f_branch.conv_lr4x"),
               ("conv_f2x", "f_branch.conv_f2x"))
    for ours, theirs in singles:
        pr, st = _port_ibnr(p, theirs, 0)
        put((ours,), pr, st)
    for i in range(3):
        pr, st = _port_ibnr(p, f"hr_branch.conv_hr4x.{i}", 0)
        put((f"conv_hr4x_{i}",), pr, st)
    for i in range(4):
        pr, st = _port_ibnr(p, f"hr_branch.conv_hr2x.{i}", 0)
        put((f"conv_hr2x_{i}",), pr, st)
    for i in range(2):
        pr, st = _port_ibnr(p, f"f_branch.conv_f.{i}", 0)
        put((f"conv_f_{i}",), pr, st)

    aux: List[str] = []
    for k in list(state_dict):
        if k.startswith(("lr_branch.conv_lr.", "hr_branch.conv_hr.")):
            p.used.add(k)
            aux.append(k)
    manifest = p.manifest()
    manifest["aux_head_keys"] = sorted(aux)
    return {"params": params, "batch_stats": stats}, manifest


# ------------------------------------------------------------------------------ LPIPS

# lpips alex slice layout: slice index -> (torchvision features index, our conv index)
_LPIPS_SLICES = (("net.slice1.0", "conv0"), ("net.slice2.3", "conv1"),
                 ("net.slice3.6", "conv2"), ("net.slice4.8", "conv3"),
                 ("net.slice5.10", "conv4"))


def port_lpips(state_dict: Dict[str, Any]):
    """lpips.LPIPS(net='alex') state_dict -> our losses.lpips.LPIPS variables.

    lin heads are 1x1 convs `lin{i}.model.1.weight` of shape (1, C, 1, 1) -> our (C,)
    weight vectors. The scaling_layer shift/scale buffers are consumed (our module
    carries them as constants matching the released values).
    """
    p = Porter(state_dict)
    net: Dict[str, Any] = {}
    for torch_key, ours in _LPIPS_SLICES:
        net[ours] = p.conv(torch_key)
    params: Dict[str, Any] = {"net": net}
    for i in range(5):
        w = p.take(f"lin{i}.model.1.weight")
        if w is not None:
            params[f"lin{i}"] = to_np(w).reshape(-1)
    for k in ("scaling_layer.shift", "scaling_layer.scale"):
        if k in p.sd:
            p.used.add(k)
    return {"params": params}, p.manifest()
