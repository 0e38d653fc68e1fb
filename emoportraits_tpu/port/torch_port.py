"""PyTorch checkpoint -> JAX param-tree porting.

The reference's weights live in torch `state_dict`s (`logs/*_model.pth`, torchvision
backbones, VGG towers; loaded `strict=False` at notebooks/infer.py:110-131). This module
provides the dtype/layout converters plus structured porters for the backbone families,
and returns an explicit manifest of unmatched keys — deliberate `strict=False` parity
(SURVEY.md §7 hard parts).

Layout conventions:
  * Conv2d weight (out, in, kh, kw)    -> flax kernel (kh, kw, in, out)
  * Conv3d weight (out, in, kd, kh, kw)-> (kd, kh, kw, in, out)
  * Linear weight (out, in)            -> (in, out)
  * BatchNorm running stats            -> `batch_stats` {mean, var}; affine -> scale/bias
  * GroupNorm weight/bias              -> scale/bias
  * spectral-norm reparam (weight_orig, weight_u) -> kernel=weight_orig, sn_state u.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv2d_kernel(w) -> np.ndarray:
    return np.transpose(to_np(w), (2, 3, 1, 0))


def conv3d_kernel(w) -> np.ndarray:
    return np.transpose(to_np(w), (2, 3, 4, 1, 0))


def linear_kernel(w) -> np.ndarray:
    return to_np(w).T


class Porter:
    """Accumulates a flax param tree from a torch state_dict, tracking consumed keys."""

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd = {k: v for k, v in state_dict.items()}
        self.used: set = set()
        self.missing: List[str] = []

    def take(self, key: str):
        if key in self.sd:
            self.used.add(key)
            return self.sd[key]
        self.missing.append(key)
        return None

    def conv(self, key: str, ndim: int = 2) -> Dict[str, np.ndarray]:
        w = self.take(f"{key}.weight")
        out = {}
        if w is not None:
            out["kernel"] = conv2d_kernel(w) if ndim == 2 else conv3d_kernel(w)
        b = self.sd.get(f"{key}.bias")
        if b is not None:
            self.used.add(f"{key}.bias")
            out["bias"] = to_np(b)
        return out

    def linear(self, key: str) -> Dict[str, np.ndarray]:
        w = self.take(f"{key}.weight")
        out = {}
        if w is not None:
            out["kernel"] = linear_kernel(w)
        b = self.sd.get(f"{key}.bias")
        if b is not None:
            self.used.add(f"{key}.bias")
            out["bias"] = to_np(b)
        return out

    def bn(self, key: str) -> Tuple[Dict, Dict]:
        """Returns (params {scale,bias}, batch_stats {mean,var})."""
        params, stats = {}, {}
        for src, dst, d in ((f"{key}.weight", "scale", params),
                            (f"{key}.bias", "bias", params),
                            (f"{key}.running_mean", "mean", stats),
                            (f"{key}.running_var", "var", stats)):
            v = self.take(src)
            if v is not None:
                d[dst] = to_np(v)
        return params, stats

    def gn(self, key: str) -> Dict[str, np.ndarray]:
        out = {}
        for src, dst in ((f"{key}.weight", "scale"), (f"{key}.bias", "bias")):
            v = self.take(src)
            if v is not None:
                out[dst] = to_np(v)
        return out

    def manifest(self) -> Dict[str, List[str]]:
        unused = sorted(set(self.sd) - self.used)
        return {"unused_source_keys": unused, "missing_target_keys": self.missing}


# --------------------------------------------------------------------- ResNet family

def port_resnet(state_dict: Dict[str, Any], layers: Tuple[int, ...],
                block: str = "basic", prefix: str = "", norm: str = "bn"):
    """torchvision ResNet state_dict -> our models.backbones.resnet.ResNet variables.

    Returns ({'params': ..., 'batch_stats': ...}, manifest).
    """
    p = Porter(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(flax_name: str, torch_key: str):
        if norm == "bn":
            n_params, n_stats = p.bn(torch_key)
            params[flax_name] = {"bn": n_params}
            if n_stats:
                stats[flax_name] = {"bn": n_stats}
        else:
            params[flax_name] = {"gn": p.gn(torch_key)}

    params["conv1"] = p.conv(prefix + "conv1")
    put_norm("bn1", prefix + "bn1")

    expansion = 1 if block == "basic" else 4
    n_convs = 2 if block == "basic" else 3
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            name = f"layer{li}_{bi}"
            tp = f"{prefix}layer{li}.{bi}."
            blk_params: Dict[str, Any] = {}
            blk_stats: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                blk_params[f"conv{ci}"] = p.conv(tp + f"conv{ci}")
                if norm == "bn":
                    np_, ns_ = p.bn(tp + f"bn{ci}")
                    blk_params[f"bn{ci}"] = {"bn": np_}
                    if ns_:
                        blk_stats[f"bn{ci}"] = {"bn": ns_}
                else:
                    blk_params[f"bn{ci}"] = {"gn": p.gn(tp + f"bn{ci}")}
            if f"{tp}downsample.0.weight" in p.sd:
                blk_params["downsample_conv"] = p.conv(tp + "downsample.0")
                if norm == "bn":
                    np_, ns_ = p.bn(tp + "downsample.1")
                    blk_params["downsample_bn"] = {"bn": np_}
                    if ns_:
                        blk_stats["downsample_bn"] = {"bn": ns_}
                else:
                    blk_params["downsample_bn"] = {"gn": p.gn(tp + "downsample.1")}
            params[name] = blk_params
            if blk_stats:
                stats[name] = blk_stats

    if f"{prefix}fc.weight" in p.sd:
        w = p.sd[f"{prefix}fc.weight"]
        if to_np(w).ndim == 2:
            params["fc"] = p.linear(prefix + "fc")
        else:  # fc replaced by 1x1 conv (IdtEmbed / ExpressionEmbed)
            params["fc"] = p.conv(prefix + "fc")

    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables, p.manifest()


# ------------------------------------------------------------------------ VGG family

def port_vgg_features(state_dict: Dict[str, Any],
                      stages: Tuple[Tuple[int, int], ...],
                      prefix: str = "features."):
    """torchvision vgg.features Sequential -> VGGFeatures params (conv{s}_{i} names)."""
    p = Porter(state_dict)
    params: Dict[str, Any] = {}
    idx = 0
    for si, (n_convs, _ch) in enumerate(stages, start=1):
        for ci in range(1, n_convs + 1):
            params[f"conv{si}_{ci}"] = p.conv(f"{prefix}{idx}")
            idx += 2  # conv + relu
        idx += 1  # pool
    return {"params": params}, p.manifest()


def port_vgg_face_dag(state_dict: Dict[str, Any],
                      stages: Tuple[Tuple[int, int], ...]):
    """vgg_face_dag checkpoint (named conv1_1... like our modules) -> VGGFeatures."""
    p = Porter(state_dict)
    params: Dict[str, Any] = {}
    for si, (n_convs, _ch) in enumerate(stages, start=1):
        for ci in range(1, n_convs + 1):
            name = f"conv{si}_{ci}"
            params[name] = p.conv(name)
    return {"params": params}, p.manifest()
