"""Full stage-1 checkpoint porter: reference `*_model.pth` state_dict -> VolumetricAvatar
variables.

The reference saves the whole Model (every `*_nw` subnet) as one flat state_dict and
reloads it with `strict=False` (notebooks/infer.py:110-131, train.py:100-103). This
porter reproduces that contract: it maps every key it recognizes onto our param tree and
returns an explicit manifest of unused source keys and missing target keys instead of
failing.

Reference key anatomy (probed from nets built at the prod config):
  * ResBlock (utils.py:661-790): `block_feats.0` (norm) `.2` (conv) `.3` (norm),
    `block.0` (conv), `skip.0` (1x1), names identical for 2D/3D and adaptive variants;
  * spectral norm (utils/spectral_norm.py): `X.weight` -> `X.weight_orig` + `X.weight_u`
    (+`weight_v`); our Conv/Dense keeps the raw kernel (=weight_orig) and the power-
    iteration `u` in the `sn_state` collection. Where OUR module has no sn_state at that
    path, sigma is baked into the kernel (torch eval semantics: sigma = u^T W v);
  * projectors (utils.py:1113-1213): `projector.u.{i}`/`.v.{i}` ParameterLists (+
    `projector.fc.{0,2}` for the Linear variant) -> our `projector/u_{i}`/`v_{i}`
    (+ fc_0/fc_1);
  * subnet prefixes (va.py:126-279): local_encoder_nw, idt_embedder_nw,
    expression_embedder_nw, pose_unsqueeze_nw, warp_embed_head_orig_nw,
    xy_generator_nw, uv_generator_nw, volume_source_nw, volume_process_nw, decoder_nw.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..config import ModelConfig
from .torch_port import conv2d_kernel, conv3d_kernel, linear_kernel, to_np


class SDPorter:
    """Flat torch state_dict accessor with SN awareness and usage tracking."""

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd = dict(state_dict)
        self.used: set = set()
        self.missing: List[str] = []

    def _get(self, key: str, required: bool = True):
        if key in self.sd:
            self.used.add(key)
            return to_np(self.sd[key])
        if required:
            self.missing.append(key)
        return None

    def conv(self, key: str, ndim: int = 2, bake_sn: bool = False):
        """Returns (params {kernel[,bias]}, sn {u} or None)."""
        to_kernel = conv2d_kernel if ndim == 2 else conv3d_kernel
        params: Dict[str, np.ndarray] = {}
        sn = None
        if f"{key}.weight_orig" in self.sd:
            w = self._get(f"{key}.weight_orig")
            u = self._get(f"{key}.weight_u")
            v = self._get(f"{key}.weight_v", required=False)
            self._get(f"{key}.weight", required=False)  # mark derived key consumed
            if bake_sn:
                w = w / _sn_sigma(w, u, v)
            else:
                sn = {"u": u}
                if v is not None:
                    # torch flattens W as (out, in, *k); our kernel flattens as
                    # (*k, in, out) -> permute v from (in, *k) to (*k, in) order
                    perm = (1, 2, 0) if ndim == 2 else (1, 2, 3, 0)
                    sn["v"] = v.reshape(w.shape[1:]).transpose(perm).reshape(-1)
            params["kernel"] = to_kernel(w)
        elif f"{key}.weight" in self.sd:
            params["kernel"] = to_kernel(self._get(f"{key}.weight"))
        else:
            self.missing.append(f"{key}.weight")
        b = self._get(f"{key}.bias", required=False)
        if b is not None:
            params["bias"] = b
        return params, sn

    def linear(self, key: str, bake_sn: bool = False):
        params: Dict[str, np.ndarray] = {}
        sn = None
        if f"{key}.weight_orig" in self.sd:
            w = self._get(f"{key}.weight_orig")
            u = self._get(f"{key}.weight_u")
            v = self._get(f"{key}.weight_v", required=False)
            self._get(f"{key}.weight", required=False)
            if bake_sn:
                w = w / _sn_sigma(w, u, v)
            else:
                sn = {"u": u}
                if v is not None:
                    sn["v"] = v
            params["kernel"] = linear_kernel(w)
        elif f"{key}.weight" in self.sd:
            params["kernel"] = linear_kernel(self._get(f"{key}.weight"))
        else:
            self.missing.append(f"{key}.weight")
        b = self._get(f"{key}.bias", required=False)
        if b is not None:
            params["bias"] = b
        return params, sn

    def norm(self, key: str) -> Dict[str, np.ndarray]:
        out = {}
        w = self._get(f"{key}.weight", required=False)
        b = self._get(f"{key}.bias", required=False)
        if w is not None:
            out["scale"] = w
        if b is not None:
            out["bias"] = b
        return out

    def manifest(self) -> Dict[str, List[str]]:
        skip = ("identity_grid", "num_batches_tracked")
        unused = sorted(k for k in set(self.sd) - self.used
                        if not any(s in k for s in skip))
        return {"unused_source_keys": unused, "missing_target_keys": self.missing}


def _sn_sigma(w: np.ndarray, u: Optional[np.ndarray],
              v: Optional[np.ndarray]) -> float:
    """torch spectral_norm eval-mode sigma = u^T @ W_mat @ v (stored vectors)."""
    wm = w.reshape(w.shape[0], -1)
    if u is None:
        u = np.linalg.svd(wm, compute_uv=True)[0][:, 0]
    if v is None:
        v = wm.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
    return float(u @ (wm @ v))


def _merge(dst: Dict, path: Tuple[str, ...], leaf: Dict) -> None:
    cur = dst
    for p in path[:-1]:
        cur = cur.setdefault(p, {})
    cur[path[-1]] = leaf


def port_resblock(p: SDPorter, prefix: str, ndim: int,
                  params: Dict, sn: Dict, name: str,
                  bake_sn: bool = False) -> None:
    """Reference ResBlock -> our ResBlock param subtree under `name`."""
    blk: Dict[str, Any] = {}
    blk_sn: Dict[str, Any] = {}
    blk["norm_act_0"] = {"norm": p.norm(f"{prefix}.block_feats.0")}
    c0, s0 = p.conv(f"{prefix}.block_feats.2", ndim, bake_sn)
    blk["conv_0"] = c0
    if s0:
        blk_sn["conv_0"] = s0
    blk["norm_act_1"] = {"norm": p.norm(f"{prefix}.block_feats.3")}
    c1, s1 = p.conv(f"{prefix}.block.0", ndim, bake_sn)
    blk["conv_1"] = c1
    if s1:
        blk_sn["conv_1"] = s1
    if f"{prefix}.skip.0.weight" in p.sd or f"{prefix}.skip.0.weight_orig" in p.sd:
        cs, ss = p.conv(f"{prefix}.skip.0", ndim, bake_sn)
        blk["skip"] = cs
        if ss:
            blk_sn["skip"] = ss
    params[name] = blk
    if blk_sn:
        sn[name] = blk_sn


def port_projector_norm(p: SDPorter, prefix: str, n: int) -> Dict[str, np.ndarray]:
    """ProjectorNorm ParameterLists -> our u_{i}/v_{i} (no transpose: identical math)."""
    out = {}
    for i in range(n):
        u = p._get(f"{prefix}.u.{i}", required=False)
        v = p._get(f"{prefix}.v.{i}", required=False)
        if u is not None:
            out[f"u_{i}"] = u
        if v is not None:
            out[f"v_{i}"] = v
    return out


# ------------------------------------------------------------------- subnet porters

def port_local_encoder(p: SDPorter, prefix: str, cfg: ModelConfig,
                       params: Dict, sn: Dict) -> None:
    """LocalEncoder (reference local_encoder.py:26-127): from_rgb_{S}px +
    enc_{i}_block={r}px res blocks + finale_layers GN/1x1."""
    le: Dict[str, Any] = {}
    le_sn: Dict[str, Any] = {}
    s = cfg.local_encoder.input_image_size
    c, s0 = p.conv(f"{prefix}.from_rgb_{s}px")
    le["from_rgb"] = c
    if s0:
        le_sn["from_rgb"] = s0
    num_blocks = int(math.log2(s // cfg.volume.size))
    res = s
    for i in range(num_blocks):
        port_resblock(p, f"{prefix}.enc_{i}_block={res}px", 2, le, le_sn, f"enc_{i}")
        res //= 2
    le["final_norm"] = p.norm(f"{prefix}.finale_layers.0")
    cf, sf = p.conv(f"{prefix}.finale_layers.2")
    le["final_conv"] = cf
    if sf:
        le_sn["final_conv"] = sf
    params["local_encoder_nw"] = le
    if le_sn:
        sn["local_encoder_nw"] = le_sn


def port_warp_generator(p: SDPorter, prefix: str, cfg: ModelConfig,
                        params: Dict, sn: Dict, attr: str) -> None:
    """WarpGenerator (warp_generator_resnet.py:11-182): first_conv + blocks_3d (adaptive)
    + pre_head GN + head conv3d + ProjectorNorm."""
    wg: Dict[str, Any] = {}
    wg_sn: Dict[str, Any] = {}
    w = cfg.warp_generator
    num_blocks = int(math.log2(w.output_size // w.dummy_input_size))
    c, s0 = p.conv(f"{prefix}.first_conv")
    wg["first_conv"] = c
    if s0:
        wg_sn["first_conv"] = s0
    for i in range(num_blocks):
        port_resblock(p, f"{prefix}.blocks_3d.{i}", 3, wg, wg_sn, f"block_{i}")
    wg["pre_head_norm"] = p.norm(f"{prefix}.pre_head.0")
    ch, sh = p.conv(f"{prefix}.head.0.0", 3)
    wg["head"] = ch
    if sh:
        wg_sn["head"] = sh
    wg["projector"] = port_projector_norm(p, f"{prefix}.projector", 2 * num_blocks)
    params[attr] = wg
    if wg_sn:
        sn[attr] = wg_sn


def port_unet3d(p: SDPorter, prefix: str, cfg: ModelConfig,
                params: Dict, sn: Dict, attr: str = "volume_process_nw") -> None:
    """Unet3D (unet_3d.py:18-280): blocks_3d_down/up + skip_blocks_3d_up + input_tensor
    + head GN/1x1."""
    u3: Dict[str, Any] = {}
    u3_sn: Dict[str, Any] = {}
    u = cfg.unet3d
    num_blocks = int(math.log2(u.size // u.dummy_input_size))
    for i in range(num_blocks):
        port_resblock(p, f"{prefix}.blocks_3d_down.{i}", 3, u3, u3_sn, f"down_{i}")
        port_resblock(p, f"{prefix}.blocks_3d_up.{i}", 3, u3, u3_sn, f"up_{i}")
        if u.use_skip_resblock:
            port_resblock(p, f"{prefix}.skip_blocks_3d_up.{i}", 3, u3, u3_sn,
                          f"skip_{i}")
    it = p._get(f"{prefix}.input_tensor", required=False)
    if it is not None:
        # torch (1, C, D, H, W) -> ours (1, D, H, W, C)
        u3["input_tensor"] = np.transpose(it, (0, 2, 3, 4, 1))
    u3["head_norm"] = p.norm(f"{prefix}.head.0")
    ch, sh = p.conv(f"{prefix}.head.2", 3)
    u3["head_conv"] = ch
    if sh:
        u3_sn["head_conv"] = sh
    params[attr] = u3
    if u3_sn:
        sn[attr] = u3_sn


def port_vpn(p: SDPorter, prefix: str, cfg: ModelConfig,
             params: Dict, sn: Dict, attr: str = "volume_source_nw") -> None:
    """VPN_ResBlocks (vpn_resblocks.py:22 + resblocks_3d.py:9): net.net.{i} res blocks."""
    vp: Dict[str, Any] = {}
    vp_sn: Dict[str, Any] = {}
    for i in range(cfg.source_volume_num_blocks):
        port_resblock(p, f"{prefix}.net.net.{i}", 3, vp, vp_sn, f"block_{i}")
    params[attr] = vp
    if vp_sn:
        sn[attr] = vp_sn


def port_decoder(p: SDPorter, prefix: str, cfg: ModelConfig,
                 params: Dict, sn: Dict) -> None:
    """Decoder (decoder.py:20-238 + ImageDecoder :240-411): res_decoder.0 1x1 +
    res_decoder.{1..n} blocks + img_decoder.dec_img_blocks + dec_img_head."""
    d: Dict[str, Any] = {}
    d_sn: Dict[str, Any] = {}
    dc = cfg.decoder
    c, s0 = p.conv(f"{prefix}.res_decoder.0")
    d["in_conv"] = c
    if s0:
        d_sn["in_conv"] = s0
    for i in range(dc.num_blocks):
        port_resblock(p, f"{prefix}.res_decoder.{i + 1}", 2, d, d_sn, f"res_{i}")
    num_up = int(math.log2(dc.image_size // dc.latent_size))
    n_img = num_up * dc.num_lrs_per_resolution
    for i in range(n_img):
        port_resblock(p, f"{prefix}.img_decoder.dec_img_blocks.{i}", 2, d, d_sn,
                      f"img_{i}")
    d["head_norm"] = p.norm(f"{prefix}.img_decoder.dec_img_head.0")
    ch, _ = p.conv(f"{prefix}.img_decoder.dec_img_head.2", 2, bake_sn=True)
    d["head_conv"] = ch
    if dc.use_adanorm:
        proj = port_projector_norm(p, f"{prefix}.projector",
                                   2 * dc.num_blocks + 2 * n_img)
        f0, _ = p.linear(f"{prefix}.projector.fc.0", bake_sn=True)
        f1, _ = p.linear(f"{prefix}.projector.fc.2", bake_sn=True)
        proj["fc_0"] = f0
        proj["fc_1"] = f1
        d["projector"] = proj
    params["decoder_nw"] = d
    if d_sn:
        sn["decoder_nw"] = d_sn


def port_resnet_sd(p: SDPorter, prefix: str, layers: Tuple[int, ...],
                   block: str, norm: str) -> Tuple[Dict, Dict, Dict]:
    """SN-aware torchvision-naming ResNet trunk porter -> (params, sn, batch_stats)."""
    params: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(name: str, torch_key: str, dst_p: Dict, dst_s: Dict):
        if norm == "bn":
            n = p.norm(torch_key)
            dst_p[name] = {"bn": {k: v for k, v in n.items()}}
            mean = p._get(f"{torch_key}.running_mean", required=False)
            var = p._get(f"{torch_key}.running_var", required=False)
            if mean is not None:
                dst_s[name] = {"bn": {"mean": mean, "var": var}}
        else:
            dst_p[name] = {"gn": p.norm(torch_key)}

    c, s0 = p.conv(f"{prefix}conv1")
    params["conv1"] = c
    if s0:
        sn["conv1"] = s0
    put_norm("bn1", f"{prefix}bn1", params, stats)
    n_convs = 2 if block == "basic" else 3
    for li, n_blocks in enumerate(layers, start=1):
        for bi in range(n_blocks):
            name = f"layer{li}_{bi}"
            tp = f"{prefix}layer{li}.{bi}."
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bsn: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                cc, cs = p.conv(tp + f"conv{ci}")
                bp[f"conv{ci}"] = cc
                if cs:
                    bsn[f"conv{ci}"] = cs
                put_norm(f"bn{ci}", tp + f"bn{ci}", bp, bs)
            if f"{tp}downsample.0.weight" in p.sd \
                    or f"{tp}downsample.0.weight_orig" in p.sd:
                dc, ds = p.conv(tp + "downsample.0")
                bp["downsample_conv"] = dc
                if ds:
                    bsn["downsample_conv"] = ds
                put_norm("downsample_bn", tp + "downsample.1", bp, bs)
            params[name] = bp
            if bs:
                stats[name] = bs
            if bsn:
                sn[name] = bsn
    return params, sn, stats


def port_idt_embedder(p: SDPorter, prefix: str, cfg: ModelConfig,
                      params: Dict, sn: Dict) -> None:
    """IdtEmbed (identity_embedder.py:12-93): torchvision ResNet-50 under `.net` with fc
    replaced by a 1x1 conv inside it (net.fc)."""
    layers = (3, 4, 6, 3) if cfg.idt_embedder.backbone == "resnet50" else (2, 2, 2, 2)
    block = "bottleneck" if cfg.idt_embedder.backbone == "resnet50" else "basic"
    tp, ts, _ = port_resnet_sd(p, f"{prefix}.net.", layers, block,
                               cfg.idt_embedder.norm)
    ie: Dict[str, Any] = {"net": tp}
    ie_sn: Dict[str, Any] = {"net": ts} if ts else {}
    cf, cs = p.conv(f"{prefix}.net.fc", 2)
    ie["fc"] = cf
    if cs:
        ie_sn["fc"] = cs
    params["idt_embedder_nw"] = ie
    if ie_sn:
        sn["idt_embedder_nw"] = ie_sn


def port_expression_embedder(p: SDPorter, prefix: str, cfg: ModelConfig,
                             params: Dict, sn: Dict) -> None:
    """ExpressionEmbed (expression_embedder.py:343-480 ResNetWrapper `net_face`):
    ResNet-18 trunk (net_face.net) + conv fc (net_face.net.fc) + pose_head linear."""
    tp, ts, _ = port_resnet_sd(p, f"{prefix}.net_face.net.", (2, 2, 2, 2), "basic",
                               cfg.expression_embedder.norm)
    ee: Dict[str, Any] = {"net": tp}
    ee_sn: Dict[str, Any] = {"net": ts} if ts else {}
    cf, cs = p.conv(f"{prefix}.net_face.net.fc", 2)
    if cf:
        ee["fc"] = cf
        if cs:
            ee_sn["fc"] = cs
    ph, ps = p.linear(f"{prefix}.net_face.pose_head")
    if ph:
        ee["pose_head"] = ph
        if ps:
            ee_sn["pose_head"] = ps
    params["expression_embedder_nw"] = ee
    if ee_sn:
        sn["expression_embedder_nw"] = ee_sn


# --------------------------------------------------------------------- entry point

def port_stage1(state_dict: Dict[str, Any], cfg: ModelConfig):
    """Whole stage-1 checkpoint -> VolumetricAvatar variables + manifest.

    Returns ({'params': ..., 'sn_state': ...}, manifest). `strict=False` parity: missing
    subnets simply stay absent from the tree; the manifest lists every unmatched key.
    """
    p = SDPorter(state_dict)
    params: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}

    if any(k.startswith("local_encoder_nw.") for k in p.sd):
        port_local_encoder(p, "local_encoder_nw", cfg, params, sn)
    if any(k.startswith("idt_embedder_nw.") for k in p.sd):
        port_idt_embedder(p, "idt_embedder_nw", cfg, params, sn)
    if any(k.startswith("expression_embedder_nw.") for k in p.sd):
        port_expression_embedder(p, "expression_embedder_nw", cfg, params, sn)
    if "pose_unsqueeze_nw.weight" in p.sd or "pose_unsqueeze_nw.weight_orig" in p.sd:
        lp, ls = p.linear("pose_unsqueeze_nw")
        params["pose_unsqueeze_nw"] = lp
        if ls:
            sn["pose_unsqueeze_nw"] = ls
    if any(k.startswith("warp_embed_head_orig_nw.") for k in p.sd):
        cp, cs = p.conv("warp_embed_head_orig_nw")
        params["warp_embed_head_orig_nw"] = cp
        if cs:
            sn["warp_embed_head_orig_nw"] = cs
    for attr in ("xy_generator_nw", "uv_generator_nw"):
        if any(k.startswith(f"{attr}.") for k in p.sd):
            port_warp_generator(p, attr, cfg, params, sn, attr)
    if any(k.startswith("volume_source_nw.") for k in p.sd):
        port_vpn(p, "volume_source_nw", cfg, params, sn, "volume_source_nw")
    if any(k.startswith("volume_process_nw.") for k in p.sd):
        port_unet3d(p, "volume_process_nw", cfg, params, sn, "volume_process_nw")
    if any(k.startswith("decoder_nw.") for k in p.sd):
        port_decoder(p, "decoder_nw", cfg, params, sn)
    if "avarage_tensor_ts" in p.sd:
        t = p._get("avarage_tensor_ts")
        params["avarage_tensor_ts"] = np.transpose(t, (0, 2, 3, 4, 1))

    variables: Dict[str, Any] = {"params": params}
    if sn:
        variables["sn_state"] = sn
    return variables, p.manifest()
