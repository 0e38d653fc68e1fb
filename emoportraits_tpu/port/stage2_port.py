"""Stage-2 checkpoint porter: reference `*_model.pth` (stage 2) -> Stage2Enhancer
variables.

Reference stage-2 nets (models/stage_2/base/volumetric_avatar_two.py:341-470):
`local_encoder` (networks/volumetric_avatar/local_encoder_old.py — same key anatomy as
stage 1's LocalEncoder) and `decoder` (decoder_s2_old.py Decoder_stage2 +
ImageDecoder_stage2: res_decoder.0 1x1 + res blocks, dec_img_blocks,
dec_img_feat_blocks, dec_img_head with a Tanh head).
"""
from __future__ import annotations

import math
from typing import Any, Dict

from ..config import Stage2Config
from .stage1_port import SDPorter, port_resblock


def port_stage2(state_dict: Dict[str, Any], cfg: Stage2Config):
    """Stage-2 state_dict -> ({'params', 'sn_state'}, manifest)."""
    p = SDPorter(state_dict)
    params: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}

    # ---------------- local_encoder (local_encoder_old.py:25-117) ----------------
    le: Dict[str, Any] = {}
    le_sn: Dict[str, Any] = {}
    s = cfg.image_size
    if any(k.startswith("local_encoder.") for k in p.sd):
        c, s0 = p.conv(f"local_encoder.from_rgb_{s}px")
        le["from_rgb"] = c
        if s0:
            le_sn["from_rgb"] = s0
        num_blocks = int(math.log2(cfg.image_size // cfg.latent_size))
        res = s
        for i in range(num_blocks):
            port_resblock(p, f"local_encoder.enc_{i}_block={res}px", 2, le, le_sn,
                          f"enc_{i}")
            res //= 2
        le["final_norm"] = p.norm("local_encoder.finale_layers.0")
        cf, sf = p.conv("local_encoder.finale_layers.2")
        le["final_conv"] = cf
        if sf:
            le_sn["final_conv"] = sf
        params["local_encoder"] = le
        if le_sn:
            sn["local_encoder"] = le_sn

    # ---------------- decoder (decoder_s2_old.py) ----------------
    if any(k.startswith("decoder.") for k in p.sd):
        d: Dict[str, Any] = {}
        d_sn: Dict[str, Any] = {}
        c, s0 = p.conv("decoder.res_decoder.0")
        d["in_conv"] = c
        if s0:
            d_sn["in_conv"] = s0
        for i in range(cfg.dec_num_blocks):
            port_resblock(p, f"decoder.res_decoder.{i + 1}", 2, d, d_sn, f"res_{i}")
        num_up = int(math.log2(cfg.image_size // cfg.latent_size))
        for i in range(num_up - 1):
            port_resblock(p, f"decoder.img_decoder.dec_img_blocks.{i}", 2, d, d_sn,
                          f"img_{i}")
        for i in range(len(cfg.dec_feat_channels)):
            port_resblock(p, f"decoder.img_decoder.dec_img_feat_blocks.{i}", 2, d,
                          d_sn, f"feat_{i}")
        d["head_norm"] = p.norm("decoder.img_decoder.dec_img_head.0")
        ch, _ = p.conv("decoder.img_decoder.dec_img_head.2", 2, bake_sn=True)
        d["head_conv"] = ch
        params["decoder"] = d
        if d_sn:
            sn["decoder"] = d_sn

    variables: Dict[str, Any] = {"params": params}
    if sn:
        variables["sn_state"] = sn
    return variables, p.manifest()
