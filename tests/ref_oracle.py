"""Oracle access to the reference PyTorch implementation at /root/reference.

The porting parity tests build the REAL reference nets (torch, CPU, random weights),
port their state_dicts with emoportraits_tpu.port, and assert output parity against our
flax modules. The reference package imports torchvision/ibug repos that are not in this
image, so light module stubs are installed first — only names needed at import time.

This file is test infrastructure, not product code; nothing from the reference is
copied, it is imported and executed as a black-box oracle.
"""
from __future__ import annotations

import importlib.machinery
import os
import sys
import types

REF = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    """A stub package module with a real ModuleSpec: `importlib.util.find_spec`
    raises ValueError on sys.modules entries whose __spec__ is None, which made
    later library imports (torch/torchvision probing optional deps) fail in an
    order-dependent way across the test suite."""
    m = types.ModuleType(name)
    m.__path__ = []
    m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    return m


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "networks"))


def install_stubs() -> None:
    for name in ("torchvision", "torchvision.models", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.models.resnet"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
    # functional torchvision backbones (exact module layout/key names) so the
    # reference embedders construct and their state_dicts port — tv_stub.py
    import tv_stub

    tvm = sys.modules["torchvision.models"]
    for fn in ("resnet18", "resnet34", "resnet50"):
        if not hasattr(tvm, fn):
            setattr(tvm, fn, getattr(tv_stub, fn))
    tvf = sys.modules["torchvision.transforms.functional"]
    if not hasattr(tvf, "rgb_to_grayscale"):
        def rgb_to_grayscale(img, num_output_channels=1):
            import torch
            g = (0.299 * img[..., 0:1, :, :] + 0.587 * img[..., 1:2, :, :]
                 + 0.114 * img[..., 2:3, :, :])
            return torch.cat([g] * num_output_channels, dim=-3)

        tvf.rgb_to_grayscale = rgb_to_grayscale
    if "repos" not in sys.modules:
        repos = _stub_module("repos")
        rres = _stub_module("repos.resnet")

        class ResNet18:  # placeholder; only referenced at import time
            pass

        rres.ResNet18 = ResNet18
        sys.modules["repos"] = repos
        sys.modules["repos.resnet"] = rres
    if REF not in sys.path:
        sys.path.insert(0, REF)


def install_full_model_stubs() -> None:
    """Additional import stubs needed to build the WHOLE reference stage-1 Model
    (models/stage_1/volumetric_avatar/va.py) as an oracle: its import chain pulls
    ibug, sklearn, pandas, cv2, matplotlib, skimage, the MODNet repo, and the
    `losses` package — none used by the eval-mode G_forward dataflow under our
    test flags, but all imported at module scope."""
    install_stubs()

    def _mod(name: str, **attrs):
        if name in sys.modules:
            m = sys.modules[name]
        else:
            m = _stub_module(name)
            sys.modules[name] = m
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m

    class _Dummy:
        def __init__(self, *a, **kw):
            pass

    def _fn(*a, **kw):
        raise RuntimeError("stubbed function called in oracle")

    # the reference sometimes imports itself as the `EmoPortraits` package
    # (va_arguments.py:5) — alias the checkout under that name
    if "EmoPortraits" not in sys.modules:
        pkg = _stub_module("EmoPortraits")
        pkg.__path__ = [REF]
        sys.modules["EmoPortraits"] = pkg

    # transforms instantiated at import time (utils/non_specific.py:14)
    _mod("torchvision.transforms", ToPILImage=_Dummy, ToTensor=_Dummy,
         ColorJitter=_Dummy, RandomGrayscale=_Dummy, Grayscale=_Dummy,
         Resize=_Dummy, Normalize=_Dummy, RandomApply=_Dummy, Compose=_Dummy)

    _mod("ibug")
    _mod("ibug.face_detection", RetinaFacePredictor=_Dummy)
    _mod("ibug.face_parsing", FaceParser=_Dummy)
    _mod("ibug.face_parsing.utils", label_colormap=_fn)
    _mod("ibug.roi_tanh_warping", roi_tanh_polar_restore=_fn,
         roi_tanh_polar_warp=_fn)
    _mod("pandas", DataFrame=_Dummy)
    _mod("sklearn")
    _mod("sklearn.preprocessing", StandardScaler=_Dummy)
    _mod("sklearn.decomposition", PCA=_Dummy)
    _mod("cv2", cvtColor=_fn, resize=_fn)
    _mod("matplotlib", cm=types.SimpleNamespace())
    _mod("matplotlib.cm")
    _mod("skimage", measure=types.SimpleNamespace(label=_fn))
    _mod("skimage.measure", label=_fn)
    _mod("repos.MODNet")
    _mod("repos.MODNet.src")
    _mod("repos.MODNet.src.models")
    _mod("repos.MODNet.src.models.modnet", MODNet=_Dummy)
    # the reference `losses` package imports pip-only deps (lpips, pytorch_msssim);
    # eval-mode G_forward never touches it, so an empty namespace suffices
    _mod("losses", PerceptualLoss=_Dummy, AdversarialLoss=_Dummy,
         FeatureMatchingLoss=_Dummy, GazeLoss=_Dummy, PSNR=_Dummy, LPIPS=_Dummy)


# ------------------------------------------------- test-size reference configurations
# Channel counts are multiples of 32 so the reference's fixed GroupNorm(32) is legal.

def local_encoder_cfg(image_size=64, latent_size=16, latent_depth=4,
                      latent_channels=32, num_channels=32, mult=1.0, max_ch=64):
    from networks.volumetric_avatar import LocalEncoder

    return LocalEncoder.Config(
        gen_upsampling_type="trilinear", gen_downsampling_type="avgpool",
        gen_input_image_size=image_size, gen_latent_texture_size=latent_size,
        gen_latent_texture_depth=latent_depth,
        gen_latent_texture_channels=latent_channels, gen_num_channels=num_channels,
        enc_channel_mult=mult, norm_layer_type="gn", gen_max_channels=max_ch,
        enc_block_type="res", gen_activation_type="relu", num_gpus=0,
        warp_norm_grad=False, in_channels=3)


def warp_generator_cfg(dummy=4, out_size=16, depth=4, num_channels=32, max_ch=64):
    from networks.volumetric_avatar import WarpGenerator

    return WarpGenerator.Config(
        eps=1e-8, num_gpus=0, gen_adaptive_conv_type="sum",
        gen_activation_type="relu", gen_upsampling_type="trilinear",
        gen_downsampling_type="avgpool", gen_dummy_input_size=dummy,
        gen_latent_texture_depth=depth, gen_latent_texture_size=out_size,
        gen_max_channels=max_ch, gen_num_channels=num_channels,
        gen_use_adaconv=False, gen_adaptive_kernel=False, gen_embed_size=4,
        warp_output_size=out_size, warp_channel_mult=1.0, warp_block_type="res",
        norm_layer_type="gn", input_channels=max_ch)


def unet3d_cfg(size=16, depth=4, channels=32, dummy=4, max_ch=128):
    from networks.volumetric_avatar import Unet3D

    return Unet3D.Config(
        eps=1e-8, num_gpus=0, gen_embed_size=4, gen_adaptive_kernel=False,
        gen_use_adanorm=False, gen_use_adaconv=False,
        gen_upsampling_type="trilinear", gen_downsampling_type="avgpool",
        gen_dummy_input_size=dummy, gen_latent_texture_size=size,
        gen_latent_texture_depth=depth, gen_adaptive_conv_type="sum",
        gen_latent_texture_channels=channels, gen_activation_type="relu",
        gen_max_channels=max_ch, warp_norm_grad=False, warp_block_type="res",
        tex_pred_rgb=False, image_size=64, tex_use_skip_resblock=True,
        norm_layer_type="gn")


def vpn_cfg(channels=32, num_blocks=2):
    from networks.volumetric_avatar import VPN_ResBlocks

    return VPN_ResBlocks.Config(
        num_gpus=0, norm_layer_type="gn", input_channels=channels,
        num_blocks=num_blocks, activation_type="relu", conv_layer_type="conv_3d",
        channels=[])


def decoder_cfg(image_size=32, latent_size=16, in_channels=128, num_channels=32,
                mult=2.0, max_ch=128, num_blocks=2, lrs=2, div=1.5):
    from networks.volumetric_avatar import Decoder

    return Decoder.Config(
        eps=1e-8, image_size=image_size, gen_embed_size=4,
        gen_adaptive_kernel=False, gen_adaptive_conv_type="sum",
        gen_latent_texture_size=latent_size, in_channels=in_channels,
        gen_num_channels=num_channels, dec_max_channels=max_ch,
        gen_use_adanorm=False, gen_activation_type="relu", gen_use_adaconv=False,
        dec_channel_mult=mult, dec_num_blocks=num_blocks, dec_up_block_type="res",
        dec_pred_seg=False, dec_seg_channel_mult=1.0, num_gpus=0,
        norm_layer_type="gn", bigger=False, vol_render=False,
        im_dec_num_lrs_per_resolution=lrs, im_dec_ch_div_factor=div,
        emb_v_exp=False, dec_use_sg3_img_dec=False, no_detach_frec=1,
        dec_key_emb="orig_d")
