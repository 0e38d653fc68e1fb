"""Full-generator porting parity: REAL reference nets (torch, random weights) ported to
our flax modules must reproduce outputs numerically.

The oracle nets are built from /root/reference (black-box, see tests/ref_oracle.py) at
test-size configs that keep the reference's fixed GroupNorm(32) legal. Covers every
trainable core subnet plus the Model-level pose_unsqueeze/warp_embed fusion, and the
SN+WS-wrapped variant of the encoder (the prod parameterization, va.py:113-118).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import (  # noqa: E402
    decoder_cfg,
    install_stubs,
    local_encoder_cfg,
    reference_available,
    unet3d_cfg,
    vpn_cfg,
    warp_generator_cfg,
)

if not reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

install_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emoportraits_tpu import config as cfg_mod  # noqa: E402
from emoportraits_tpu.port.stage1_port import (  # noqa: E402
    SDPorter,
    port_decoder,
    port_local_encoder,
    port_unet3d,
    port_vpn,
    port_warp_generator,
)

RTOL, ATOL = 2e-4, 2e-4


def model_cfg():
    """Our ModelConfig mirroring the oracle test-size configs."""
    return cfg_mod.ModelConfig(
        volume=cfg_mod.VolumeConfig(channels=32, depth=4, size=16),
        local_encoder=cfg_mod.LocalEncoderConfig(
            input_image_size=64, num_channels=32, channel_mult=1.0, max_channels=64),
        warp_generator=cfg_mod.WarpGeneratorConfig(
            input_channels=64, dummy_input_size=4, output_size=16, output_depth=4,
            num_channels=32, channel_mult=1.0, max_channels=64, embed_size=4),
        unet3d=cfg_mod.Unet3DConfig(
            channels=32, size=16, depth=4, dummy_input_size=4, max_channels=128),
        vpn_source=cfg_mod.VPNResBlocksConfig(num_blocks=2, channels=32),
        decoder=cfg_mod.DecoderConfig(
            in_channels=128, image_size=32, latent_size=16, num_channels=32,
            channel_mult=2.0, max_channels=128, num_blocks=2,
            num_lrs_per_resolution=2, ch_div_factor=1.5),
        max_channels=64,
        source_volume_num_blocks=2,
    )


def _prefix_sd(net, prefix):
    return {f"{prefix}.{k}": v for k, v in net.state_dict().items()}


def _apply(module, variables, *args):
    return module.apply(variables, *args)


def test_local_encoder_parity():
    from networks.volumetric_avatar import LocalEncoder as RefLE

    from emoportraits_tpu.models.local_encoder import LocalEncoder

    torch.manual_seed(0)
    ref = RefLE(local_encoder_cfg()).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_out = ref(x).numpy()  # (B, C*D, s, s)

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "local_encoder_nw"))
    port_local_encoder(p, "local_encoder_nw", cfg, params, sn)
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = LocalEncoder(cfg.local_encoder, cfg.volume, use_ws=False, use_sn=False)
    xin = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = _apply(ours, {"params": params["local_encoder_nw"]}, xin)
    # ours (B, D, s, s, C) -> torch C-major (B, C*D, s, s)
    ours_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3)).reshape(ref_out.shape)
    np.testing.assert_allclose(ours_np, ref_out, rtol=RTOL, atol=ATOL)


def test_warp_generator_parity():
    from networks.volumetric_avatar import WarpGenerator as RefWG

    from emoportraits_tpu.models.warp_generator import WarpGenerator

    torch.manual_seed(1)
    ref = RefWG(warp_generator_cfg()).eval()
    b, cmax, e = 2, 64, 4
    orig = torch.randn(b, cmax, e * e)
    with torch.no_grad():
        warp_ref, deltas_ref = ref({"orig": orig})
    warp_ref = warp_ref.numpy()  # (B, D, S, S, 3)

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "xy_generator_nw"))
    port_warp_generator(p, "xy_generator_nw", cfg, params, sn, "xy_generator_nw")
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = WarpGenerator(cfg.warp_generator, use_ws=False, use_sn=False)
    embed = jnp.asarray(np.transpose(orig.numpy().reshape(b, cmax, e, e),
                                     (0, 2, 3, 1)))
    warp, deltas = _apply(ours, {"params": params["xy_generator_nw"]}, embed)
    np.testing.assert_allclose(np.asarray(warp), warp_ref, rtol=RTOL, atol=ATOL)


def test_unet3d_parity():
    from networks.volumetric_avatar import Unet3D as RefU

    from emoportraits_tpu.models.unet3d import Unet3D

    torch.manual_seed(2)
    ref = RefU(unet3d_cfg()).eval()
    x = torch.randn(2, 32, 4, 16, 16)  # (B, C, D, S, S)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "volume_process_nw"))
    port_unet3d(p, "volume_process_nw", cfg, params, sn)
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = Unet3D(cfg.unet3d, use_ws=False, use_sn=False)
    xin = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))  # (B, D, S, S, C)
    out = _apply(ours, {"params": params["volume_process_nw"]}, xin)
    ours_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_np, ref_out, rtol=RTOL, atol=ATOL)


def test_vpn_parity():
    from networks.volumetric_avatar import VPN_ResBlocks as RefV

    from emoportraits_tpu.models.vpn_resblocks import VPNResBlocks

    torch.manual_seed(3)
    ref = RefV(vpn_cfg()).eval()
    x = torch.randn(2, 32, 4, 8, 8)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "volume_source_nw"))
    port_vpn(p, "volume_source_nw", cfg, params, sn)
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = VPNResBlocks(cfg.vpn_source, use_ws=False, use_sn=False)
    xin = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out = _apply(ours, {"params": params["volume_source_nw"]}, xin)
    ours_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_np, ref_out, rtol=RTOL, atol=ATOL)


def test_decoder_parity():
    from networks.volumetric_avatar import Decoder as RefD

    from emoportraits_tpu.models.decoder import Decoder

    torch.manual_seed(4)
    ref = RefD(decoder_cfg()).eval()
    feat = torch.randn(2, 128, 16, 16)
    embed = torch.randn(2, 128, 16)  # unused at prod flags but required by forward
    with torch.no_grad():
        img_ref, _seg, _f2d, img_f_ref = ref({}, {"orig": embed}, feat,
                                             stage_two=True)
    img_ref = img_ref.numpy()

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "decoder_nw"))
    port_decoder(p, "decoder_nw", cfg, params, sn)
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = Decoder(cfg.decoder, use_ws=False, use_sn=False)
    fin = jnp.asarray(np.transpose(feat.numpy(), (0, 2, 3, 1)))
    img, img_f = _apply(ours, {"params": params["decoder_nw"]}, fin, None, True)
    ours_np = np.transpose(np.asarray(img), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_np, img_ref, rtol=RTOL, atol=ATOL)
    # feature tap shape parity (dec_img_blocks output, decoder.py:399-404)
    assert np.transpose(np.asarray(img_f), (0, 3, 1, 2)).shape == \
        tuple(img_f_ref.shape)


def test_local_encoder_parity_with_sn_ws():
    """The prod parameterization: SN hooks applied, then WS conv replacement
    (va.py:113-118). Power iteration is converged on the torch side first so both
    sides' sigma estimates agree."""
    from networks.volumetric_avatar import LocalEncoder as RefLE
    from networks.volumetric_avatar.utils import replace_conv_to_ws_conv
    from utils import spectral_norm as ref_sn

    from emoportraits_tpu.models.local_encoder import LocalEncoder

    torch.manual_seed(5)
    ref = RefLE(local_encoder_cfg())
    spn_layers = ["conv2d", "conv3d", "linear", "conv2d_ws", "conv3d_ws"]
    ref.apply(lambda m: ref_sn.apply_spectral_norm(m, apply_to=spn_layers))
    ref = replace_conv_to_ws_conv(ref)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        for _ in range(30):  # converge the power iteration
            ref.train()(x)
        ref_out = ref.eval()(x).numpy()

    cfg = model_cfg()
    params, sn = {}, {}
    p = SDPorter(_prefix_sd(ref, "local_encoder_nw"))
    port_local_encoder(p, "local_encoder_nw", cfg, params, sn)
    man = p.manifest()
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man
    assert "local_encoder_nw" in sn, "SN'd reference must port sn_state u vectors"

    ours = LocalEncoder(cfg.local_encoder, cfg.volume, use_ws=True, use_sn=True)
    xin = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = _apply(ours, {"params": params["local_encoder_nw"],
                        "sn_state": sn["local_encoder_nw"]}, xin)
    ours_np = np.transpose(np.asarray(out), (0, 4, 1, 2, 3)).reshape(ref_out.shape)
    np.testing.assert_allclose(ours_np, ref_out, rtol=2e-3, atol=2e-3)


def test_fuse_embed_parity():
    """pose_unsqueeze (Linear 128 -> 512*E^2) + (pose+idt)/2 -> 1x1 conv
    (reference predict_embed, va.py:813-885)."""
    torch.manual_seed(6)
    import torch.nn as tnn

    dim, cmax, e = 16, 64, 4
    lin = tnn.Linear(dim, cmax * e * e, bias=False)
    conv = tnn.Conv2d(cmax, cmax, 1, bias=False)
    pose = torch.randn(2, dim)
    idt = torch.randn(2, cmax, e, e)
    with torch.no_grad():
        spatial = lin(pose).view(2, cmax, e, e)
        ref_out = conv((spatial + idt) * 0.5).numpy()

    from emoportraits_tpu.port.torch_port import conv2d_kernel, linear_kernel

    from emoportraits_tpu.models.stage1 import VolumetricAvatar  # noqa: F401
    # replicate fuse_embed math directly (module method needs the whole model)
    kl = jnp.asarray(linear_kernel(lin.weight))
    kc = jnp.asarray(conv2d_kernel(conv.weight))
    pose_j = jnp.asarray(pose.numpy())
    idt_j = jnp.asarray(np.transpose(idt.numpy(), (0, 2, 3, 1)))
    sp = (pose_j @ kl).reshape(2, cmax, e, e)
    sp = jnp.transpose(sp, (0, 2, 3, 1))
    fused = (sp + idt_j) * 0.5
    out = jax.lax.conv_general_dilated(
        fused, kc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out, rtol=RTOL, atol=ATOL)
