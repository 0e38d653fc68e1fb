"""Stage-2 porting parity: reference LocalEncoderOld + Decoder_stage2Old (torch, random
weights) ported onto Stage2LocalEncoder/Stage2Decoder must reproduce outputs.

Covers VERDICT item 6: the stage-2 architecture must be the reference's (so the
released stage-2 checkpoint can port), not merely role-equivalent.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import install_stubs, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

install_stubs()

import jax.numpy as jnp  # noqa: E402

from emoportraits_tpu.config import Stage2Config  # noqa: E402
from emoportraits_tpu.models.stage2 import (  # noqa: E402
    Stage2Decoder,
    Stage2LocalEncoder,
)
from emoportraits_tpu.port.stage2_port import port_stage2  # noqa: E402

RTOL, ATOL = 2e-4, 2e-4


def s2_cfg():
    # dec_feat_channels is HARDCODED in the reference (decoder_s2_old.py:404,415:
    # out_channels=128 then [128, 64, 32]) regardless of the rest of the config
    return Stage2Config(image_size=32, latent_size=8, latent_channels=32,
                        latent_depth=4, num_channels=32, enc_channel_mult=1.0,
                        dec_channel_mult=1.0, max_channels=64, dec_num_blocks=2,
                        dec_feat_channels=(128, 128, 64, 32))


def test_stage2_encoder_parity():
    from networks.volumetric_avatar import LocalEncoderOld

    torch.manual_seed(0)
    ref = LocalEncoderOld(
        use_amp_autocast=False, gen_upsampling_type="trilinear",
        gen_downsampling_type="avgpool", gen_input_image_size=32,
        gen_latent_texture_size=8, gen_latent_texture_depth=4,
        gen_latent_texture_channels=32, warp_norm_grad=False, gen_num_channels=32,
        enc_channel_mult=1.0, norm_layer_type="gn", num_gpus=0, gen_max_channels=64,
        enc_block_type="res", gen_activation_type="relu", in_channels=3).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref_out = ref(x).numpy()  # (B, C*D, s, s)

    sd = {f"local_encoder.{k}": v for k, v in ref.state_dict().items()}
    variables, man = port_stage2(sd, s2_cfg())
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = Stage2LocalEncoder(s2_cfg(), use_ws=False, use_sn=False)
    xin = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = ours.apply({"params": variables["params"]["local_encoder"]}, xin)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out, rtol=RTOL, atol=ATOL)


def test_stage2_decoder_parity():
    from networks.volumetric_avatar import Decoder_stage2Old

    torch.manual_seed(1)
    ref = Decoder_stage2Old(
        eps=1e-8, image_size=32, use_amp_autocast=False, gen_embed_size=4,
        gen_adaptive_kernel=False, gen_adaptive_conv_type="sum",
        gen_latent_texture_size=8, in_channels=128, gen_num_channels=32,
        dec_max_channels=64, gen_use_adanorm=False, gen_activation_type="relu",
        gen_use_adaconv=False, dec_channel_mult=1.0, dec_num_blocks=2,
        dec_up_block_type="res", dec_pred_seg=False, dec_seg_channel_mult=1.0,
        dec_pred_conf=False, dec_conf_ms_names="", dec_conf_names="",
        dec_conf_ms_scales=1, dec_conf_channel_mult=1.0,
        gen_downsampling_type="avgpool", num_gpus=0, norm_layer_type="gn").eval()
    feat = torch.randn(2, 128, 8, 8)
    with torch.no_grad():
        img_ref, _, _, _ = ref(None, {"orig": torch.randn(2, 64, 16)}, feat,
                               stage_two=True)
    img_ref = img_ref.numpy()

    sd = {f"decoder.{k}": v for k, v in ref.state_dict().items()}
    cfg = s2_cfg()
    variables, man = port_stage2(sd, cfg)
    assert not man["missing_target_keys"], man
    assert not man["unused_source_keys"], man

    ours = Stage2Decoder(cfg, use_ws=False, use_sn=False)
    fin = jnp.asarray(np.transpose(feat.numpy(), (0, 2, 3, 1)))
    out = ours.apply({"params": variables["params"]["decoder"]}, fin)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               img_ref, rtol=RTOL, atol=ATOL)
