"""FULL-GRAPH stage-1 parity: the complete reference Model's G_forward
(models/stage_1/volumetric_avatar/va.py:287-765) vs our ported VolumetricAvatar +
train-forward wiring, end to end.

Per-module porting parity (test_stage1_port.py) can't catch wiring-order bugs —
embed fusion order, mask application points, warp composition order, C-major
volume collapse, theta plumbing (VERDICT r2 missing #2). Here the WHOLE reference
Model is constructed at test size (eval mode, external frozen nets stubbed/fed
fixed random weights), its complete state_dict is ported with port_stage1, and
G_forward's main outputs are compared against our gen_apply on the same batch:

    idt_embed, source/target_pose_embed, source/target_theta,
    pred_target_img, pred_mixing_img, canon_volume, canon_volume_from_target.

Flags under test mirror prod semantics where the environment allows:
use_sn=True + use_ws=True (prod parameterization), GroupNorm, zeros grid padding
(reference default), pred_mixing with the deterministic (non-random) polar mixing
theta, predict_target_canon_vol=True incl. the keypoint-aligned refinement
(va.py:437-448). use_mix_mask stays off (external parser weights absent — masks
pass through identically on both sides).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import install_full_model_stubs, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not present", allow_module_level=True)

install_full_model_stubs()

import tv_stub  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emoportraits_tpu import config as cfg_mod  # noqa: E402
from emoportraits_tpu.models.stage1 import VolumetricAvatar  # noqa: E402
from emoportraits_tpu.port.stage1_port import port_stage1  # noqa: E402
from emoportraits_tpu.port.towers_port import port_head_pose  # noqa: E402
from emoportraits_tpu.train.forward import make_gen_apply  # noqa: E402

pytestmark = pytest.mark.slow

B, S = 2, 64


def _reference_model_and_batch():
    torch.manual_seed(0)
    hp_net = tv_stub.resnet18(num_classes=9)
    hp_sd = {k: v.clone() for k, v in hp_net.state_dict().items()}

    orig_load = torch.load

    def fake_load(path, *a, **kw):
        if isinstance(path, (str, os.PathLike)) and "head_pose" in str(path):
            return hp_sd
        return orig_load(path, *a, **kw)

    torch.load = fake_load
    try:
        from argparse import ArgumentParser

        import models.stage_1.volumetric_avatar.va as va_mod
        from models.stage_1.volumetric_avatar.va_arguments import (
            VolumetricAvatarConfig,
        )

        class _Dummy:
            def __init__(self, *a, **kw):
                pass

        va_mod.FaceParsingBUG = _Dummy
        va_mod.volumetric_avatar.FaceParsing = _Dummy
        va_mod.MODNET = _Dummy
        va_mod.volumetric_avatar.utils.Face_vector = _Dummy
        va_mod.volumetric_avatar.utils.Face_vector_resnet = _Dummy

        parser = ArgumentParser(conflict_handler="resolve")
        VolumetricAvatarConfig.add_argparse_args(parser)
        args = parser.parse_args([])
        args.num_target_frames = 1
        for k, v in dict(
            norm_layer_type="gn",
            use_seg=False, use_back=False, use_mix_mask=False,
            use_mix_losses=False, use_masked_aug=False, use_sn=True, use_ws=True,
            estimate_head_pose_from_keypoints=True,
            head_pose_regressor_path="head_pose_fake.pth",
            gen_pred_mixing=True, random_theta=False, green=False,
            # prod mixing composition (experiments/args.txt: --old_mix_pose False;
            # the stretch-rescaled branch our geometry implements)
            old_mix_pose=False,
            predict_target_canon_vol=True, match_neutral=False,
            volume_rendering=False,
            aligned_warp_rot_source=False, aligned_warp_rot_target=False,
            source_volume_num_blocks=1, pred_volume_num_blocks=0,
            gen_latent_texture_size=16, gen_latent_texture_depth=4,
            gen_latent_texture_channels=32,
            latent_volume_size=16, latent_volume_depth=4,
            latent_volume_channels=32, warp_output_size=16,
            gen_num_channels=32, gen_max_channels=64, dec_max_channels=64,
            gen_max_channels_unet3d=64, gen_max_channels_loc_enc=64,
            gen_embed_size=4, gen_dummy_input_size=4,
            idt_image_size=S, exp_image_size=S,
            idt_output_channels=64, idt_output_size=4,
            lpe_output_channels=64, lpe_output_channels_expression=32,
            dec_num_blocks=2, im_dec_num_lrs_per_resolution=1,
            im_dec_ch_div_factor=2.0,
            enc_channel_mult=2.0, dec_channel_mult=2.0,
            image_size=S, aug_warp_size=S, num_gpus=0, use_amp_autocast=False,
            num_source_frames=1, num_b_negs=1, project_dir="/root/reference",
        ).items():
            setattr(args, k, v)

        model = va_mod.Model(args, training=False)
        model.eval()
    finally:
        torch.load = orig_load

    torch.manual_seed(1)
    batch_t = {
        "source_img": torch.rand(B, 3, S, S),
        "target_img": torch.rand(B, 3, S, S),
        "source_mask": torch.ones(B, 1, S, S),
        "target_mask": torch.ones(B, 1, S, S),
        "source_keypoints": torch.rand(B, 68, 3) * 0.4 - 0.2,
        "target_keypoints": torch.rand(B, 68, 3) * 0.4 - 0.2,
    }
    with torch.no_grad():
        ref_out = model.G_forward({k: v.clone() for k, v in batch_t.items()},
                                  visualize=False)
    return model, hp_sd, batch_t, ref_out


def _our_config():
    model = cfg_mod.ModelConfig(
        volume=cfg_mod.VolumeConfig(channels=32, depth=4, size=16),
        local_encoder=cfg_mod.LocalEncoderConfig(
            input_image_size=S, num_channels=32, channel_mult=2.0,
            max_channels=64),
        idt_embedder=cfg_mod.IdtEmbedConfig(
            image_size=S, output_channels=64, output_size=4, backbone_width=64),
        expression_embedder=cfg_mod.ExpressionEmbedConfig(
            image_size=S, align_size=S, output_channels=32, dropout=0.0,
            backbone_width=64),
        warp_generator=cfg_mod.WarpGeneratorConfig(
            input_channels=64, dummy_input_size=4, output_size=16, output_depth=4,
            num_channels=32, channel_mult=1.0, max_channels=64, embed_size=4),
        unet3d=cfg_mod.Unet3DConfig(
            channels=32, size=16, depth=4, dummy_input_size=4, max_channels=64),
        vpn_source=cfg_mod.VPNResBlocksConfig(num_blocks=1, channels=32),
        decoder=cfg_mod.DecoderConfig(
            in_channels=128, image_size=S, latent_size=16, num_channels=32,
            channel_mult=2.0, max_channels=64, num_blocks=2,
            num_lrs_per_resolution=1, ch_div_factor=2.0),
        max_channels=64,
        expression_dim=32,
        use_sn=True,
        use_ws=True,
        source_volume_num_blocks=1,
        grid_sample_padding_mode="zeros",
    )
    train = cfg_mod.TrainConfig(
        batch_size=B, image_size=S, aug_warp_size=S,
        use_mix_mask=False, pred_mixing=True, random_theta=False,
        predict_target_canon_vol=True, match_neutral=False)
    return cfg_mod.ExperimentConfig(experiment_name="fullgraph_parity",
                                    model=model, train=train)


# populated by the `parity` fixture for the port-contract test (module-scoped so
# the expensive reference build happens once)
_CONTRACT: dict = {}


@pytest.fixture(scope="module")
def parity():
    ref_model, hp_sd, batch_t, ref_out = _reference_model_and_batch()

    cfg = _our_config()
    our_model = VolumetricAvatar(cfg.model)
    variables, manifest = port_stage1(ref_model.state_dict(), cfg.model)
    _CONTRACT.update(sd=ref_model.state_dict(), cfg=cfg,
                     variables=variables, manifest=manifest)
    # the port must consume the generator cleanly: anything unused beyond known
    # non-generator attrs (buffers, frozen nets) indicates a key-mapping hole
    # normalization buffers / canonical-landmark constants are module state, not
    # weights — our side keeps them as code constants
    _buffers = ("aligned_keypoints", ".mean", ".std")
    unused_gen = [k for k in manifest["unused_source_keys"]
                  if k.split(".")[0].endswith("_nw")
                  and not any(b in k for b in _buffers)]
    assert not manifest["missing_target_keys"], manifest["missing_target_keys"]

    from emoportraits_tpu.models.head_pose import HeadPoseRegressor

    hp_vars, _hp_manifest = port_head_pose(hp_sd)
    hp_net = HeadPoseRegressor()
    head_pose_apply = lambda p, x, return_srt=False: hp_net.apply(
        p, x, return_srt)

    gen_apply = make_gen_apply(cfg, our_model, head_pose_apply, hp_vars,
                               eval_mode=True)

    batch_j = {
        "source_img": jnp.asarray(
            np.transpose(batch_t["source_img"].numpy(), (0, 2, 3, 1))),
        "target_img": jnp.asarray(
            np.transpose(batch_t["target_img"].numpy(), (0, 2, 3, 1))),
        "source_mask": jnp.ones((B, S, S, 1), jnp.float32),
        "target_mask": jnp.ones((B, S, S, 1), jnp.float32),
        "source_keypoints": jnp.asarray(batch_t["source_keypoints"].numpy()),
        "target_keypoints": jnp.asarray(batch_t["target_keypoints"].numpy()),
    }
    out, _sn = jax.jit(gen_apply)(variables, batch_j, jax.random.PRNGKey(0))
    out = jax.tree.map(np.asarray, out)
    return ref_out, out, unused_gen


def _t(x):
    return x.detach().numpy()


def test_port_consumes_generator(parity):
    _ref, _ours, unused_gen = parity
    assert not unused_gen, f"porter left generator keys unused: {unused_gen[:10]}"


def test_port_contract_and_fingerprint(parity):
    """The manifest-checksum contract (VERDICT r4 next #6): the oracle-generated
    reference state_dict passes `validate_stage1_port` (every ported leaf matches
    the model's own eval_shape init tree), `checkpoint_fingerprint` identifies
    the drop structurally, and a corrupted artifact fails FAST with a structured
    error instead of mid-drive."""
    from emoportraits_tpu.port.verify import (
        checkpoint_fingerprint,
        validate_stage1_port,
    )

    sd, cfg = _CONTRACT["sd"], _CONTRACT["cfg"]
    variables, manifest = _CONTRACT["variables"], _CONTRACT["manifest"]

    fp = checkpoint_fingerprint(sd)
    assert fp["n_keys"] == len(sd) and fp["n_params"] > 0
    assert {"local_encoder_nw", "decoder_nw", "volume_process_nw",
            "xy_generator_nw", "uv_generator_nw"} <= set(fp["prefixes"])
    # structural-only: same names+shapes with different values -> same sha256
    sd2 = {k: np.zeros(tuple(v.shape), np.float32) for k, v in sd.items()}
    assert checkpoint_fingerprint(sd2)["sha256"] == fp["sha256"]

    report = validate_stage1_port(variables, manifest, cfg)
    assert not report["shape_errors"]
    assert not report["unknown_target_paths"]
    assert report["n_matched"] > 50

    # wrong-shape artifact: one truncated kernel -> ValueError naming the path
    import copy

    bad = copy.deepcopy(variables)
    bad["params"]["decoder_nw"]["in_conv"]["kernel"] = \
        bad["params"]["decoder_nw"]["in_conv"]["kernel"][..., :1]
    with pytest.raises(ValueError, match="shape mismatches"):
        validate_stage1_port(bad, manifest, cfg)

    # wrong-stage artifact: an alien subnet path -> ValueError (unknown path)
    alien = copy.deepcopy(variables)
    alien["params"]["not_a_subnet_nw"] = {"kernel": np.zeros((1, 1), np.float32)}
    with pytest.raises(ValueError, match="unknown paths"):
        validate_stage1_port(alien, manifest, cfg)


def test_thetas_match(parity):
    ref, ours, _ = parity
    np.testing.assert_allclose(ours["source_theta"][:, :3],
                               _t(ref["source_theta"])[:, :3], atol=1e-4)
    np.testing.assert_allclose(ours["target_theta"][:, :3],
                               _t(ref["target_theta"])[:, :3], atol=1e-4)


def test_embeds_match(parity):
    ref, ours, _ = parity
    # torch idt_embed (B, C, 4, 4) -> channels-last
    # idt values are O(50-100): rtol is the meaningful bound at this magnitude
    ref_idt = np.transpose(_t(ref["idt_embed"]), (0, 2, 3, 1))
    np.testing.assert_allclose(ours["idt_embed"], ref_idt, rtol=1e-3, atol=2e-3)
    # pose embeds are O(1e3) with random fc weights: relative comparison
    np.testing.assert_allclose(ours["source_pose_embed"],
                               _t(ref["source_pose_embed"]), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(ours["target_pose_embed"],
                               _t(ref["target_pose_embed"]), rtol=1e-3, atol=2e-3)


def test_pred_target_img_matches(parity):
    ref, ours, _ = parity
    ref_img = np.transpose(_t(ref["pred_target_img"]), (0, 2, 3, 1))
    err = np.abs(ours["pred_target_img"] - ref_img)
    assert err.max() < 5e-3, (err.max(), err.mean())


def test_pred_mixing_img_matches(parity):
    ref, ours, _ = parity
    ref_img = np.transpose(_t(ref["pred_mixing_img"]), (0, 2, 3, 1))
    err = np.abs(ours["pred_mixing_img"] - ref_img)
    assert err.max() < 5e-3, (err.max(), err.mean())


def test_canonical_volume_matches(parity):
    ref, ours, _ = parity
    # torch volume (B, C, D, S, S) -> our (B, D, S, S, C)
    ref_vol = np.transpose(_t(ref["canon_volume"]), (0, 2, 3, 4, 1))
    err = np.abs(ours["canonical_volume"] - ref_vol)
    assert err.max() < 5e-3, (err.max(), err.mean())


def test_canonical_from_target_matches(parity):
    ref, ours, _ = parity
    ref_vol = np.transpose(_t(ref["canon_volume_from_target"]), (0, 2, 3, 4, 1))
    err = np.abs(ours["canon_volume_from_target"] - ref_vol)
    assert err.max() < 5e-3, (err.max(), err.mean())


def test_weights_parity_cli_protocol(parity_fixture_dir):
    """The `port.cli verify` protocol end-to-end on reference-oracle frames: port
    the full reference state_dict from a .pth, drive our model, and gate PSNR vs
    the reference G_forward outputs (VERDICT r2 #4 — one command when real
    weights land). Also the negative control: garbage expected frames fail."""
    frames_dir, stage1_pth, hp_npz, cfg_json = parity_fixture_dir
    from emoportraits_tpu.port.verify import run_verify

    report = run_verify(stage1_pth, frames_dir, head_pose=hp_npz,
                        psnr_gate=35.0, config=cfg_json)
    assert report["pass"], report
    assert report["psnr_min_db"] >= 35.0

    # negative control: corrupt the expected frame -> the gate must fail
    from PIL import Image

    rng = np.random.default_rng(0)
    noise = (rng.random((S, S, 3)) * 255).astype(np.uint8)
    Image.fromarray(noise).save(os.path.join(frames_dir, "expected_00.png"))
    report_bad = run_verify(stage1_pth, frames_dir, head_pose=hp_npz,
                            psnr_gate=35.0, config=cfg_json)
    assert not report_bad["pass"]


@pytest.fixture(scope="module")
def parity_fixture_dir(tmp_path_factory):
    """Fixture artifacts for the verify CLI: reference .pth + frames from the
    reference model's own G_forward (source/driver/expected trios)."""
    from PIL import Image

    from emoportraits_tpu.port.cli import save_ported

    ref_model, hp_sd, batch_t, ref_out = _reference_model_and_batch()
    d = tmp_path_factory.mktemp("verify_fixture")
    frames_dir = str(d / "frames")
    os.makedirs(frames_dir)

    def save_img(arr_chw, name):
        arr = np.transpose(arr_chw, (1, 2, 0))
        Image.fromarray(np.clip(arr * 255, 0, 255).astype(np.uint8)).save(
            os.path.join(frames_dir, name))

    for b in range(B):
        save_img(batch_t["target_img"][b].numpy(), f"driver_{b:02d}.png")
        save_img(ref_out["pred_target_img"][b].detach().numpy(),
                 f"expected_{b:02d}.png")
    # one source serves all drivers in the CLI protocol; the reference fixture
    # batch reuses element 0's source for element 0's pair only, so keep the
    # drive comparisons to pairs that share the source
    save_img(batch_t["source_img"][0].numpy(), "source.png")
    # element 1's expected frame came from source[1] -> drop it from the protocol
    os.remove(os.path.join(frames_dir, "driver_01.png"))
    os.remove(os.path.join(frames_dir, "expected_01.png"))

    stage1_pth = str(d / "stage1_model.pth")
    torch.save(ref_model.state_dict(), stage1_pth)
    hp_npz = str(d / "head_pose.npz")
    save_ported(port_head_pose(hp_sd)[0], hp_npz)
    cfg_json = str(d / "config.json")
    _our_config().to_json(cfg_json)
    return frames_dir, stage1_pth, hp_npz, cfg_json
