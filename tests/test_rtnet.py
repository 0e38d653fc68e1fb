"""RTNet-role tanh-polar face parser (models/rtnet.py, geometry/roi_tanh_polar.py).

Reference: the external `ibug.face_parsing.FaceParser` (rtnet50 + fcn, 14 classes)
wrapped by `FaceParsingBUG` (utils/non_specific.py:246-282) and looped per sample in
va.py:300-321 (use_ibug_mask=True, use_old_fp=False). Golden checks here cover the
new Conv dilation against torch, the dilated-trunk output stride, the tanh-polar
warp/restore roundtrip, and the train-forward wiring of the rtnet mask branch.
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from emoportraits_tpu.geometry.roi_tanh_polar import (
    roi_from_keypoints,
    roi_tanh_polar_restore,
    roi_tanh_polar_warp,
)
from emoportraits_tpu.models.backbones.resnet import ResNet
from emoportraits_tpu.models.rtnet import RTNetParser, tiny_rtnet
from emoportraits_tpu.ops.blocks import Conv


def test_conv_dilation_matches_torch():
    """Conv(kernel_dilation=2, SAME) == torch conv2d(dilation=2, padding=2)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 9, 4), dtype=np.float32)
    conv = Conv(5, (3, 3), kernel_dilation=2)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = conv.apply(params, jnp.asarray(x))

    k = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
    w = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    b = torch.from_numpy(np.asarray(params["params"]["bias"]))
    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), w, b, dilation=2, padding=2
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)


def test_dilated_resnet_output_stride_8():
    """replace_stride_with_dilation=(False, True, True) turns the /32 trunk into /8
    (torchvision FCN semantics) without renaming any parameter (port-compatible)."""
    net = ResNet(layers=(1, 1, 1, 1), block="bottleneck", base_width=8,
                 replace_stride_with_dilation=(False, True, True))
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape[1:3] == (8, 8)  # 64/8, not 64/32

    plain = ResNet(layers=(1, 1, 1, 1), block="bottleneck", base_width=8)
    p2 = plain.init(jax.random.PRNGKey(0), x)
    shapes = lambda p: {jax.tree_util.keystr(k): v.shape for k, v in
                        jax.tree_util.tree_leaves_with_path(p["params"])}
    assert shapes(params) == shapes(p2)
    assert plain.apply(p2, x).shape[1:3] == (2, 2)


def test_roi_tanh_polar_roundtrip():
    """warp -> restore is identity (up to two bilinear resamplings) inside the RoI."""
    rng = np.random.default_rng(5)
    # smooth image so bilinear resampling error stays small
    base = rng.random((1, 8, 8, 3), dtype=np.float32)
    img = jax.image.resize(jnp.asarray(base), (1, 64, 64, 3), "bilinear")
    roi = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])
    polar = roi_tanh_polar_warp(img, roi, 128, 128)
    back = roi_tanh_polar_restore(polar, roi, 64, 64)
    # compare on the central face region (the tanh grid focuses samples there)
    err = jnp.abs(back - img)[:, 24:40, 24:40]
    assert float(err.mean()) < 0.02, float(err.mean())


def test_roi_from_keypoints_square():
    kp = jnp.zeros((2, 68, 2))
    kp = kp.at[:, 0].set(jnp.asarray([-0.5, -0.25]))
    kp = kp.at[:, 1].set(jnp.asarray([0.5, 0.25]))
    roi = roi_from_keypoints(kp, 64, expand=1.0)
    roi = np.asarray(roi)
    w = roi[:, 2] - roi[:, 0]
    h = roi[:, 3] - roi[:, 1]
    np.testing.assert_allclose(w, h)  # square-expanded
    np.testing.assert_allclose(w, 32.0)  # max extent: 1.0 in [-1,1] = 32 px


def test_rtnet_face_mask_shapes_and_range():
    net = tiny_rtnet()
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 64, 64, 3))
    kp = jax.random.uniform(key, (2, 68, 2), minval=-0.5, maxval=0.5)
    params = net.init(key, img, jnp.asarray([[8.0, 8.0, 56.0, 56.0],
                                             [4.0, 4.0, 60.0, 60.0]]))
    mask = jax.jit(lambda p, i, k: net.apply(
        p, i, k, method=net.face_mask_from_keypoints))(params, img, kp)
    assert mask.shape == (2, 64, 64, 1)
    assert 0.0 <= float(mask.min()) and float(mask.max()) <= 1.0


def test_rtnet_polar_trunk_geometry():
    """The parser runs the trunk at polar_size with output-stride 8 and returns
    per-pixel class logits at polar resolution."""
    net = RTNetParser(num_classes=14, polar_size=32, base_width=8)
    img = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(1), img,
                      jnp.asarray([[4.0, 4.0, 28.0, 28.0]]))
    logits = net.apply(params, img, method=net.logits_polar)
    assert logits.shape == (1, 32, 32, 14)


@pytest.mark.slow
def test_ibug_rtnet_forward_wiring():
    """use_ibug_mask=True + use_old_fp=False: towers build the rtnet frozen net,
    gen_apply refines masks with it, and rtnet params ride the tower pytree."""
    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.stage1 import VolumetricAvatar
    from emoportraits_tpu.train.forward import make_gen_apply
    from emoportraits_tpu.train.step import tower_params_pytree
    from emoportraits_tpu.train.towers import build_loss_towers

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, use_ibug_mask=True, use_old_fp=False))
    key = jax.random.PRNGKey(0)
    towers, frozen = build_loss_towers(cfg, key, tiny=True)
    assert frozen.rtnet is not None
    tp = tower_params_pytree(towers, frozen)
    assert "rtnet_params" in tp

    model = VolumetricAvatar(cfg.model)
    b, s = 2, cfg.train.image_size
    rng = np.random.default_rng(7)
    batch = {
        "source_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "source_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "target_mask": jnp.ones((b, s, s, 1), jnp.float32),
        "source_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
        "target_keypoints": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, 68, 2)).astype(np.float32)),
    }
    theta = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    gen_vars = model.init(key, batch["source_img"], batch["source_mask"],
                          batch["target_img"], theta, theta)
    gen_apply = make_gen_apply(cfg, model, towers.head_pose_apply,
                               towers.head_pose_params,
                               face_parsing=frozen.face_parsing,
                               matting=frozen.matting, rtnet=frozen.rtnet)
    out, _ = jax.jit(gen_apply)(gen_vars, batch, jax.random.PRNGKey(1),
                                aux_params=tp)
    ref_mask = np.asarray(out["refined_target_mask"])
    assert ref_mask.shape == (b, s, s, 1)
    assert np.isfinite(ref_mask).all()
    # the refinement is a gate: refined <= dataset mask everywhere
    assert (ref_mask <= 1.0 + 1e-6).all()
    assert np.isfinite(np.asarray(out["pred_target_img"])).all()
