"""Tests for auxiliary components: LPIPS, gaze loss, face vectors, PCA metrics, extra
losses, background path, matting, face parsing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import LocalEncoderConfig, VolumeConfig, tiny_config
from emoportraits_tpu.losses.extras import (
    affine_loss,
    equivariance_loss,
    head_pose_matching_loss,
    random_tps_grid,
    segmentation_loss,
    warp_reg_loss,
)
from emoportraits_tpu.losses.face_vector import face_vector_cosine_loss, make_face_vector_tower
from emoportraits_tpu.losses.gaze import eye_crop_grid, gaze_loss, make_gaze_tower
from emoportraits_tpu.losses.lpips import LPIPS
from emoportraits_tpu.models.background import BackgroundAdding, BackgroundEncoder, UNet2D
from emoportraits_tpu.models.face_parsing import BiSeNet, FaceParser
from emoportraits_tpu.models.matting import MattingNet
from emoportraits_tpu.utils.pca_metrics import pca_metrics

KEY = jax.random.PRNGKey(0)


def test_lpips_zero_self_and_positive_other():
    m = LPIPS()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    p = m.init(KEY, a, b)
    self_d = float(m.apply(p, a, a))
    cross_d = float(m.apply(p, a, b))
    assert self_d < 1e-6
    assert cross_d > self_d


@pytest.mark.slow  # compile-heavy: excluded from the quick loop
def test_gaze_loss_runs():
    apply_fn, params = make_gaze_tower(KEY)
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    kp = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 68, 2)).astype(np.float32))
    g = eye_crop_grid(kp, tuple(range(36, 42)))
    assert g.shape == (2, 36, 60, 2)
    val = float(gaze_loss(apply_fn, params, pred, tgt, kp))
    assert np.isfinite(val) and val > 0
    assert float(gaze_loss(apply_fn, params, pred, pred, kp)) < 1e-6


def test_face_vector_cosine():
    embed, params = make_face_vector_tower(KEY, image_size=64)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    loss = jax.jit(lambda p, x, y: face_vector_cosine_loss(embed, p, x, y))
    assert float(loss(params, a, a)) < 1e-5
    assert np.isfinite(float(loss(params, a, b)))


def test_pca_metrics_low_rank():
    rng = np.random.default_rng(3)
    basis = rng.standard_normal((4, 32))
    vecs = rng.standard_normal((200, 4)) @ basis  # rank-4 data
    m = pca_metrics(vecs, n_comp=32)
    assert m["n_99"] <= 5
    assert 0 < m["auc"] <= 1.01
    assert m["explained_variance_ratio"].shape == (32,)


def test_extra_losses():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    target = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
    assert np.isfinite(float(segmentation_loss(logits, target)))

    t1 = jnp.asarray(rng.standard_normal((2, 3, 4)).astype(np.float32))
    t2 = jnp.asarray(rng.standard_normal((2, 3, 4)).astype(np.float32))
    assert float(head_pose_matching_loss(t1, t1)) == 0.0
    assert float(head_pose_matching_loss(t1, t2)) > 0.0
    assert float(affine_loss([t1], [t1])) == 0.0

    deltas = [jnp.full((1, 4, 8, 8, 3), 0.1)]
    w0 = float(warp_reg_loss(deltas, jnp.asarray(0)))
    w100 = float(warp_reg_loss(deltas, jnp.asarray(100)))
    assert w100 < w0  # staircase decay

    grid = random_tps_grid(KEY, 2, 16, 16)
    assert grid.shape == (2, 16, 16, 2)
    # keypoint_fn: centroid-of-mass of intensity — equivariance loss finite
    img = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))

    def kp_fn(im):
        return jnp.stack([jnp.mean(im[..., 0], axis=(1, 2)),
                          jnp.mean(im[..., 1], axis=(1, 2))], -1)[:, None, :]

    assert np.isfinite(float(equivariance_loss(kp_fn, img, KEY)))


def test_background_path_modules():
    cfg = tiny_config().model
    enc = BackgroundEncoder(cfg.local_encoder, cfg.volume, out_channels=16)
    x = jnp.ones((1, 64, 64, 3))
    p = enc.init(KEY, x)
    feats = enc.apply(p, x)
    assert feats.shape == (1, 16, 16, 16)

    unet = UNet2D(out_channels=32, base=8, levels=2)
    p = unet.init(KEY, feats)
    bg = unet.apply(p, feats)
    assert bg.shape == (1, 16, 16, 32)

    merge = BackgroundAdding(32)
    fg = jnp.ones((1, 16, 16, 32))
    p = merge.init(KEY, fg, bg)
    assert merge.apply(p, fg, bg).shape == (1, 16, 16, 32)


@pytest.mark.slow  # compile-heavy: excluded from the quick loop
def test_stage1_use_back_and_use_tensor():
    import dataclasses

    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    cfg = dataclasses.replace(tiny_config().model, use_back=True, use_tensor=True)
    model = VolumetricAvatar(cfg)
    b = 2
    src = jnp.ones((b, 64, 64, 3)) * 0.5
    mask = jnp.ones((b, 64, 64, 1)) * 0.8
    theta = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    variables = model.init(KEY, src, mask, src, theta, theta)
    assert "avarage_tensor_ts" in variables["params"]
    out = model.apply(variables, src, mask, src, theta, theta, method=model.generate)
    assert out["pred_target_img"].shape == (b, 64, 64, 3)


def test_matting_net():
    m = MattingNet(base_channels=4, num_levels=2)
    img = jnp.ones((1, 64, 64, 3)) * 0.3
    p = m.init(KEY, img)
    alpha = m.apply(p, img)
    assert alpha.shape == (1, 64, 64, 1)
    assert 0.0 <= float(alpha.min()) and float(alpha.max()) <= 1.0


def test_face_parser_masks():
    parser = FaceParser()
    parser.init(KEY, image_size=64)
    img = jnp.asarray(np.random.default_rng(5).random((1, 64, 64, 3),
                                                      dtype=np.float32))
    masks = parser(img)
    for k in ("mask", "face", "eyes", "mouth", "ears", "cloth", "body"):
        assert masks[k].shape == (1, 64, 64, 1), k
        assert float(masks[k].max()) <= 1.0 and float(masks[k].min()) >= 0.0


def test_senet50_shapes():
    from emoportraits_tpu.models.backbones.senet import SENet50

    net = SENet50(layers=(1, 1, 1, 1))  # shallow variant for test speed
    x = jnp.ones((1, 64, 64, 3))
    p = net.init(KEY, x)
    emb, taps = net.apply(p, x)
    assert emb.shape == (1, 2048)
    assert set(taps) == {"relu1", "relu2", "relu3", "relu4", "relu5"}
    assert taps["relu5"].shape[-1] == 2048


def test_tower_provenance_and_strict_mode():
    """build_loss_towers reports per-tower weight provenance; strict mode rejects
    stand-ins (VERDICT r2: prod runs must not silently use non-reference matting)."""
    import pytest

    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.train.towers import assert_towers_ported, build_loss_towers

    cfg = tiny_config()
    towers, frozen = build_loss_towers(cfg, KEY, tiny=True)
    prov = frozen.provenance
    assert prov["head_pose"] == "tiny"
    assert prov["vgg19"] == "tiny" and prov["gaze"] == "tiny"
    assert prov["matting"] == "standin_tiny"
    with pytest.raises(RuntimeError, match="strict-towers"):
        assert_towers_ported(frozen)

    # supplying variables flips the entries to 'ported'
    vars2 = {"vgg19": towers.vgg19_params, "modnet": {"params": {}}}
    _, frozen2 = build_loss_towers(cfg, KEY, vars2, tiny=True)
    assert frozen2.provenance["vgg19"] == "ported"
    assert frozen2.provenance["matting"] == "modnet_ported"
