"""Shape/semantics tests for every stage-1 generator subnet and the full graph, on the
tiny config (reference has no tests; strategy per SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.models.decoder import Decoder
from emoportraits_tpu.models.expression_embedder import ExpressionEmbed, align_face_crop, theta_to_crop_grid
from emoportraits_tpu.models.head_pose import HeadPoseRegressor
from emoportraits_tpu.models.identity_embedder import IdtEmbed, adaptive_avg_pool
from emoportraits_tpu.models.local_encoder import LocalEncoder
from emoportraits_tpu.models.stage1 import VolumetricAvatar
from emoportraits_tpu.models.unet3d import Unet3D
from emoportraits_tpu.models.vpn_resblocks import VPNResBlocks
from emoportraits_tpu.models.warp_generator import WarpGenerator

CFG = tiny_config()
KEY = jax.random.PRNGKey(0)


def test_local_encoder_shape():
    m = LocalEncoder(CFG.model.local_encoder, CFG.model.volume, use_sn=False)
    x = jnp.ones((2, 64, 64, 3))
    p = m.init(KEY, x)
    y = m.apply(p, x)
    assert y.shape == (2, 4, 16, 16, 8)  # (B, D, s, s, C)


def test_idt_embedder_shape():
    m = IdtEmbed(CFG.model.idt_embedder)
    x = jnp.ones((2, 64, 64, 3))
    p = m.init(KEY, x)
    y = m.apply(p, x)
    assert y.shape == (2, 4, 4, 32)


def test_adaptive_avg_pool_matches_mean():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = adaptive_avg_pool(x, 4)
    assert y.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]), np.asarray(x[0, :2, :2].mean(axis=(0, 1))), rtol=1e-6)


def test_expression_embedder_shape():
    m = ExpressionEmbed(CFG.model.expression_embedder)
    x = jnp.ones((2, 32, 32, 3))
    p = m.init(KEY, x)
    y = m.apply(p, x)
    assert y.shape == (2, 16)


def test_theta_crop_grid_identity_is_zoom():
    # Identity theta + zoom 0.5 => grid spans [-0.5, 0.5] (2x zoom-in crop).
    theta = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    g = theta_to_crop_grid(theta, 8)
    assert g.shape == (1, 8, 8, 2)
    assert abs(float(g.min()) + 0.5) < 1e-5 and abs(float(g.max()) - 0.5) < 1e-5


def test_head_pose_regressor():
    m = HeadPoseRegressor()
    x = jnp.ones((2, 64, 64, 3))
    p = m.init(KEY, x)
    theta = m.apply(p, x)
    assert theta.shape == (2, 4, 4)
    theta, s, r, t = m.apply(p, x, return_srt=True)
    assert s.shape == (2, 3) and r.shape == (2, 3) and t.shape == (2, 3)


def test_warp_generator_shape_and_range():
    m = WarpGenerator(CFG.model.warp_generator, use_sn=False)
    e = jnp.ones((2, 4, 4, 32))
    p = m.init(KEY, e)
    warp, deltas = m.apply(p, e)
    assert warp.shape == (2, 4, 16, 16, 3)
    assert deltas.shape == (2, 4, 16, 16, 3)
    assert float(jnp.abs(deltas).max()) <= 1.0  # tanh bounded


def test_unet3d_preserves_shape():
    m = Unet3D(CFG.model.unet3d, use_sn=False)
    x = jnp.ones((2, 4, 16, 16, 8))
    p = m.init(KEY, x)
    y = m.apply(p, x)
    assert y.shape == x.shape


def test_vpn_resblocks_preserves_shape():
    m = VPNResBlocks(CFG.model.vpn_source, use_sn=False)
    x = jnp.ones((1, 4, 16, 16, 8))
    p = m.init(KEY, x)
    assert m.apply(p, x).shape == x.shape


def test_decoder_shape_and_range():
    m = Decoder(CFG.model.decoder, use_sn=False)
    feat = jnp.ones((2, 16, 16, 32))
    p = m.init(KEY, feat)
    img, tap = m.apply(p, feat)
    assert img.shape == (2, 64, 64, 3)
    assert tap is None
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    img, tap = m.apply(p, feat, stage_two=True)
    assert tap is not None and tap.shape[1] == 64


@pytest.fixture(scope="module")
def avatar_and_params():
    model = VolumetricAvatar(CFG.model)
    b = 2
    src = jnp.ones((b, 64, 64, 3)) * 0.5
    mask = jnp.ones((b, 64, 64, 1))
    tgt = jnp.ones((b, 64, 64, 3)) * 0.4
    theta = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    variables = model.init(KEY, src, mask, tgt, theta, theta)
    return model, variables, (src, mask, tgt, theta)


def test_full_generate(avatar_and_params):
    model, variables, (src, mask, tgt, theta) = avatar_and_params
    out = model.apply(variables, src, mask, tgt, theta, theta,
                      method=model.generate)
    assert out["pred_target_img"].shape == (2, 64, 64, 3)
    assert out["canonical_volume"].shape == (2, 4, 16, 16, 8)
    assert out["source_pose_embed"].shape == (2, 16)


def test_generate_with_mixing(avatar_and_params):
    model, variables, (src, mask, tgt, theta) = avatar_and_params
    out = model.apply(variables, src, mask, tgt, theta, theta,
                      mixing_theta=theta[:, :3], method=model.generate)
    assert out["pred_mixing_img"].shape == (2, 64, 64, 3)


def test_encode_drive_matches_generate(avatar_and_params):
    """The split inference path must reproduce the training-path image bitwise-closely
    (same weights, same math, different code path)."""
    model, variables, (src, mask, tgt, theta) = avatar_and_params
    out = model.apply(variables, src, mask, tgt, theta, theta, method=model.generate)
    state = model.apply(variables, src, mask, theta, method=model.encode_source)
    img, _ = model.apply(variables, state, tgt, theta, method=model.drive)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(out["pred_target_img"]), atol=1e-5)


@pytest.mark.slow  # three full-graph grad compiles
def test_remat_modes_are_semantics_preserving():
    """ModelConfig.remat / remat_policy rematerialize the local encoder, 3D U-Net and
    decoder — values AND gradients must be identical to the non-remat graph (remat only
    changes what the backward pass stores vs recomputes)."""
    import dataclasses

    rng = np.random.default_rng(7)
    b, s = 1, CFG.train.image_size
    src = jnp.asarray(rng.random((b, s, s, 3), np.float32))
    msk = jnp.ones((b, s, s, 1), jnp.float32)
    tgt = jnp.asarray(rng.random((b, s, s, 3), np.float32))
    th = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))

    def run(mcfg):
        model = VolumetricAvatar(mcfg)
        variables = model.init(jax.random.PRNGKey(0), src, msk, tgt, th, th)

        def loss(params):
            out, _ = model.apply(
                {**variables, "params": params}, src, msk, tgt, th, th,
                mutable=["sn_state"])
            return jnp.mean(out["pred_target_img"] ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree.leaves(grads)))
        return float(val), float(gnorm)

    base = run(CFG.model)
    full = run(dataclasses.replace(CFG.model, remat=True))
    dots = run(dataclasses.replace(CFG.model, remat=True, remat_policy="dots"))
    for name, got in (("full", full), ("dots", dots)):
        np.testing.assert_allclose(got[0], base[0], rtol=1e-5, err_msg=name)
        np.testing.assert_allclose(got[1], base[1], rtol=1e-4, err_msg=name)
