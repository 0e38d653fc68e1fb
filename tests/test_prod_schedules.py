"""Off-in-prod reference schedules and the round-4 aug/config knobs:

  * unet_first (va.py:194-218, 505-537): U-Net before the source warps, secondary
    U-Net after — generate / canonical_from_target / encode_source all run;
  * detach_lat_vol (va.py:512-514): on gated iterations the local encoder gets NO
    gradient from the image loss;
  * freeze_proc_nw (va.py:517-524): on gated iterations volume_process params and
    moments hold;
  * color jitter parity mechanics (hue roundtrip, p-gate, pair consistency).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.models.stage1 import VolumetricAvatar


def _tiny_model(**model_over):
    cfg = tiny_config()
    # SN power iteration + WS reparameterization add several primitives to
    # EVERY conv, and these tests gate graph ORDERING / gradient GATING /
    # branch selection — not norm semantics (covered by test_blocks /
    # test_stage1_port). Dropping them cuts the dominant cost here, which is
    # jaxpr tracing of the full model, not execution.
    model_over.setdefault("use_sn", False)
    model_over.setdefault("use_ws", False)
    m = dataclasses.replace(cfg.model, **model_over)
    return cfg, VolumetricAvatar(m)


def _inputs(rng, s=64):
    r = np.random.default_rng(rng)
    theta = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    theta[:, :3, 3] = 0.05 * r.standard_normal((2, 3))
    return (jnp.asarray(r.random((2, s, s, 3), np.float32)),
            jnp.ones((2, s, s, 1), jnp.float32),
            jnp.asarray(r.random((2, s, s, 3), np.float32)),
            jnp.asarray(theta), jnp.asarray(theta))


def test_unet_first_paths_run_and_differ():
    from emoportraits_tpu.config import Unet3DConfig

    cfg, model = _tiny_model()
    # secondary U-Net sized to the tiny volume (reference unet3d_cfg_s role)
    u_s = Unet3DConfig(channels=8, size=16, depth=4, dummy_input_size=4,
                       max_channels=32)
    _, model_uf = _tiny_model(unet_first=True, unet3d_s=u_s)
    args = _inputs(0)
    # The BASELINE model only feeds shape/param-count comparisons -> pure
    # eval_shape (abstract trace, nothing compiled or executed). Only the
    # unet_first variant runs for real (jitted; the conftest cache persists it).
    v = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    out = jax.eval_shape(
        lambda v, *a: model.apply(v, *a, mutable=["sn_state"])[0], v, *args)
    v_uf = jax.jit(model_uf.init)(jax.random.PRNGKey(0), *args)
    out_uf = jax.jit(
        lambda v, *a: model_uf.apply(v, *a, mutable=["sn_state"])[0])(v_uf, *args)
    assert out_uf["pred_target_img"].shape == out["pred_target_img"].shape
    assert jnp.isfinite(out_uf["pred_target_img"]).all()
    # different graph ordering + different volume_source net => different params
    ps = jax.tree_util.tree_leaves(v_uf["params"]["volume_source_nw"])
    assert sum(x.size for x in ps) != sum(
        x.size for x in jax.tree_util.tree_leaves(v["params"]["volume_source_nw"]))
    # canonical_from_target + encode_source also run under unet_first
    st = jax.jit(lambda v, a, b, c: model_uf.apply(
        v, a, b, c, method=model_uf.encode_source, mutable=["sn_state"])[0])(
        v_uf, args[0], args[1], args[3])
    assert jnp.isfinite(st.canonical_volume).all()
    canon = jax.jit(lambda v, a, b, pe, ie, th: model_uf.apply(
        v, a, b, pe, ie, th, 1.0,
        method=model_uf.canonical_from_target, mutable=["sn_state"])[0])(
        v_uf, args[2], args[1], out_uf["target_pose_embed"],
        out_uf["idt_embed"], args[4])
    assert jnp.isfinite(canon).all()


def test_detach_lat_vol_cuts_encoder_gradient_on_gated_steps():
    cfg, model = _tiny_model(detach_lat_vol=2)
    args = _inputs(1)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), *args)

    def loss(params, step):
        out = model.apply({**v, "params": params}, *args,
                          step=step, method=model.generate,
                          mutable=["sn_state"])[0]
        return jnp.sum(out["pred_target_img"] ** 2)

    # step is a TRACED argument: one jitted grad program (cached by the
    # conftest compile cache) serves both parities — eager op-by-op AD made
    # this the slowest fast test at ~65 s
    grad_fn = jax.jit(jax.grad(loss))
    g_on = grad_fn(v["params"], jnp.asarray(0))   # 0 % 2 == 0 -> detached
    g_off = grad_fn(v["params"], jnp.asarray(1))  # 1 % 2 != 0 -> attached
    n_on = sum(float(jnp.abs(x).sum())
               for x in jax.tree_util.tree_leaves(g_on["local_encoder_nw"]))
    n_off = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g_off["local_encoder_nw"]))
    assert n_on == 0.0
    assert n_off > 0.0
    # other subnets keep gradients on the gated step (only the latent is cut)
    n_dec = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g_on["decoder_nw"]))
    assert n_dec > 0.0


def test_decompose_transform_matrix_roundtrip():
    from emoportraits_tpu.geometry.transforms import (
        decompose_transform_matrix,
        get_transform_matrix,
    )

    r = np.random.default_rng(5)
    scale = jnp.asarray(1.0 + 0.3 * r.standard_normal((3, 3)).astype(np.float32))
    rot = jnp.asarray(0.4 * r.standard_normal((3, 3)).astype(np.float32))
    tr = jnp.asarray(0.2 * r.standard_normal((3, 3)).astype(np.float32))
    theta = get_transform_matrix(scale, rot, tr)
    s2, r2, t2 = decompose_transform_matrix(theta)
    np.testing.assert_allclose(s2, scale, atol=1e-5)
    np.testing.assert_allclose(r2, rot, atol=1e-5)
    np.testing.assert_allclose(t2, tr, atol=1e-5)


def test_theta_from_keypoints_training_branch():
    """make_gen_apply(head_pose_apply=None): thetas are fitted from the stored
    landmarks (reference estimate_head_pose_from_keypoints=False, va.py:380-384)
    and the forward runs end to end; the fit recovers the generating transform."""
    from emoportraits_tpu.geometry.transforms import get_transform_matrix
    from emoportraits_tpu.models.expression_embedder import (
        estimate_theta_from_keypoints,
    )
    from emoportraits_tpu.train.forward import make_gen_apply

    r = np.random.default_rng(9)
    canon = jnp.asarray(0.5 * r.standard_normal((68, 3)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.2 * r.standard_normal((2, 1)).astype(np.float32))
    rot = jnp.asarray(0.3 * r.standard_normal((2, 3)).astype(np.float32))
    tr = jnp.asarray(0.1 * r.standard_normal((2, 3)).astype(np.float32))
    theta_true = get_transform_matrix(scale, rot, tr)
    # theta maps keypoints -> canonical, so keypoints = inv(theta) applied to it
    inv = jnp.linalg.inv(theta_true)
    canon_h = jnp.concatenate([canon, jnp.ones((68, 1))], -1)
    kp = jnp.einsum("nk,bjk->bnj", canon_h, inv)[..., :3]
    fitted = estimate_theta_from_keypoints(kp, canon)
    np.testing.assert_allclose(fitted, theta_true, atol=1e-3)

    cfg, model = _tiny_model()
    args = _inputs(2)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    gen_apply = make_gen_apply(cfg, model, None, None,
                               canonical_keypoints=canon)
    batch = {"source_img": args[0], "target_img": args[2],
             "source_mask": args[1], "target_mask": args[1],
             "source_keypoints": kp, "target_keypoints": kp}
    # deliberately eager: jitting these two one-shot forwards measured SLOWER
    # even warm (trace time ~30 s for the LM-fit graph vs ~10 s eager total)
    out, _ = gen_apply(v, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(out["pred_target_img"]).all()
    # the config knob requiring the iterative path is honored (sep_scales forces
    # the 9-param LM fit; smoke: still finite and close to the 7-param truth)
    cfg_fit = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, expression_embedder=dataclasses.replace(
                cfg.model.expression_embedder, theta_fit_method="fit",
                theta_fit_sep_scales=True)))
    gen_apply_fit = make_gen_apply(cfg_fit, model, None, None,
                                   canonical_keypoints=canon)
    out_fit, _ = gen_apply_fit(v, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(out_fit["pred_target_img"]).all()


def test_estimate_head_pose_flag_maps_inverted():
    from emoportraits_tpu.config import from_reference_args

    cfg, _ = from_reference_args("--estimate_head_pose_from_keypoints False")
    assert cfg.model.theta_from_keypoints is True
    cfg, _ = from_reference_args("--estimate_head_pose_from_keypoints True")
    assert cfg.model.theta_from_keypoints is False


def test_color_jitter_hue_and_pair_consistency():
    from emoportraits_tpu.data.augment import (
        _hsv_to_rgb,
        _rgb_to_hsv,
        apply_jitter,
        color_jitter,
        sample_jitter_params,
    )

    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3), np.float32)
    # HSV roundtrip is identity
    np.testing.assert_allclose(_hsv_to_rgb(_rgb_to_hsv(img)), img, atol=1e-5)
    # a full-turn hue shift is identity; a half-turn twice is identity
    hsv = _rgb_to_hsv(img)
    hsv2 = hsv.copy()
    hsv2[..., 0] = (hsv2[..., 0] + 0.5) % 1.0
    hsv2[..., 0] = (hsv2[..., 0] + 0.5) % 1.0
    np.testing.assert_allclose(_hsv_to_rgb(hsv2), img, atol=1e-5)
    # hue-only jitter preserves per-pixel max (HSV value channel)
    out = color_jitter(img, rng, brightness=0, contrast=0, saturation=0, hue=0.3)
    np.testing.assert_allclose(out.max(-1), img.max(-1), atol=1e-5)
    assert np.abs(out - img).max() > 1e-3
    # p-gate: p=0 never fires
    assert sample_jitter_params(rng, 0.3, 0.3, 0.3, 0.3, p=0.0) is None
    # pair consistency: one param draw -> identical transform on both frames
    params = sample_jitter_params(rng, 0.3, 0.3, 0.3, 0.3, p=1.0)
    a = apply_jitter(img, params)
    b = apply_jitter(img, params)
    np.testing.assert_array_equal(a, b)


def test_pair_dataset_prod_aug_strengths():
    """PairDataset applies the aug_color_coef-derived jitter and emits jittered
    warp_aug streams; augment_color=False leaves frames un-jittered."""
    from emoportraits_tpu.data.pairs import PairDataset
    from emoportraits_tpu.data.records import ShardedClipStore, make_synthetic_store

    root = "/tmp/emos_prod_sched_store"
    make_synthetic_store(root, num_clips=2, frames_per_clip=3, image_size=32)
    store = ShardedClipStore(root, split="train")
    ds = PairDataset(store, 32, augment=True, augment_geometric=False,
                     aug_color_coef=10.0, seed=1)
    assert ds.jitter["hue"] == pytest.approx(0.3)
    assert ds.jitter["brightness"] == pytest.approx(0.3)
    s = ds.sample_pair()
    assert "source_warp_aug" in s and "target_warp_aug" in s
    assert s["source_img"].shape == (32, 32, 3)
    ds_plain = PairDataset(store, 32, augment=True, augment_geometric=False,
                           augment_color=False, seed=1)
    s2 = ds_plain.sample_pair()
    assert s2["source_img"].shape == (32, 32, 3)


def test_trainer_trace_knobs_follow_config():
    """TrainConfig.{bf16_gn_stats,gn_lane_pack,fuse_down_convs} reach the
    ops-level trace-time globals via apply_trace_knobs (what Trainer.__init__
    runs first) — the config-level path to the batch-2 production-geometry
    stack, not just the bench env vars."""
    from emoportraits_tpu.ops import blocks
    from emoportraits_tpu.train.trainer import apply_trace_knobs

    cfg = tiny_config()
    b2 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, bf16_gn_stats=True, gn_lane_pack=True,
        fuse_down_convs=False))
    try:
        apply_trace_knobs(b2)
        assert blocks._GN_LOWP_STATS and blocks._GN_LANE_PACK
        assert not blocks._FUSE_DOWN
    finally:
        apply_trace_knobs(cfg)  # defaults restore: lowp off, pack off, fuse on
    assert not blocks._GN_LOWP_STATS and not blocks._GN_LANE_PACK
    assert blocks._FUSE_DOWN
