"""Tests for profiling, visuals, and the closed-form theta-from-keypoints fit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.geometry.transforms import euler_to_rotation
from emoportraits_tpu.models.expression_embedder import estimate_theta_from_keypoints
from emoportraits_tpu.utils.profiling import phase_report, phase_timer
from emoportraits_tpu.utils.visuals import draw_stickman, make_visuals_grid


def test_phase_timer_and_report():
    with phase_timer("unit_phase"):
        _ = sum(range(1000))
    rep = phase_report(reset=True)
    assert "unit_phase" in rep and rep["unit_phase"]["count"] == 1
    assert phase_report() == {}


def test_draw_stickman():
    rng = np.random.default_rng(0)
    kp = rng.uniform(-0.8, 0.8, (68, 2)).astype(np.float32)
    img = draw_stickman(kp, 64)
    assert img.shape == (64, 64, 3)
    assert img.max() > 0  # something was drawn


def test_visuals_grid():
    panels = {
        "a": np.random.default_rng(1).random((2, 16, 16, 3)).astype(np.float32),
        "b": np.random.default_rng(2).random((2, 16, 16, 1)).astype(np.float32),
    }
    grid = make_visuals_grid(panels)
    assert grid.shape == (32, 32, 3)


def test_estimate_theta_from_keypoints_recovers_pose():
    rng = np.random.default_rng(3)
    canonical = rng.standard_normal((68, 3)).astype(np.float32)
    rot = np.asarray(euler_to_rotation(
        jnp.asarray(rng.uniform(-0.4, 0.4, (2, 3)).astype(np.float32))))
    scale = np.array([1.2, 0.8], np.float32)
    t = rng.uniform(-0.2, 0.2, (2, 3)).astype(np.float32)
    # keypoints = inverse-transform of canonical
    kp = np.einsum("bij,bnj->bni", np.transpose(rot, (0, 2, 1)),
                   (canonical[None] - t[:, None])) / scale[:, None, None]
    theta = np.asarray(estimate_theta_from_keypoints(jnp.asarray(kp),
                                                     jnp.asarray(canonical)))
    # applying theta to keypoints must recover the canonical template
    mapped = np.einsum("bij,bnj->bni", theta[:, :3, :3], kp) + theta[:, None, :3, 3]
    np.testing.assert_allclose(mapped, np.broadcast_to(canonical, (2, 68, 3)),
                               atol=1e-3)


def test_fit_similarity_transform_matches_umeyama_on_clean_data():
    """The LM fit (method='fit') and the closed-form Umeyama path solve the same
    7-param similarity problem — on noise-free data both must recover the map."""
    rng = np.random.default_rng(4)
    canonical = rng.standard_normal((68, 3)).astype(np.float32)
    rot = np.asarray(euler_to_rotation(
        jnp.asarray(rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32))))
    scale = np.array([1.15, 0.9], np.float32)
    t = rng.uniform(-0.2, 0.2, (2, 3)).astype(np.float32)
    kp = np.einsum("bij,bnj->bni", np.transpose(rot, (0, 2, 1)),
                   (canonical[None] - t[:, None])) / scale[:, None, None]
    theta = np.asarray(estimate_theta_from_keypoints(
        jnp.asarray(kp), jnp.asarray(canonical), method="fit"))
    mapped = np.einsum("bij,bnj->bni", theta[:, :3, :3], kp) + theta[:, None, :3, 3]
    np.testing.assert_allclose(mapped, np.broadcast_to(canonical, (2, 68, 3)),
                               atol=2e-3)


def test_fit_sep_scales_recovers_anisotropic_map():
    """lpe_head_transform_sep_scales: per-axis scales are outside the Umeyama
    similarity family — only the iterative fit can drive the residual to zero."""
    from emoportraits_tpu.geometry.transforms import fit_similarity_transform

    rng = np.random.default_rng(5)
    canonical = rng.standard_normal((68, 3)).astype(np.float32)
    rot = np.asarray(euler_to_rotation(
        jnp.asarray(rng.uniform(-0.25, 0.25, (2, 3)).astype(np.float32))))
    scale = np.array([[1.3, 0.8, 1.1], [0.7, 1.2, 0.95]], np.float32)
    t = rng.uniform(-0.15, 0.15, (2, 3)).astype(np.float32)
    # keypoints = inverse of (S R (kp + t)): kp = R^T S^-1 canon - t
    kp = (np.einsum("bij,bnj->bni", np.transpose(rot, (0, 2, 1)),
                    canonical[None] / scale[:, None, :]) - t[:, None])
    theta = np.asarray(fit_similarity_transform(
        jnp.asarray(kp), jnp.asarray(canonical), sep_scales=True, iters=20))
    mapped = np.einsum("bij,bnj->bni", theta[:, :3, :3], kp) + theta[:, None, :3, 3]
    fit_mse = float(np.mean((mapped - canonical[None]) ** 2))
    assert fit_mse < 1e-5, fit_mse
    # closed-form similarity (single scale) cannot represent this map
    theta_u = np.asarray(estimate_theta_from_keypoints(
        jnp.asarray(kp), jnp.asarray(canonical), method="umeyama"))
    mapped_u = (np.einsum("bij,bnj->bni", theta_u[:, :3, :3], kp)
                + theta_u[:, None, :3, 3])
    umeyama_mse = float(np.mean((mapped_u - canonical[None]) ** 2))
    assert umeyama_mse > 100 * max(fit_mse, 1e-9)


def test_fit_matches_or_beats_reference_lbfgs_objective():
    """On noisy landmarks (no exact solution) the LM fit must reach at-least-as-low
    a value of the REFERENCE's own objective (MSE of kp @ theta^T vs canonical,
    expression_embedder.py:283-292) as 5 steps of torch LBFGS do — the reference
    optimizer run as a black-box oracle with its own matrix builder."""
    import ref_oracle

    if not ref_oracle.reference_available():
        pytest.skip("reference not present")
    ref_oracle.install_stubs()
    import torch
    from networks.volumetric_avatar.expression_embedder import (
        get_similarity_transform_matrix as ref_matrix,
    )

    from emoportraits_tpu.geometry.transforms import fit_similarity_transform

    rng = np.random.default_rng(6)
    canonical = rng.standard_normal((68, 3)).astype(np.float32)
    rot = np.asarray(euler_to_rotation(
        jnp.asarray(rng.uniform(-0.3, 0.3, (2, 3)).astype(np.float32))))
    t = rng.uniform(-0.2, 0.2, (2, 3)).astype(np.float32)
    kp = (np.einsum("bij,bnj->bni", np.transpose(rot, (0, 2, 1)),
                    (canonical[None] - t[:, None])) / 1.1
          + 0.05 * rng.standard_normal((2, 68, 3)).astype(np.float32))

    def ref_objective(theta):  # theta (B, 3, 4) numpy
        kph = np.concatenate([kp, np.ones((2, 68, 1), np.float32)], axis=-1)
        mapped = np.einsum("bnk,bjk->bnj", kph, theta)
        return float(np.mean((mapped - canonical[None]) ** 2))

    # reference optimizer: 5 LBFGS steps over (scale, euler, translation)
    params = [torch.ones(2, 1, requires_grad=True),
              torch.zeros(2, 3, requires_grad=True),
              torch.zeros(2, 3, requires_grad=True)]
    opt = torch.optim.LBFGS(params)
    kp_t = torch.from_numpy(np.concatenate(
        [kp, np.ones((2, 68, 1), np.float32)], axis=-1))
    canon_t = torch.from_numpy(np.broadcast_to(canonical, (2, 68, 3)).copy())

    def closure():
        opt.zero_grad()
        theta = ref_matrix(*params)
        loss = ((kp_t @ theta.transpose(1, 2) - canon_t) ** 2).mean()
        loss.backward()
        return loss

    for _ in range(5):
        opt.step(closure)
    ref_theta = ref_matrix(*params).detach().numpy()

    ours = np.asarray(fit_similarity_transform(
        jnp.asarray(kp), jnp.asarray(canonical), iters=10))[:, :3]
    assert ref_objective(ours) <= ref_objective(ref_theta) * 1.02


def test_ema_and_weight_init():
    from emoportraits_tpu.utils.ema import ema_init, ema_update
    from emoportraits_tpu.utils.weight_init import reinit_tree

    params = {"a": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones((8,))}}
    ema = ema_init(params)
    new_params = jax.tree.map(lambda x: x * 3.0, params)
    ema2 = ema_update(ema, new_params, decay=0.5)
    np.testing.assert_allclose(np.asarray(ema2["a"]["kernel"][0, 0, 0, 0]), 2.0)

    re = reinit_tree(params, jax.random.PRNGKey(0), "xavier", gain=1.0)
    assert float(jnp.abs(re["a"]["bias"]).max()) == 0.0
    k = np.asarray(re["a"]["kernel"])
    assert abs(k.std() - (2.0 / (36 + 72)) ** 0.5) < 0.05


def test_stills_and_video_datasets(tmp_path):
    from PIL import Image

    from emoportraits_tpu.data.stills import StillsDataset, VideoFrameDataset

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(d / f"{i}.png")
    ds = StillsDataset(str(d), image_size=16)
    batch = next(ds.batches(2))
    assert batch["source_img"].shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(batch["source_img"], batch["target_img"])

    vid = VideoFrameDataset(str(d), image_size=16)
    frames = list(vid)
    assert len(frames) == 3 and frames[0].shape == (16, 16, 3)


@pytest.mark.slow
def test_match_neutral_branch():
    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    cfg = tiny_config().model
    model = VolumetricAvatar(cfg)
    b = 1
    src = jnp.ones((b, 64, 64, 3)) * 0.5
    mask = jnp.ones((b, 64, 64, 1))
    theta = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), src, mask, src, theta, theta)
    out = model.apply(variables, src, mask, src, theta, theta,
                      match_neutral=True, method=model.generate)
    assert out["pred_neutral_img"].shape == (b, 64, 64, 3)
    assert out["pred_neutral_expr_vector"].shape == (b, cfg.expression_dim)
