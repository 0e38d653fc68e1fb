"""Loss zoo tests: torch-parity for metrics and cosine losses, semantics for GAN losses."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.losses import (
    adversarial_loss_dis,
    adversarial_loss_gen,
    contrastive_exp_loss,
    cosine_embedding_loss,
    feature_matching_loss,
    make_vgg19_tower,
    ms_ssim,
    perceptual_loss,
    psnr,
    pull_loss,
    push_loss,
    r1_penalty,
    ssim,
    stm_loss,
)
from emoportraits_tpu.models.discriminator import MultiScaleDiscriminator

KEY = jax.random.PRNGKey(0)


def test_psnr_matches_definition():
    rng = np.random.default_rng(0)
    a = rng.random((2, 16, 16, 3)).astype(np.float32)
    b = rng.random((2, 16, 16, 3)).astype(np.float32)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    per = [20 * np.log10(1.0 / np.sqrt(((a[i] - b[i]) ** 2).mean())) for i in range(2)]
    assert abs(ours - np.mean(per)) < 1e-3


def test_ssim_identity_is_one_and_matches_pytorch_msssim_construction():
    rng = np.random.default_rng(1)
    a = rng.random((1, 32, 32, 3)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0.0 < v < 1.0


def test_ms_ssim_runs_on_large_enough_images():
    rng = np.random.default_rng(2)
    a = rng.random((1, 180, 180, 3)).astype(np.float32)
    b = np.clip(a + 0.05, 0, 1)
    v = float(ms_ssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0.0 < v <= 1.0


def test_cosine_embedding_loss_matches_torch():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 16)).astype(np.float32)
    b = rng.standard_normal((4, 16)).astype(np.float32)
    for target, margin in [(1, 0.1), (-1, 0.3), (-1, 0.5)]:
        ours = float(cosine_embedding_loss(jnp.asarray(a), jnp.asarray(b), target, margin))
        t = torch.nn.CosineEmbeddingLoss(margin=margin)(
            torch.from_numpy(a), torch.from_numpy(b),
            torch.full((4,), target, dtype=torch.long)).item()
        assert abs(ours - t) < 1e-5, (target, margin)


def test_pull_push_stm_contrastive_shapes():
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    for v in [pull_loss(p, t), push_loss(p, t), stm_loss(s, t),
              contrastive_exp_loss(p, t, s)]:
        assert np.isfinite(float(v))
    # pulling identical vectors -> zero loss
    assert float(pull_loss(t, t)) < 1e-6


def test_adversarial_hinge_semantics():
    good = [jnp.full((2, 4, 4, 1), 5.0)]
    bad = [jnp.full((2, 4, 4, 1), -5.0)]
    # gen wants high fake scores
    assert float(adversarial_loss_gen(good)) < float(adversarial_loss_gen(bad))
    # dis wants real high, fake low
    assert float(adversarial_loss_dis(good, bad)) < float(adversarial_loss_dis(bad, good))


def test_feature_matching_zero_for_identical():
    feats = [[jnp.ones((1, 4, 4, 8)), jnp.ones((1, 2, 2, 16))]]
    assert float(feature_matching_loss(feats, feats)) == 0.0
    feats2 = [[f + 1.0 for f in feats[0]]]
    assert abs(float(feature_matching_loss(feats, feats2)) - 1.0) < 1e-6


def test_multiscale_discriminator_shapes():
    cfg = tiny_config().model.discriminator
    d = MultiScaleDiscriminator(cfg)
    x = jnp.ones((2, 64, 64, 3))
    p = d.init(KEY, x)
    scores, feats = d.apply(p, x)
    assert len(scores) == cfg.num_scales
    assert len(feats) == cfg.num_scales and len(feats[0]) == cfg.num_blocks
    # stride-2 blocks except last: 64 -> 32 -> 16 score map at scale 0
    assert scores[0].shape == (2, 32, 32, 1)
    assert scores[1].shape == (2, 16, 16, 1)


def test_r1_penalty_positive():
    cfg = tiny_config().model.discriminator
    d = MultiScaleDiscriminator(cfg)
    x = jnp.asarray(np.random.default_rng(5).random((1, 32, 32, 3), dtype=np.float32))
    p = d.init(KEY, x)

    def apply_scores(params, img):
        scores, _ = d.apply(params, img)
        return sum(jnp.sum(s) for s in scores)

    pen = float(r1_penalty(apply_scores, p, x))
    assert pen > 0.0


def test_perceptual_loss_runs_and_zero_on_identical():
    apply_fn, params = make_vgg19_tower(KEY, image_size=64)
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    z = float(perceptual_loss(apply_fn, params, a, a, num_scales=2))
    nz = float(perceptual_loss(apply_fn, params, a, b, num_scales=2))
    assert z < 1e-6 and nz > z


def test_barlow_twins_loss():
    from emoportraits_tpu.losses.expression import barlow_twins_loss

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    # identical, perfectly correlated batches -> near-zero on-diagonal term
    same = float(barlow_twins_loss(a, a))
    diff = float(barlow_twins_loss(a, jnp.asarray(
        rng.standard_normal((8, 16)).astype(np.float32))))
    assert same < diff
    assert np.isfinite(same) and np.isfinite(diff)
