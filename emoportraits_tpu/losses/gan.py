"""GAN losses: hinge adversarial, feature matching, StyleGAN2 logistic + R1.

Reference: losses/adversarial.py:9-69 (hinge over multi-scale score lists),
losses/feature_matching.py:10-46 (L1 over D feature pyramids),
networks/volumetric_avatar/utils.py:1531-1575 (d_logistic_loss, _calc_r1_penalty,
g_nonsaturating_loss for the StyleGAN2 D path).

R1 needs a second-order gradient through D; the reference ships conv2d_gradfix
(networks/basic_avatar/op/conv2d_gradfix.py) to work around cuDNN — JAX differentiates
convolutions natively, so `r1_penalty` is just jax.grad over the score sum.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def adversarial_loss_gen(fake_scores: Sequence[jax.Array]) -> jax.Array:
    """Generator hinge loss: -mean(score) averaged over scales."""
    loss = 0.0
    for s in fake_scores:
        loss = loss - jnp.mean(s)
    return loss / len(fake_scores)


def adversarial_loss_dis(real_scores: Sequence[jax.Array],
                         fake_scores: Sequence[jax.Array]) -> jax.Array:
    """Discriminator hinge loss: relu(1 - real) + relu(1 + fake), scale-averaged."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss = loss + jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss / len(fake_scores)


def feature_matching_loss(real_features: Sequence[List[jax.Array]],
                          fake_features: Sequence[List[jax.Array]]) -> jax.Array:
    """L1 between real/fake D feature pyramids, averaged over layers and scales."""
    loss = 0.0
    for rf, ff in zip(real_features, fake_features):
        loss_net = 0.0
        for r, f in zip(rf, ff):
            loss_net = loss_net + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
        loss = loss + loss_net / len(ff)
    return loss / len(real_features)


def d_logistic_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """StyleGAN2 non-saturating logistic D loss (reference utils.py:1531)."""
    return jnp.mean(jax.nn.softplus(-real_scores)) + jnp.mean(jax.nn.softplus(fake_scores))


def g_nonsaturating_loss(fake_scores: jax.Array) -> jax.Array:
    """StyleGAN2 non-saturating G loss (reference utils.py:1567)."""
    return jnp.mean(jax.nn.softplus(-fake_scores))


def r1_penalty(d_apply, params, real_img: jax.Array) -> jax.Array:
    """R1 gradient penalty: E[ ||d D(x)/d x||^2 ] on real images
    (reference _calc_r1_penalty, utils.py:1558-1565). `d_apply(params, img) -> scores`."""
    def score_sum(img):
        return jnp.sum(d_apply(params, img))

    grads = jax.grad(score_sum)(real_img)
    return jnp.sum(jnp.square(grads)) / real_img.shape[0]
