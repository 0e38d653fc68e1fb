"""Regression tests for the code-review findings (green compositing, warp-aug
expression inputs, prefetcher exhaustion)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import tiny_config
from emoportraits_tpu.train.step import LossTowers, gen_losses

KEY = jax.random.PRNGKey(0)


def test_green_compositing_applies_to_target_only():
    """The D must see the generator's RAW output while the target is composited
    (reference va.py:617-632; regression for the pred-compositing bug)."""
    cfg = tiny_config()
    assert cfg.train.use_seg and cfg.train.green
    b, s = 2, 16
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32))
    batch = {
        "target_img": jnp.asarray(rng.random((b, s, s, 3), dtype=np.float32)),
        "target_mask": jnp.zeros((b, s, s, 1)),  # everything is background
    }
    seen = []

    def fake_dis(params, img):
        seen.append(img)
        return [jnp.zeros((b, 4, 4, 1))], [[jnp.zeros((b, 4, 4, 8))]]

    out = {"pred_target_img": pred}
    prev = jnp.zeros((1, b, cfg.model.expression_dim))
    total, losses = gen_losses(cfg, out, batch, fake_dis, {}, LossTowers(), prev)
    target_seen, pred_seen = seen[0], seen[1]
    # target fully green-composited (mask==0 -> pure green)
    np.testing.assert_allclose(np.asarray(target_seen[..., 1]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(target_seen[..., 0]), 0.0, atol=1e-6)
    # prediction passed RAW (not composited)
    np.testing.assert_allclose(np.asarray(pred_seen), np.asarray(pred), atol=1e-6)


@pytest.mark.slow  # compile-heavy: excluded from the quick loop
def test_warp_aug_drives_expression_embeds():
    from emoportraits_tpu.models.stage1 import VolumetricAvatar

    cfg = tiny_config().model
    model = VolumetricAvatar(cfg)
    b = 1
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.random((b, 64, 64, 3), dtype=np.float32))
    aug = jnp.asarray(rng.random((b, 64, 64, 3), dtype=np.float32))
    mask = jnp.ones((b, 64, 64, 1))
    theta = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    variables = model.init(KEY, src, mask, src, theta, theta)
    out_plain = model.apply(variables, src, mask, src, theta, theta,
                            method=model.generate)
    out_aug = model.apply(variables, src, mask, src, theta, theta,
                          source_expr_img=aug, target_expr_img=aug,
                          method=model.generate)
    # the aug frames must actually change the expression embeds
    assert float(jnp.abs(out_plain["source_pose_embed"]
                         - out_aug["source_pose_embed"]).max()) > 1e-6


def test_prefetcher_raises_stopiteration_on_exhaustion():
    from emoportraits_tpu.data.pairs import Prefetcher

    pf = Prefetcher(iter([{"x": np.zeros(1)}]), depth=2)
    assert next(pf)["x"].shape == (1,)
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()
