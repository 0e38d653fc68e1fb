"""Golden tests: grid_sample vs torch.nn.functional.grid_sample (align_corners=False).

The reference relies on torch grid_sample with reflection padding (va.py:261-265);
these tests pin our jnp implementation to the exact torch semantics, including padding
modes and out-of-range coordinates.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from emoportraits_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_3d,
    grid_sample_3d_norm_grad,
    make_identity_grid_2d,
    make_identity_grid_3d,
)

PAD_MODES = ["zeros", "border", "reflection"]


def _rand_grid(rng, shape, scale=1.3):
    """Grid values in [-scale, scale] to exercise out-of-bounds handling."""
    return (rng.random(shape, dtype=np.float32) * 2 - 1) * scale


@pytest.mark.parametrize("padding_mode", PAD_MODES)
@pytest.mark.parametrize("C", [3, 8])  # C<=4 scalar-gather path AND row-gather path
def test_grid_sample_2d_matches_torch(padding_mode, C):
    rng = np.random.default_rng(0)
    B, H, W = 2, 5, 7
    Ho, Wo = 4, 6
    img = rng.standard_normal((B, H, W, C), dtype=np.float32)
    grid = _rand_grid(rng, (B, Ho, Wo, 2))

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), padding_mode=padding_mode)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)  # NCHW
    t_out = F.grid_sample(
        t_img, torch.from_numpy(grid), mode="bilinear",
        padding_mode=padding_mode, align_corners=False,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("padding_mode", PAD_MODES)
@pytest.mark.parametrize("C", [3, 8])  # C<=4 scalar-gather path AND row-gather path
def test_grid_sample_3d_matches_torch(padding_mode, C):
    rng = np.random.default_rng(1)
    B, D, H, W = 2, 4, 5, 6
    Do, Ho, Wo = 3, 4, 5
    vol = rng.standard_normal((B, D, H, W, C), dtype=np.float32)
    grid = _rand_grid(rng, (B, Do, Ho, Wo, 3))

    ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), padding_mode=padding_mode)

    t_vol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # NCDHW
    t_out = F.grid_sample(
        t_vol, torch.from_numpy(grid), mode="bilinear",
        padding_mode=padding_mode, align_corners=False,
    ).permute(0, 2, 3, 4, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5, rtol=1e-5)


def test_identity_grid_3d_exact_on_linear_field():
    # Trilinear interpolation reproduces any per-axis-linear field exactly, so an
    # identity-grid resample of such a field must be exact away from the border
    # (align_corners=False shifts samples by up to half a pixel, but the field is linear).
    D, H, W = 4, 8, 8
    zz, yy, xx = np.meshgrid(
        np.arange(D, dtype=np.float32), np.arange(H, dtype=np.float32),
        np.arange(W, dtype=np.float32), indexing="ij")
    vol = np.stack([xx + 2 * yy, yy - 3 * zz], axis=-1)[None]  # (1,D,H,W,2), linear
    grid = make_identity_grid_3d(D, H, W)
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), grid, padding_mode="border"))

    # Expected: the linear field evaluated at the identity-grid sample positions.
    def pix(c, n):
        return np.clip(((c + 1) * n - 1) / 2, 0, n - 1)
    zs = pix(np.linspace(-1, 1, D, dtype=np.float32), D)
    ys = pix(np.linspace(-1, 1, H, dtype=np.float32), H)
    xs = pix(np.linspace(-1, 1, W, dtype=np.float32), W)
    ez, ey, ex = np.meshgrid(zs, ys, xs, indexing="ij")
    exp = np.stack([ex + 2 * ey, ey - 3 * ez], axis=-1)[None]
    np.testing.assert_allclose(out, exp, atol=1e-4)


def test_identity_grid_2d_shape():
    g = make_identity_grid_2d(4, 6)
    assert g.shape == (1, 4, 6, 2)
    assert float(g[0, 0, 0, 0]) == -1.0 and float(g[0, -1, -1, 1]) == 1.0


def test_grid_sample_3d_grad_matches_torch():
    rng = np.random.default_rng(3)
    B, D, H, W, C = 1, 3, 4, 5, 2
    vol = rng.standard_normal((B, D, H, W, C), dtype=np.float32)
    grid = _rand_grid(rng, (B, 2, 3, 4, 3), scale=0.9)

    import jax

    def loss(v, g):
        return jnp.sum(grid_sample_3d(v, g, padding_mode="reflection") ** 2)

    gv, gg = jax.grad(loss, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(grid))

    t_vol = torch.from_numpy(vol).permute(0, 4, 1, 2, 3).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    t_out = F.grid_sample(t_vol, t_grid, mode="bilinear", padding_mode="reflection",
                          align_corners=False)
    (t_out ** 2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gv), t_vol.grad.permute(0, 2, 3, 4, 1).numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), t_grid.grad.numpy(), atol=1e-4, rtol=1e-4)


def test_norm_grad_scales_grid_gradient():
    import jax

    rng = np.random.default_rng(4)
    vol = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 2), dtype=np.float32))
    grid = jnp.asarray(_rand_grid(rng, (1, 2, 4, 4, 3), scale=0.8))

    g_plain = jax.grad(lambda g: jnp.sum(grid_sample_3d(vol, g)))(grid)
    g_scaled = jax.grad(
        lambda g: jnp.sum(grid_sample_3d_norm_grad(vol, g, size=4)))(grid)
    np.testing.assert_allclose(np.asarray(g_scaled), np.asarray(g_plain) / 4, atol=1e-6)
