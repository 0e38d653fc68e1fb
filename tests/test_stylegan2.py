"""upfirdn2d golden tests vs the reference's own python fallback semantics (implemented
in torch here), plus StyleGAN2 discriminator shape tests."""
import math
import pytest

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from emoportraits_tpu.config import StyleGAN2DConfig
from emoportraits_tpu.models.stylegan2_d import DiscriminatorStyleGAN2, minibatch_stddev
from emoportraits_tpu.ops.upfirdn import (
    downsample_2x,
    fused_leaky_relu,
    make_resample_kernel,
    upfirdn2d,
    upsample_2x,
)


def torch_upfirdn2d_native(x, kernel, up, down, pad0, pad1):
    """torch reimplementation of the reference python fallback
    (stylegan2Discriminator.py:16-57) for golden comparison."""
    b, c, h, w = x.shape
    inp = x.reshape(-1, h, w, 1)
    kh, kw = kernel.shape
    out = inp.view(-1, h, 1, w, 1, 1)
    out = F.pad(out, [0, 0, 0, up - 1, 0, 0, 0, up - 1])
    out = out.view(-1, h * up, w * up, 1)
    out = F.pad(out, [0, 0, max(pad0, 0), max(pad1, 0), max(pad0, 0), max(pad1, 0)])
    out = out[:, max(-pad0, 0): out.shape[1] - max(-pad1, 0),
              max(-pad0, 0): out.shape[2] - max(-pad1, 0), :]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, h * up + pad0 + pad1, w * up + pad0 + pad1])
    wk = torch.flip(kernel, [0, 1]).view(1, 1, kh, kw)
    out = F.conv2d(out, wk)
    out = out.reshape(-1, 1, h * up + pad0 + pad1 - kh + 1,
                      w * up + pad0 + pad1 - kw + 1)
    out = out[:, :, ::down, ::down]
    return out.view(b, c, out.shape[2], out.shape[3])


def _compare(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    k = np.asarray(make_resample_kernel([1, 3, 3, 1]))
    ours = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    t = torch_upfirdn2d_native(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
        torch.from_numpy(k), up, down, pad[0], pad[1],
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t, atol=1e-5)


def test_upfirdn2d_identity_pad():
    _compare(1, 1, (1, 2))


def test_upfirdn2d_upsample():
    _compare(2, 1, (2, 1))


def test_upfirdn2d_downsample():
    _compare(1, 2, (1, 1))


def test_up_down_round_trip_shapes():
    x = jnp.ones((1, 16, 16, 4))
    k = make_resample_kernel([1, 3, 3, 1])
    up = upsample_2x(x, k)
    assert up.shape == (1, 32, 32, 4)
    down = downsample_2x(x, k)
    assert down.shape == (1, 8, 8, 4)


def test_fused_leaky_relu_semantics():
    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([0.5, 0.5])
    out = np.asarray(fused_leaky_relu(x, b))
    exp = np.asarray([[-0.5 * 0.2, 2.5]]) * math.sqrt(2)
    np.testing.assert_allclose(out, exp, rtol=1e-6)


def test_minibatch_stddev():
    x = jnp.asarray(np.random.default_rng(1).random((4, 4, 4, 8), dtype=np.float32))
    y = minibatch_stddev(x)
    assert y.shape == (4, 4, 4, 9)
    # stddev channel constant across space and group
    assert float(jnp.std(y[..., -1])) < 1e-6


@pytest.mark.slow  # compile-heavy: excluded from the quick loop
def test_stylegan2_discriminator_shapes():
    cfg = StyleGAN2DConfig(size=64, channel_multiplier=1)
    d = DiscriminatorStyleGAN2(cfg)
    x = jnp.ones((4, 64, 64, 3))
    p = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(p, x)
    assert out.shape == (4, 1)
