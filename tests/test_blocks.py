"""Unit tests for the block library: golden checks vs torch for norms/WS, shape and
semantic checks for blocks, spectral-norm convergence."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from emoportraits_tpu.ops.blocks import (
    AdaGroupNorm, Conv, ConvBlock, Dense, GroupNorm, ResBlock, avg_pool, upsample_nearest,
)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 5, 32), dtype=np.float32)
    gn = GroupNorm(32, groups=8)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = gn.apply(params, jnp.asarray(x))

    t = torch.nn.GroupNorm(8, 32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)


def test_groupnorm_lowp_stats_knob():
    """set_gn_lowp_stats(True): bf16 inputs keep bf16 elementwise math with f32
    reduction accumulators — values stay within bf16 rounding of the f32-stats
    path, grads stay finite/close, and f32 inputs are BIT-IDENTICAL (the knob
    must not touch the torch-parity path)."""
    from emoportraits_tpu.ops.blocks import set_gn_lowp_stats

    rng = np.random.default_rng(3)
    # non-zero mean + scale: exercises the two-pass variance (no cancellation)
    x32 = (3.0 + 2.0 * rng.standard_normal((2, 16, 16, 64))).astype(np.float32)
    gn = GroupNorm(64, groups=32)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x32))

    def loss(p, x):
        return jnp.sum(gn.apply(p, x) ** 2)

    ref32 = np.asarray(gn.apply(params, jnp.asarray(x32)))
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    ref_b = np.asarray(gn.apply(params, xb), np.float32)
    # ground truth: f32 input, f32 path
    g_true = jax.grad(loss)(params, jnp.asarray(x32))
    # f32 path on bf16 input: the error floor set by input quantization alone
    g_refb = jax.grad(loss)(params, xb)
    try:
        set_gn_lowp_stats(True)
        got32 = np.asarray(gn.apply(params, jnp.asarray(x32)))
        np.testing.assert_array_equal(got32, ref32)
        got_b = np.asarray(gn.apply(params, xb), np.float32)
        np.testing.assert_allclose(got_b, ref_b, atol=0.05)
        g_lowp = jax.grad(loss)(params, xb)
        # fused-lowp grads may not be no-worse ELEMENTWISE than the f32-stats
        # path (both see bf16 input rounding; near-cancelling sums like d_bias
        # amplify it differently) — gate on error vs TRUTH being the same order
        # as the unavoidable input-quantization error
        for t, r, l in zip(jax.tree_util.tree_leaves(g_true),
                           jax.tree_util.tree_leaves(g_refb),
                           jax.tree_util.tree_leaves(g_lowp)):
            t, r, l = (np.asarray(v, np.float32) for v in (t, r, l))
            assert np.isfinite(l).all()
            floor = float(np.abs(r - t).max())
            # within 3x the unavoidable input-quantization error, or 0.5% of
            # the leaf's gradient scale, whichever is looser
            bound = max(3.0 * floor, 5e-3 * float(np.abs(t).max()))
            assert float(np.abs(l - t).max()) <= bound
    finally:
        set_gn_lowp_stats(False)


def test_ws_conv_matches_torch_reference_standardization():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    conv = Conv(6, (3, 3), use_bias=False, use_ws=True)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = conv.apply(params, jnp.asarray(x))

    # torch Conv2d_ws equivalent (reference utils.py:887-904)
    k = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
    w = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())  # (out, in, kh, kw)
    wm = w.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True).mean(dim=3, keepdim=True)
    w = w - wm
    std = w.reshape(w.size(0), -1).std(dim=1).view(-1, 1, 1, 1) + 1e-5
    w = w / std
    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), w, padding=1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-4)


def test_conv_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 6, 3), dtype=np.float32)
    conv = Conv(5, (3, 3))
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ours = conv.apply(params, jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    t_out = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(np.transpose(k, (3, 2, 0, 1))), torch.from_numpy(b), padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-4)


def test_spectral_norm_bounds_sigma():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8), dtype=np.float32))
    conv = Conv(8, (1, 1), use_bias=False, use_sn=True)
    variables = conv.init(jax.random.PRNGKey(0), x)
    # run some power iterations to converge u
    for _ in range(20):
        _, updates = conv.apply(variables, x, mutable=["sn_state"])
        variables = {**variables, "sn_state": updates["sn_state"]}
    k = np.asarray(variables["params"]["kernel"]).reshape(-1, 8).T
    u = np.asarray(variables["sn_state"]["u"])
    v = k.T @ u / np.linalg.norm(k.T @ u)
    sigma = u @ k @ v
    # normalized kernel top singular value should be ~1
    top = np.linalg.svd(k / sigma, compute_uv=False)[0]
    assert abs(top - 1.0) < 1e-2


@pytest.mark.parametrize("ndim", [2, 3])
def test_resblock_shapes(ndim):
    spatial = (6, 6) if ndim == 2 else (4, 6, 6)
    x = jnp.ones((2, *spatial, 8))
    blk = ResBlock(8, 16, ndim=ndim, norm="gn")
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (2, *spatial, 16)


def test_resblock_downsample_and_upsample():
    x = jnp.ones((1, 8, 8, 4))
    down = ResBlock(4, 8, stride=2, resize="avgpool")
    p = down.init(jax.random.PRNGKey(0), x)
    assert down.apply(p, x).shape == (1, 4, 4, 8)
    up = ResBlock(4, 8, stride=2, resize="nearest")
    p = up.init(jax.random.PRNGKey(0), x)
    assert up.apply(p, x).shape == (1, 16, 16, 8)


def test_adaptive_resblock_modulation_changes_output():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 6, 6, 8), dtype=np.float32))
    blk = ResBlock(8, 8, norm="ada_gn")
    zero_mods = [(jnp.zeros((2, 8)), jnp.zeros((2, 8)))] * 2
    one_mods = [(jnp.ones((2, 8)), jnp.zeros((2, 8)))] * 2
    params = blk.init(jax.random.PRNGKey(0), x, zero_mods)
    y0 = blk.apply(params, x, zero_mods)
    y1 = blk.apply(params, x, one_mods)
    assert y0.shape == x.shape
    assert float(jnp.abs(y0 - y1).max()) > 1e-3


def test_convblock_and_pool_helpers():
    x = jnp.ones((1, 4, 8, 8, 4))
    blk = ConvBlock(4, 8, ndim=3, norm="gn")
    p = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(p, x).shape == (1, 4, 8, 8, 8)
    assert avg_pool(x, (2, 1, 1)).shape == (1, 2, 8, 8, 4)
    assert upsample_nearest(x, (2, 1, 1)).shape == (1, 8, 8, 8, 4)


def test_dense_matches_torch_linear():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 7), dtype=np.float32)
    d = Dense(5)
    params = d.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(d.apply(params, jnp.asarray(x)))
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(ours, x @ k + b, atol=1e-5)


def test_upsample_norm_commute_exact():
    """The up-block computes norm/act at LOW resolution and replicates afterwards
    (ops/blocks.py ResBlock commute_up). Nearest replication must commute exactly
    with GroupNorm + activation: same values as the reference order (norm AFTER
    upsample), which the ported-torch parity tests exercise end-to-end."""
    import numpy as np
    from emoportraits_tpu.ops.blocks import GroupNorm, upsample_nearest

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    gn = GroupNorm(64)
    p = gn.init(jax.random.PRNGKey(0), x)
    a = upsample_nearest(jax.nn.relu(gn.apply(p, x)), 2)
    b = jax.nn.relu(gn.apply(p, upsample_nearest(x, 2)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_train_batchnorm_matches_torch_train_and_eval():
    """TrainBatchNorm (norm='bn', the SyncBatchNorm role) == torch BatchNorm2d in
    both modes, including the momentum update of running stats."""
    from emoportraits_tpu.ops.blocks import TrainBatchNorm

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 5, 5, 6), dtype=np.float32)
    bn = TrainBatchNorm(6)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    t = torch.nn.BatchNorm2d(6)
    t.train()
    with torch.no_grad():
        t_out = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    ours, muts = bn.apply(variables, jnp.asarray(x), mutable=["sn_state"])
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(muts["sn_state"]["running_mean"]),
                               t.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(muts["sn_state"]["running_var"]),
                               t.running_var.numpy(), atol=1e-4)

    # eval: frozen collection -> running stats (torch .eval())
    t.eval()
    x2 = rng.standard_normal((2, 5, 5, 6), dtype=np.float32)
    with torch.no_grad():
        t_ev = t(torch.from_numpy(x2).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    ev = bn.apply({"params": variables["params"], "sn_state": muts["sn_state"]},
                  jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(ev), t_ev, atol=1e-5)


def test_train_batchnorm_syncs_over_mesh():
    """The SyncBN claim: with the batch sharded over an 8-device dp mesh, the jitted
    statistics equal the single-device global-batch statistics (GSPMD inserts the
    all-reduce; no explicit collective in the module)."""
    from emoportraits_tpu.ops.blocks import TrainBatchNorm

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("dp",))
    rng = np.random.default_rng(8)
    x = rng.standard_normal((8, 4, 4, 6), dtype=np.float32) * 3.0 + 1.0
    bn = TrainBatchNorm(6)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref_out, ref_muts = bn.apply(variables, jnp.asarray(x), mutable=["sn_state"])

    xsh = jax.device_put(jnp.asarray(x), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp")))
    vrep = jax.device_put(variables, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    out, muts = jax.jit(
        lambda v, xx: bn.apply(v, xx, mutable=["sn_state"]))(vrep, xsh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(muts["sn_state"]["running_mean"]),
                               np.asarray(ref_muts["sn_state"]["running_mean"]),
                               atol=1e-5)


def test_resblock_bn_norm_kind():
    """ResBlock(norm='bn') builds and carries running stats in sn_state."""
    rb = ResBlock(6, 8, norm="bn")
    x = jnp.asarray(np.random.default_rng(9).standard_normal(
        (2, 8, 8, 6), dtype=np.float32))
    variables = rb.init(jax.random.PRNGKey(0), x)
    assert "running_mean" in str(jax.tree_util.tree_structure(
        variables["sn_state"]))
    out, muts = rb.apply(variables, x, mutable=["sn_state"])
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_fuse_nearest_up_exact():
    """Conv(fuse_nearest_up=True)(x) == Conv(up2(x)) — the lhs-dilated smeared-kernel
    composition is the same math (fp32 CPU: exact to reassociation)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 5), dtype=np.float32))
    base = Conv(4, (3, 3))
    params = base.init(jax.random.PRNGKey(0), x)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = base.apply(params, up)
    fused = Conv(4, (3, 3), fuse_nearest_up=True).apply(params, x)
    assert fused.shape == ref.shape == (2, 18, 18, 4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    # WS path: standardize-then-smear must match standardize-then-upsample-conv
    ws = Conv(4, (3, 3), use_ws=True)
    wparams = ws.init(jax.random.PRNGKey(1), x)
    ref_ws = ws.apply(wparams, up)
    fused_ws = Conv(4, (3, 3), use_ws=True, fuse_nearest_up=True).apply(wparams, x)
    np.testing.assert_allclose(np.asarray(fused_ws), np.asarray(ref_ws), atol=2e-5)


def test_groupnorm_lane_pack_parity():
    """set_gn_lane_pack(True): the (..., W, C) -> (..., W*C) packed GN must
    reproduce the unpacked path (values to f32-reassociation, grads close) for
    2D and 3D tensors at the prod-problem channel counts (C=32 pads 4x, C=192
    pads 1.33x on the 128-lane tile), incl. the AdaGroupNorm per-sample affine."""
    from emoportraits_tpu.ops.blocks import set_gn_lane_pack

    rng = np.random.default_rng(7)
    cases = [
        ((2, 4, 8, 8, 32), 32),    # 3D warp-generator shape
        ((2, 4, 8, 16, 192), 192),  # 3D unet down_0 shape (W*C mult of 128)
        ((2, 8, 8, 96), 96),       # 2D, C=96
    ]
    try:
        for shape, c in cases:
            x = jnp.asarray(
                (1.5 + rng.standard_normal(shape)).astype(np.float32))
            gn = GroupNorm(c)
            params = gn.init(jax.random.PRNGKey(0), x)

            def loss(p, x):
                return jnp.sum(gn.apply(p, x) ** 2)

            set_gn_lane_pack(False)
            ref = np.asarray(gn.apply(params, x))
            g_ref = jax.grad(loss)(params, x)
            set_gn_lane_pack(True)
            got = np.asarray(gn.apply(params, x))
            np.testing.assert_allclose(got, ref, atol=2e-5)
            g_got = jax.grad(loss)(params, x)
            # affine-param grads are near-cancelling big sums — the two-stage
            # (fold-W) reduce reassociates them, so compare at a tolerance
            # scaled to the summed magnitude, not the (noise-floor) value
            jax.tree.map(lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3,
                atol=1e-6 * x.size / c), g_got, g_ref)

        # AdaGroupNorm: per-sample affine inside the packed region
        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 32)).astype(np.float32))
        ada = AdaGroupNorm(32)
        mod = (jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) * 0.1,
               jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) * 0.1)
        params = ada.init(jax.random.PRNGKey(1), x, mod)
        set_gn_lane_pack(False)
        ref = np.asarray(ada.apply(params, x, mod))
        set_gn_lane_pack(True)
        got = np.asarray(ada.apply(params, x, mod))
        np.testing.assert_allclose(got, ref, atol=2e-5)
    finally:
        set_gn_lane_pack(False)


def test_groupnorm_lane_pack_lowp_parity():
    """set_gn_lane_pack + set_gn_lowp_stats together select the lane-packed
    bf16 custom-VJP GN (_gn_lowp_packed). Values must stay within bf16
    rounding of the f32-stats path and grads close to the f32-path-on-bf16
    floor — for both a pad-prone C (192: packed via (..., W*C)) and a
    lane-aligned C (128: packed with w=1, no reshape)."""
    from emoportraits_tpu.ops.blocks import set_gn_lane_pack, set_gn_lowp_stats

    rng = np.random.default_rng(11)
    try:
        for shape, c in (((2, 4, 8, 16, 192), 192), ((2, 8, 8, 128), 128)):
            x32 = (2.0 + 1.5 * rng.standard_normal(shape)).astype(np.float32)
            gn = GroupNorm(c)
            params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x32))
            xb = jnp.asarray(x32).astype(jnp.bfloat16)

            def loss(p, x):
                return jnp.sum(gn.apply(p, x) ** 2)

            set_gn_lane_pack(False)
            set_gn_lowp_stats(False)
            ref32 = np.asarray(gn.apply(params, jnp.asarray(x32)))
            ref_b = np.asarray(gn.apply(params, xb), np.float32)
            g_refb = jax.grad(loss)(params, xb)

            set_gn_lane_pack(True)
            set_gn_lowp_stats(True)
            # f32 input: lowp must NOT engage (packed f32 path, values ~exact)
            got32 = np.asarray(gn.apply(params, jnp.asarray(x32)))
            np.testing.assert_allclose(got32, ref32, atol=2e-5)
            got_b = np.asarray(gn.apply(params, xb), np.float32)
            np.testing.assert_allclose(got_b, ref_b, atol=0.05)
            g_lowp = jax.grad(loss)(params, xb)
            for (pa, va), (pb, vb) in zip(
                    jax.tree_util.tree_flatten_with_path(g_lowp)[0],
                    jax.tree_util.tree_flatten_with_path(g_refb)[0]):
                va, vb = np.asarray(va, np.float32), np.asarray(vb, np.float32)
                denom = max(np.abs(vb).max(), 1.0)
                assert np.abs(va - vb).max() / denom < 0.08, (
                    pa, np.abs(va - vb).max(), denom)
    finally:
        set_gn_lane_pack(False)
        set_gn_lowp_stats(False)


def test_gn_lowp_engages_without_lane_pack():
    """bf16_gn_stats WITHOUT gn_lane_pack (the r4 knob alone) must still route
    every GN site — including AdaGroupNorm's per-sample affine and shapes the
    lane-pack cannot cover — through the lowp path (r5 review finding: the
    _gn_forward refactor initially dropped AdaGroupNorm's legacy-lowp route,
    silently reverting the warp generators to full-f32 temps). Numerics gate:
    lowp output within bf16 tolerance of the f32-stats path."""
    from emoportraits_tpu.ops.blocks import set_gn_lane_pack, set_gn_lowp_stats

    rng = np.random.default_rng(21)
    x32 = (1.0 + rng.standard_normal((2, 4, 6, 6, 32))).astype(np.float32)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    ada = AdaGroupNorm(32)
    mod = (jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) * 0.1,
           jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32)) * 0.1)
    params = ada.init(jax.random.PRNGKey(0), xb, mod)
    ref = np.asarray(ada.apply(params, xb, mod), np.float32)
    # unpackable plain-GN site too: W*C=6*24=144 and C=24, neither lane-aligned
    gn = GroupNorm(24, groups=8)
    xg = jnp.asarray(rng.standard_normal((2, 4, 6, 6, 24)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    gparams = gn.init(jax.random.PRNGKey(1), xg)
    gref = np.asarray(gn.apply(gparams, xg), np.float32)
    try:
        for pack in (False, True):
            set_gn_lowp_stats(True)
            set_gn_lane_pack(pack)
            got = np.asarray(ada.apply(params, xb, mod), np.float32)
            np.testing.assert_allclose(got, ref, atol=0.08)
            ggot = np.asarray(gn.apply(gparams, xg), np.float32)
            np.testing.assert_allclose(ggot, gref, atol=0.08)
    finally:
        set_gn_lowp_stats(False)
        set_gn_lane_pack(False)


def test_conv_fuse_avgpool_down_exact():
    """Conv(fuse_avgpool_down=True)(x) == avg_pool(Conv(x), 2) — the stride-2
    smeared-kernel composition is the same math (fp32 CPU: exact to
    reassociation). Kernel param shape is identical (smear is post-hoc), so
    ported checkpoints are untouched."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 5), dtype=np.float32))
    base = Conv(4, (3, 3))
    params = base.init(jax.random.PRNGKey(0), x)
    ref = avg_pool(base.apply(params, x), 2)
    fused = Conv(4, (3, 3), fuse_avgpool_down=True).apply(params, x)
    assert fused.shape == ref.shape == (2, 6, 6, 4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    # WS path: standardize-then-smear must match standardize-conv-then-pool
    ws = Conv(4, (3, 3), use_ws=True)
    wparams = ws.init(jax.random.PRNGKey(1), x)
    ref_ws = avg_pool(ws.apply(wparams, x), 2)
    fused_ws = Conv(4, (3, 3), use_ws=True, fuse_avgpool_down=True).apply(wparams, x)
    np.testing.assert_allclose(np.asarray(fused_ws), np.asarray(ref_ws), atol=2e-5)

    # ODD spatial dims: the fused stride-2 output grid would differ from
    # avg_pool(conv(x), 2) (9 vs 8 rows at H=17) — the flag must fall back to
    # the literal composition and stay exact (r5 review finding)
    x_odd = jnp.asarray(rng.standard_normal((2, 13, 11, 5), dtype=np.float32))
    ref_odd = avg_pool(base.apply(params, x_odd), 2)
    fused_odd = Conv(4, (3, 3), fuse_avgpool_down=True).apply(params, x_odd)
    assert fused_odd.shape == ref_odd.shape == (2, 6, 5, 4)
    np.testing.assert_allclose(np.asarray(fused_odd), np.asarray(ref_odd),
                               atol=2e-5)

    # explicit padding is rejected, not silently overridden
    with pytest.raises(ValueError, match="SAME"):
        Conv(4, (3, 3), padding=((0, 0), (0, 0)),
             fuse_avgpool_down=True).init(jax.random.PRNGKey(2), x)


def test_resblock_fuse_avgpool_down_exact():
    """The downsample ResBlock (stride-2 avgpool) fuses conv_1 with the pool and
    commutes the 1x1 skip conv past it. Invariant: with IDENTICAL params (the
    fusion never changes param shapes), ResBlock(stride=2, resize='avgpool')
    == avg_pool(ResBlock(stride=1), 2) — the reference composition
    (utils.py ResBlock: convs at full res, pool after)."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 6), dtype=np.float32))
    kw = dict(norm="gn", activation="relu", use_ws=True, use_sn=True)
    plain = ResBlock(6, 8, stride=1, **kw)
    variables = plain.init(jax.random.PRNGKey(0), x)
    ref = avg_pool(plain.apply(variables, x), 2)
    fused = ResBlock(6, 8, stride=2, resize="avgpool", **kw).apply(variables, x)
    assert fused.shape == ref.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)

    # equal-channel variant: no skip conv, plain pooled identity path
    plain_eq = ResBlock(6, 6, stride=1, **kw)
    veq = plain_eq.init(jax.random.PRNGKey(1), x)
    ref_eq = avg_pool(plain_eq.apply(veq, x), 2)
    fused_eq = ResBlock(6, 6, stride=2, resize="avgpool", **kw).apply(veq, x)
    np.testing.assert_allclose(np.asarray(fused_eq), np.asarray(ref_eq), atol=2e-5)
