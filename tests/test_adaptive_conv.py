"""AdaptiveConv branch (gen_use_adaconv) + transformer expression pooling.

Reference: AdaptiveConv (utils.py:104-176), ProjectorConv (:1270-1352),
assign_adaptive_conv_params (:1355-1373), TransformerHead (:629-660). Note the
reference's own end-to-end gen_use_adaconv path is dead (predict_embed uses
warp_embed_head_dict heads that are never constructed, va.py:866, and the annealing
alpha is never passed, defaulting the deltas to a no-op) — these tests therefore
golden-check the OPS against the reference modules directly, and smoke the runnable
end-to-end wiring we reconstructed.
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from emoportraits_tpu.ops.adaptive import (
    AdaConvEmbedHeads,
    ProjectorConv,
    annealing_alpha,
)
from emoportraits_tpu.ops.blocks import Conv

from ref_oracle import install_stubs, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not present")


def _mk_conv_and_delta(rng, b=2, in_ch=4, out_ch=5, ks=(3, 3), taps=False):
    x = rng.standard_normal((b, 8, 8, in_ch), dtype=np.float32)
    conv = Conv(out_ch, ks, use_bias=False)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tap_shape = ks if taps else (1,) * len(ks)
    delta = rng.standard_normal((b, *tap_shape, in_ch, out_ch),
                                dtype=np.float32) * 0.1
    return conv, params, jnp.asarray(x), jnp.asarray(delta)


def test_ada_alpha_zero_sum_is_plain_conv():
    """'sum' with alpha=0 reduces to the base kernel — the reference's actual
    runtime behavior (annealing_alpha defaults to 0.0 and is never overridden,
    warp_generator_resnet.py:125)."""
    rng = np.random.default_rng(0)
    conv, params, x, delta = _mk_conv_and_delta(rng)
    plain = conv.apply(params, x)
    ada0 = conv.apply(params, x, ada=(delta, 0.0))
    np.testing.assert_allclose(np.asarray(ada0), np.asarray(plain), atol=1e-5)
    # 'mul' with alpha=0: W * (sigmoid*0 + 1) == W
    conv_m = Conv(5, (3, 3), use_bias=False, adaptive_conv_type="mul")
    ada0m = conv_m.apply(params, x, ada=(delta, 0.0))
    np.testing.assert_allclose(np.asarray(ada0m), np.asarray(plain), atol=1e-5)


@needs_ref
@pytest.mark.parametrize("conv_type", ["sum", "mul"])
@pytest.mark.parametrize("taps", [False, True])
def test_ada_conv_golden_vs_reference(conv_type, taps):
    """Per-sample adaptive conv == reference AdaptiveConv forward with ada_weight
    assembled by assign_adaptive_conv_params (alpha=1)."""
    install_stubs()
    from networks.volumetric_avatar.utils import (
        AdaptiveConv,
        assign_adaptive_conv_params,
    )

    rng = np.random.default_rng(1)
    conv = Conv(5, (3, 3), use_bias=False, adaptive_conv_type=conv_type)
    _, params, x, delta = _mk_conv_and_delta(rng, taps=taps)
    conv_params = params

    ours = conv.apply(conv_params, x, ada=(delta, 1.0))

    ref = AdaptiveConv(4, 5, kernel_size=(3, 3), padding=1)
    with torch.no_grad():
        # our kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        k = np.transpose(np.asarray(conv_params["params"]["kernel"]), (3, 2, 0, 1))
        ref.weight.copy_(torch.from_numpy(k.copy()))
        # our delta (B, th, tw, in, out) -> reference (B, out, in, th, tw)
        d = torch.from_numpy(np.transpose(np.asarray(delta), (0, 4, 3, 1, 2)).copy())
        assign_adaptive_conv_params(ref, [d], conv_type, 1.0)
        # broadcast 1x1 deltas over the 3x3 taps like our path does
        ref.ada_weight = torch.broadcast_to(ref.ada_weight, (2, 5, 4, 3, 3))
        t_out = torch.cat([
            torch.nn.functional.conv2d(
                torch.from_numpy(np.asarray(x))[b:b + 1].permute(0, 3, 1, 2),
                ref.ada_weight[b], None, 1, 1)
            for b in range(2)
        ]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-4)


def test_projector_conv_shapes():
    specs = ((8, 6, (3, 3, 3)), (8, 8, (3, 3, 3)), (8, 6, (1, 1, 1)))
    for adaptive_kernel in (False, True):
        proj = ProjectorConv(specs, max_channels=16,
                             adaptive_kernel=adaptive_kernel)
        half = 8
        embeds = {"fc": jnp.ones((2, half, half)),
                  "conv3d": jnp.ones((2, half, half * 27))}
        params = proj.init(jax.random.PRNGKey(0), embeds)
        deltas = proj.apply(params, embeds)
        taps3 = (3, 3, 3) if adaptive_kernel else (1, 1, 1)
        assert deltas[0].shape == (2, *taps3, 6, 8)
        assert deltas[1].shape == (2, *taps3, 8, 8)
        assert deltas[2].shape == (2, 1, 1, 1, 6, 8)  # 1x1 conv: taps always 1


def test_adaconv_embed_heads_shapes():
    heads = AdaConvEmbedHeads(max_channels=16, embed_size=4,
                              kinds=("fc", "conv3d"))
    embed = jnp.ones((2, 16, 16))
    params = heads.init(jax.random.PRNGKey(0), embed)
    out = heads.apply(params, embed)
    assert out["fc"].shape == (2, 8, 8)
    assert out["conv3d"].shape == (2, 8, 8 * 27)


def test_annealing_schedule():
    it = jnp.asarray(50_000)
    assert float(annealing_alpha(it, "lin", 100_000)) == pytest.approx(0.5)
    assert float(annealing_alpha(it, "cos", 100_000)) == pytest.approx(0.5)
    assert float(annealing_alpha(jnp.asarray(0), "cos", 100_000)) == 0.0
    assert float(annealing_alpha(jnp.asarray(10 ** 9), "lin", 100_000)) == 1.0


def test_warp_generator_adaconv_end_to_end():
    """use_adaconv=True compiles, produces finite warps, and the conv deltas
    actually change the output (alpha 0 vs 1)."""
    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.warp_generator import WarpGenerator

    cfg = tiny_config().model.warp_generator
    cfg = dataclasses.replace(cfg, use_adaconv=True, adaptive_kernel=True)
    gen = WarpGenerator(cfg, use_ws=False, use_sn=False)
    embed = jax.random.normal(jax.random.PRNGKey(1),
                              (2, cfg.embed_size, cfg.embed_size,
                               cfg.max_channels))
    params = gen.init(jax.random.PRNGKey(0), embed)
    assert "projector_conv" in params["params"]
    # alpha is a traced argument — ONE compile serves both evaluations
    apply = jax.jit(lambda p, e, a: gen.apply(p, e, a))
    warp1, _ = apply(params, embed, 1.0)
    warp0, _ = apply(params, embed, 0.0)
    assert np.isfinite(np.asarray(warp1)).all()
    assert float(jnp.abs(warp1 - warp0).max()) > 1e-6

    # gradients flow into the conv projector when alpha=1 (jitted: one cached
    # program instead of ~35 s of eager op-by-op AD)
    loss = lambda p: jnp.sum(gen.apply(p, embed, 1.0)[0] ** 2)
    grads = jax.jit(jax.grad(loss))(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in
                jax.tree.leaves(grads["params"]["projector_conv"]))
    assert gnorm > 0


@needs_ref
def test_transformer_pool_golden_vs_reference():
    """TransformerPool == reference TransformerHead with ported weights."""
    install_stubs()
    from networks.volumetric_avatar.utils import TransformerHead

    from emoportraits_tpu.models.expression_embedder import TransformerPool

    b, h, w, dim = 2, 3, 3, 16
    n = h * w
    torch.manual_seed(0)
    ref = TransformerHead(num_inputs=n, dim=dim, depth=2, heads=2, dim_head=8,
                          mlp_dim=32, dropout=0.0, emb_dropout=0.0).eval()
    ours = TransformerPool(dim=dim, depth=2, heads=2, dim_head=8, mlp_dim=32)

    feat = np.random.default_rng(2).standard_normal((b, h, w, dim),
                                                    dtype=np.float32)
    with torch.no_grad():
        t_out = ref(torch.from_numpy(feat).permute(0, 3, 1, 2)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = {"cls_token": sd["cls_token"], "pos_embedding": sd["pos_embedding"]}
    for d in range(2):
        a, f = f"layers.{d}.0.fn", f"layers.{d}.1.fn"
        p[f"attn_ln_{d}"] = {"scale": sd[f"{a}.norm.weight"],
                             "bias": sd[f"{a}.norm.bias"]}
        p[f"to_qkv_{d}"] = {"kernel": sd[f"{a}.fn.to_qkv.weight"].T}
        p[f"attn_out_{d}"] = {"kernel": sd[f"{a}.fn.to_out.0.weight"].T,
                              "bias": sd[f"{a}.fn.to_out.0.bias"]}
        p[f"ff_ln_{d}"] = {"scale": sd[f"{f}.norm.weight"],
                           "bias": sd[f"{f}.norm.bias"]}
        p[f"ff_0_{d}"] = {"kernel": sd[f"{f}.fn.net.0.weight"].T,
                          "bias": sd[f"{f}.fn.net.0.bias"]}
        p[f"ff_1_{d}"] = {"kernel": sd[f"{f}.fn.net.3.weight"].T,
                          "bias": sd[f"{f}.fn.net.3.bias"]}
    params = jax.tree.map(jnp.asarray, {"params": p})
    j_out = ours.apply(params, jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-4)


def test_expression_embed_transformer_pooling():
    from emoportraits_tpu.config import tiny_config
    from emoportraits_tpu.models.expression_embedder import ExpressionEmbed

    cfg = dataclasses.replace(tiny_config().model.expression_embedder,
                              final_pooling_type="transformer")
    net = ExpressionEmbed(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(1), img)
    vec = net.apply(params, img)
    assert vec.shape == (2, cfg.output_channels)
    assert np.isfinite(np.asarray(vec)).all()
