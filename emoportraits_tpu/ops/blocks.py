"""Functional building blocks: convs (weight-standardized / spectrally-normalized),
norms (GroupNorm + adaptive variants), pre-activation Res/Conv blocks, resize layers.

Reproduces the behavior of the reference's block factory (networks/volumetric_avatar/
utils.py:661-981: ResBlock :661, ConvBlock :791, Conv2d_ws/Conv3d_ws :887-931, registries
:930-970) with TPU-first differences:

  * channels-last layout everywhere: (B, H, W, C) and (B, D, H, W, C); convs run via
    lax.conv_general_dilated with NHWC/NDHWC dimension numbers so XLA tiles them onto the MXU;
  * adaptive normalization is *functional*: modulation tensors (delta_gamma, delta_beta) are
    threaded through `__call__(x, mods=...)` instead of being assigned onto module attributes
    (reference mutates `.ada_weight`, utils.py:983-995);
  * spectral norm keeps its power-iteration vector in a mutable `sn_state` variable
    collection — updated in training, frozen at inference (reference: utils/spectral_norm.py).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Mod = Tuple[jax.Array, jax.Array]  # (delta_gamma, delta_beta), each (B, C)


def _num_groups(channels: int, groups: int = 32) -> int:
    g = min(groups, channels)
    while channels % g:
        g -= 1
    return g


def activation_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    """Registry parity with reference utils.py:936-939."""
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name!r}")


def _standardize_kernel(kernel: jax.Array) -> jax.Array:
    """Weight standardization over all non-output dims (reference Conv2d_ws/Conv3d_ws,
    utils.py:887-931: subtract mean, divide by unbiased std + 1e-5). Flax kernels are
    (*spatial, in, out) with `out` last."""
    axes = tuple(range(kernel.ndim - 1))
    mean = jnp.mean(kernel, axis=axes, keepdims=True)
    w = kernel - mean
    n = 1
    for a in axes:
        n *= kernel.shape[a]
    var = jnp.sum(w * w, axis=axes, keepdims=True) / max(n - 1, 1)  # unbiased, as torch .std()
    return w / (jnp.sqrt(var) + 1e-5)


def _spectral_normalize(module: nn.Module, kernel: jax.Array, n_iters: int = 1) -> jax.Array:
    """Spectral normalization via power iteration (reference utils/spectral_norm.py:12-54,
    a copy of torch.nn.utils.spectral_norm).

    The kernel is viewed as (out, -1) like torch SN; `u` AND `v` persist in the
    `sn_state` collection. Training (mutable sn_state): one power iteration
    v <- normalize(W^T u), u <- normalize(W v), then sigma = u^T W v — torch train
    semantics. Inference (frozen sn_state): sigma from the STORED u, v without
    iteration — torch eval semantics, so ported checkpoints reproduce outputs exactly.
    """
    out_ch = kernel.shape[-1]
    w = kernel.reshape(-1, out_ch).T  # (out, rest)
    rng = (module.make_rng("params") if module.has_rng("params")
           else jax.random.PRNGKey(0))
    u_var = module.variable(
        "sn_state", "u", lambda: jax.random.normal(rng, (out_ch,)))
    v_var = module.variable(
        "sn_state", "v",
        lambda: jax.random.normal(jax.random.fold_in(rng, 1), (w.shape[1],)))
    u, v = u_var.value, v_var.value
    if module.is_initializing() or module.is_mutable_collection("sn_state"):
        u = u / (jnp.linalg.norm(u) + 1e-12)
        for _ in range(n_iters):
            v = w.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        u_var.value = u
        v_var.value = v
    sigma = u @ (w @ v)
    return kernel / sigma


class Conv(nn.Module):
    """N-D conv (channels-last) with optional weight standardization and spectral norm.

    kernel init matches torch nn.Conv default (kaiming_uniform a=sqrt(5) == uniform
    +-1/sqrt(fan_in)), so ported checkpoints and fresh inits share scale conventions.
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    padding: Any = "SAME"
    use_bias: bool = True
    use_ws: bool = False
    use_sn: bool = False
    feature_group_count: int = 1
    # atrous/dilated conv (FCN-style backbones, e.g. the RTNet-role parser trunk)
    kernel_dilation: Sequence[int] | int = 1
    dtype: Any = None
    # int8 serving path: per-output-channel symmetric weight quantization (computed
    # from the SN/WS-transformed effective kernel inside the program) x per-tensor
    # static activation scale (the 'quant' collection; grows to the observed max when
    # run with mutable=["quant"] — the calibration pass). The conv runs int8 x int8
    # with int32 accumulation on the MXU; dequant + bias fuse into the epilogue.
    # Forward-only (serving): the int8 conv has no VJP.
    quant: bool = False
    # AdaptiveConv combination rule (reference assign_adaptive_conv_params,
    # utils.py:1355-1373): 'sum' -> W + delta*alpha; 'mul' -> W * (sigmoid(delta)*alpha
    # + (1-alpha)). Only consulted when `ada` is passed to __call__.
    adaptive_conv_type: str = "sum"
    # Fuse a preceding nearest-up2 into this conv: conv3x3(nearest_up2(x)) ==
    # convT(x, k (*) ones(2,2)) == one lhs-dilated conv with the ones-smeared 4x4
    # kernel (convolution-operator composition; exact up to fp32 reassociation —
    # verified 1.4e-7 at Precision.HIGHEST). The upsampled activation tensor is
    # never materialized; measured on v5e bf16 at decoder up-block shapes:
    # 1.44->1.19 ms (64px C512->384), 2.59->1.59 ms (256px C192->96),
    # 1.78->1.52 ms (256px C96->96). 2D, kernel 3x3, stride 1 only.
    fuse_nearest_up: bool = False
    # The DOWN-direction twin: fuse a FOLLOWING avg_pool(2) into this conv.
    # avgpool2(conv3x3(x)) == one stride-2 conv with the ones-smeared 4x4 kernel
    # divided by 4 (linear-operator composition; exact up to fp32 reassociation):
    #   y[i] = (c[2i] + c[2i+1])/2,  c[j] = sum_t k[t] x[j+t-1]
    #        = sum_s k'[s] x[2i+s-1],  k'[s] = (k[s] + k[s-1])/2,  s in 0..3,
    # so padding (1,2) per spatial dim at stride 2. 4/9 the FLOPs of the dense
    # 3x3 at full resolution, and the full-res conv output (the pool input) is
    # never materialized. The reference computes the dense conv then pools
    # (utils.py ResBlock downsampling order); this is the same math.
    fuse_avgpool_down: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 ada: "Optional[Tuple[jax.Array, jax.Array]]" = None) -> jax.Array:
        ndim = len(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = in_ch // self.feature_group_count
        for k in self.kernel_size:
            fan_in *= k
        bound = 1.0 / (fan_in ** 0.5)
        kernel = self.param(
            "kernel",
            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -bound, bound),
            (*self.kernel_size, in_ch // self.feature_group_count, self.features))
        # Order matters and matches the reference: torch spectral_norm is a pre-hook
        # setting weight = weight_orig/sigma, THEN Conv2d_ws.forward standardizes it
        # (utils.py:887-931). Standardization is scale-invariant, so with both on the
        # SN division cancels — exactly the reference's effective behavior.
        # AdaptiveConv mode bypasses both: the reference combines the delta with the
        # RAW weight_orig (utils.py:1365-1373) and the forward then uses ada_weight
        # directly — the SN pre-hook's normalized tensor is never read.
        if ada is None:
            if self.use_sn:
                kernel = _spectral_normalize(self, kernel)
            if self.use_ws:
                kernel = _standardize_kernel(kernel)

        strides = (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        dilation = ((self.kernel_dilation,) * ndim
                    if isinstance(self.kernel_dilation, int)
                    else tuple(self.kernel_dilation))
        if ndim == 2:
            dn = ("NHWC", "HWIO", "NHWC")
        elif ndim == 3:
            dn = ("NDHWC", "DHWIO", "NDHWC")
        else:
            raise ValueError("Conv supports 2D/3D only")
        padding = self.padding
        if padding == "SAME":
            # torch pads symmetrically d*(k//2) on both sides; XLA SAME pads
            # asymmetrically for strided convs (right/bottom-heavy) — use explicit
            # torch-style padding so strided layers match ported checkpoints exactly.
            padding = tuple(d * (k // 2) for k, d in zip(self.kernel_size, dilation))
            padding = tuple((p, p) for p in padding)

        lhs_dilation = None
        fuse_down_here = self.fuse_avgpool_down
        if self.fuse_nearest_up or fuse_down_here:
            if (ada is not None or self.quant or ndim != 2
                    or tuple(self.kernel_size) != (3, 3)
                    or strides != (1, 1) or dilation != (1, 1)
                    or self.padding != "SAME"
                    or (self.fuse_nearest_up and fuse_down_here)):
                raise ValueError(
                    "fuse_nearest_up/fuse_avgpool_down need a plain 2D 3x3 "
                    "stride-1 SAME conv (and are mutually exclusive)")
            if fuse_down_here and (x.shape[1] % 2 or x.shape[2] % 2):
                # odd spatial dims: the fused stride-2 output has
                # floor((H-1)/2)+1 rows but avg_pool(conv(x), 2) has
                # floor(H/2) — fall back to the exact composition (static
                # shapes: this is a trace-time branch)
                fuse_down_here = False
        if self.fuse_nearest_up or fuse_down_here:
            # k (*) ones(2,2): k'[a,b] = sum_{p,q in {0,1}} k[a-p, b-q]
            kp = lambda dh, dw: jnp.pad(
                kernel, ((dh, 1 - dh), (dw, 1 - dw), (0, 0), (0, 0)))
            kernel = kp(0, 0) + kp(0, 1) + kp(1, 0) + kp(1, 1)
            if self.fuse_nearest_up:
                padding = ((2, 2), (2, 2))
                lhs_dilation = (2, 2)
            else:
                kernel = kernel * 0.25
                padding = ((1, 2), (1, 2))
                strides = (2, 2)

        dtype = self.dtype or x.dtype
        if ada is not None:
            # Per-sample adaptive kernels (reference AdaptiveConv, utils.py:104-176 +
            # assign_adaptive_conv_params :1355-1373). delta is (B, *taps, in, out)
            # with taps possibly all-1 (broadcast over the base kernel's taps).
            # Executed as ONE grouped conv with feature_group_count=B — batch folds
            # into channels so the MXU sees a single large contraction instead of a
            # per-sample python loop (the reference's B>1 path, utils.py:152-157).
            if self.quant or self.feature_group_count != 1:
                raise ValueError("ada is incompatible with quant/grouped Conv")
            delta, alpha = ada
            base = kernel[None].astype(jnp.float32)
            d = delta.astype(jnp.float32)
            if self.adaptive_conv_type == "sum":
                k_eff = base + d * alpha
            elif self.adaptive_conv_type == "mul":
                k_eff = base * (jax.nn.sigmoid(d) * alpha + (1.0 - alpha))
            else:
                raise ValueError(
                    f"unknown adaptive_conv_type {self.adaptive_conv_type!r}")
            k_eff = jnp.broadcast_to(
                k_eff, (x.shape[0], *self.kernel_size, in_ch, self.features))
            b = x.shape[0]
            # (B, *s, C) -> (1, *s, B*C); kernel (B, *k, in, out) -> (*k, in, B*out)
            xg = jnp.moveaxis(x, 0, -2).reshape(1, *x.shape[1:-1], b * in_ch)
            kg = jnp.moveaxis(k_eff, 0, -2).reshape(
                *self.kernel_size, in_ch, b * self.features)
            y = jax.lax.conv_general_dilated(
                xg.astype(dtype), kg.astype(dtype), strides, padding,
                rhs_dilation=dilation, dimension_numbers=dn,
                feature_group_count=b,
            )
            y = jnp.moveaxis(
                y.reshape(*y.shape[1:-1], b, self.features), -2, 0)
        elif self.quant:
            act_scale = self.variable(
                "quant", "act_scale", lambda: jnp.full((), 6.0, jnp.float32))
            if not self.is_initializing() and self.is_mutable_collection("quant"):
                # calibration pass: scales only grow toward the observed |x| max
                act_scale.value = jnp.maximum(
                    act_scale.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            sx = act_scale.value / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            kf = kernel.astype(jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)))
                             / 127.0, 1e-8)
            kq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq, strides, padding, rhs_dilation=dilation,
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (sx * sw)).astype(dtype)
        else:
            # No preferred_element_type: the TPU MXU accumulates bf16 convs in fp32
            # natively, and requesting an f32 output dtype makes the transposed conv
            # in the VJP mix dtypes (f32 cotangent vs bf16 kernel) and fail to trace.
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), strides, padding,
                lhs_dilation=lhs_dilation, rhs_dilation=dilation,
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
            )
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -bound, bound),
                (self.features,))
            y = y + bias.astype(dtype)
        if self.fuse_avgpool_down and not fuse_down_here:
            # odd-spatial fallback: the literal composition the fused kernel
            # replaces (per-channel bias commutes with the mean)
            y = avg_pool(y, 2)
        return y


class Dense(nn.Module):
    """Linear layer with torch default init and optional spectral norm."""
    features: int
    use_bias: bool = True
    use_sn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        bound = 1.0 / (in_ch ** 0.5)
        kernel = self.param(
            "kernel",
            lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -bound, bound),
            (in_ch, self.features))
        if self.use_sn:
            kernel = _spectral_normalize(self, kernel)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -bound, bound),
                (self.features,))
            y = y + bias.astype(x.dtype)
        return y


# Opt-in GroupNorm memory knob (cfg.train.bf16_gn_stats / BENCH_GN_BF16): keep the
# ELEMENTWISE GN math in the activation dtype and use fp32 only inside reduction
# accumulators. The default f32 path materializes fp32 copies of every normalized
# activation in the BACKWARD pass — at 512px batch 2 the encoder's first block
# alone holds 4 x 520 MB fp32 HLO temps (measured; the batch-2 OOM driver). A
# trace-time global rather than a threaded module attribute: GroupNorm is
# constructed in ~40 places via the block factory and the knob must not change
# any module pytree.
_GN_LOWP_STATS = False


def set_gn_lowp_stats(enable: bool) -> None:
    global _GN_LOWP_STATS
    _GN_LOWP_STATS = bool(enable)


# Trace-time switch for LANE-PACKED GroupNorm: TPU tiles the minor dim into
# 128 lanes, so channels-last tensors with C not a multiple of 128 pad every
# full-size GN temp (r5 batch-2 HBM dump: C=192 pads to 256 lanes -> five
# 288 MB f32 temps at 1.3x, and the warp generators' C=32 GN mul held 144 MB
# for a 36 MB tensor at 4.0x). Packing reshapes (..., W, C) -> (..., W*C)
# around the GN elementwise math — W*C is a multiple of 128 at every prod GN
# site, so the packed temps tile losslessly. Stats fold the W axis on the tiny
# (B, W*C) reduce output; values are identical up to f32 reassociation of the
# two-stage reduce. Off by default (the reshape boundary costs one layout copy
# per GN — a bandwidth tax serving does not need to pay); the batch-2 memory
# ladder turns it on.
_GN_LANE_PACK = False


def set_gn_lane_pack(enable: bool) -> None:
    global _GN_LANE_PACK
    _GN_LANE_PACK = bool(enable)


def _gn_forward(x: jax.Array, g: int, channels: int, eps: float,
                gamma, beta) -> jax.Array:
    """Shared f32-stats GroupNorm forward (torch semantics) for GroupNorm and
    AdaGroupNorm. gamma/beta: None, (C,), or per-sample (B, C) — the effective
    affine INCLUDING any adaptive deltas, applied inside the (possibly packed)
    elementwise region so no extra full-size temp materializes outside it."""
    shape = x.shape
    orig_dtype = x.dtype
    cg = channels // g
    b = shape[0]
    nsp = 1
    for d in shape[1:-1]:
        nsp *= d
    w = shape[-2] if x.ndim >= 3 else 1
    pack = (_GN_LANE_PACK and x.ndim >= 4 and channels % 128 != 0
            and (w * channels) % 128 == 0)
    lowp = _GN_LOWP_STATS and orig_dtype == jnp.bfloat16
    if (lowp and _GN_LANE_PACK and (pack or channels % 128 == 0)):
        # packed + low-precision: every full-size tensor bf16 AND losslessly
        # tiled — the combination the r4 grouped-lowp knob could not reach.
        # C already a lane multiple -> no reshape needed (w=1: C is the lane
        # dim, W stays a reduced spatial axis).
        if channels % 128 == 0:
            xp, wp = x, 1
        else:
            xp, wp = x.reshape(*shape[:-2], w * channels), w
        gb = jnp.broadcast_to(
            (jnp.ones((channels,), jnp.float32) if gamma is None
             else gamma.astype(jnp.float32)), (b, channels))
        bb = jnp.broadcast_to(
            (jnp.zeros((channels,), jnp.float32) if beta is None
             else beta.astype(jnp.float32)), (b, channels))
        y = _gn_lowp_packed(xp, gb, bb, wp, channels, g, eps)
        return y.reshape(shape)
    if lowp:
        # Legacy grouped lowp (the r4 knob): pack off, OR a site the lane-pack
        # cannot cover (W*C and C both unaligned). Without this fallback, GN
        # sites would silently revert to the full-f32 temps the knob exists to
        # kill (r5 review finding: AdaGroupNorm lost exactly this path).
        xg = x.reshape(*shape[:-1], g, cg)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        if gamma is None or gamma.ndim == 1:
            scale = (jnp.ones((channels,), jnp.float32) if gamma is None
                     else gamma.astype(jnp.float32)).reshape(g, cg)
            bias = (jnp.zeros((channels,), jnp.float32) if beta is None
                    else beta.astype(jnp.float32)).reshape(g, cg)
            return _gn_lowp(xg, scale, bias, axes, eps).reshape(shape)
        # per-sample (B, C) affine (AdaGroupNorm): normalize without affine,
        # then one bf16 multiply-add outside — the pre-r5 AdaGroupNorm shape
        y = _gn_lowp(xg, jnp.ones((g, cg), jnp.float32),
                     jnp.zeros((g, cg), jnp.float32), axes, eps).reshape(shape)
        bshape = (b,) + (1,) * (x.ndim - 2) + (channels,)
        return (y * gamma.astype(orig_dtype).reshape(bshape)
                + beta.astype(orig_dtype).reshape(bshape))
    if pack:
        xp = x.reshape(*shape[:-2], w * channels)     # (B, ..., W*C)
        red = tuple(range(1, xp.ndim - 1))

        def fold_c(s):   # (B, W*C) -> per-channel (B, C), f32
            return _pk_fold_c(s, b, w, channels)

        def tile_c(v):   # (B, C) -> broadcastable (B, 1.., W*C)
            return _pk_tile(v, b, w, channels, xp.ndim)

        s1 = fold_c(jnp.sum(xp, axis=red, dtype=jnp.float32))
        mean_g = jnp.sum(s1.reshape(b, g, cg), axis=-1) / (nsp * cg)
        mean_p = tile_c(jnp.repeat(mean_g, cg, axis=-1))
        s2 = fold_c(jnp.sum(jnp.square(xp.astype(jnp.float32) - mean_p),
                            axis=red))
        var_g = jnp.sum(s2.reshape(b, g, cg), axis=-1) / (nsp * cg)
        rstd_p = tile_c(jnp.repeat(jax.lax.rsqrt(var_g + eps), cg, axis=-1))
        xn = (xp.astype(jnp.float32) - mean_p) * rstd_p
        if gamma is not None:
            gb = jnp.broadcast_to(gamma.astype(jnp.float32), (b, channels))
            xn = xn * tile_c(gb)
        if beta is not None:
            bb = jnp.broadcast_to(beta.astype(jnp.float32), (b, channels))
            xn = xn + tile_c(bb)
        return xn.astype(orig_dtype).reshape(shape)

    sp_axes = tuple(range(1, x.ndim - 1))
    bshape = (b,) + (1,) * len(sp_axes) + (channels,)
    s1 = jnp.sum(x, axis=sp_axes, dtype=jnp.float32)                # (B, C)
    mean_g = jnp.sum(s1.reshape(b, g, cg), axis=-1) / (nsp * cg)
    mean_c = jnp.repeat(mean_g, cg, axis=-1).reshape(bshape)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32) - mean_c), axis=sp_axes)
    var_g = jnp.sum(s2.reshape(b, g, cg), axis=-1) / (nsp * cg)
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), cg,
                        axis=-1).reshape(bshape)
    xn = (x.astype(jnp.float32) - mean_c) * rstd_c
    if gamma is not None:
        xn = xn * jnp.broadcast_to(
            gamma.astype(jnp.float32), (b, channels)).reshape(bshape)
    if beta is not None:
        xn = xn + jnp.broadcast_to(
            beta.astype(jnp.float32), (b, channels)).reshape(bshape)
    return xn.astype(orig_dtype)


# Trace-time switch for the avgpool-down conv fusion (ResBlock fuse_down).
# Serving wins unconditionally (stage-2 enhancer 21.8 -> 16.3 ms), but inside
# the REMATTED batch-2 train step the fused stride-2 4x4 convs showed up as a
# ~1 GB "overlays" allocation in XLA's memory assignment (r5 HBM dump) — so the
# batch-2 fit ladder can probe with it off. Same trace-time-global pattern as
# _GN_LOWP_STATS (ResBlock is constructed in ~40 places; the knob must not
# change any module pytree).
_FUSE_DOWN = True


def set_down_fusion(enable: bool) -> None:
    global _FUSE_DOWN
    _FUSE_DOWN = bool(enable)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_lowp(xg: jax.Array, scale: jax.Array, bias: jax.Array,
             stat_axes: tuple, eps: float) -> jax.Array:
    """Fused low-precision GroupNorm on grouped input (B, *spatial, g, c/g):
    every full-size tensor stays in xg.dtype (bf16); only the keepdims-reduced
    statistics are fp32 (jnp reductions with dtype=f32 lower to a convert fused
    into the reduce — f32 ACCUMULATION with no f32 materialization). The custom
    VJP exists because plain AD would (a) transpose the f32 upcast into full-size
    f32 temps and (b) accumulate the affine param grads in bf16 — measured 12%
    error on the scale grad at a 512-element reduce."""
    y, _, _ = _gn_lowp_fwd_impl(xg, scale, bias, stat_axes, eps)
    return y


def _gn_lowp_fwd_impl(xg, scale, bias, stat_axes, eps):
    """Numerics: subtracting a bf16-rounded mean leaves a COHERENT per-group DC
    residual r = mean - bf16(mean) in every element — summed over 512x512 pixels
    it dominated d_bias (measured ~10x the input-quantization floor). The exact
    residual is therefore folded into an f32 effective bias, and rstd*scale is
    pre-multiplied in f32, so the only bf16 scalar roundings attach to (a) the
    zero-mean `centered` factor (cancels in DC sums) and (b) a near-zero
    effective bias (absolute error ~0.4% of ~0)."""
    mean = jnp.mean(xg, axis=stat_axes, keepdims=True, dtype=jnp.float32)
    mean_b = mean.astype(xg.dtype)
    centered = xg - mean_b                      # bf16; zero-mean up to r
    var = jnp.mean(jnp.square(centered), axis=stat_axes, keepdims=True,
                   dtype=jnp.float32)
    rstd = jax.lax.rsqrt(var + eps)             # f32, (B, 1.., g, 1)
    r = mean - mean_b.astype(jnp.float32)       # exact residual DC, f32
    eff_scale = rstd * scale                    # f32 small (B, 1.., g, c/g)
    eff_bias = bias - r * eff_scale             # f32 small
    y = centered * eff_scale.astype(xg.dtype) + eff_bias.astype(xg.dtype)
    return y, centered, rstd


def _gn_lowp_fwd(xg, scale, bias, stat_axes, eps):
    y, centered, rstd = _gn_lowp_fwd_impl(xg, scale, bias, stat_axes, eps)
    return y, (centered, rstd, scale)


def _gn_lowp_bwd(stat_axes, eps, res, gy):
    centered, rstd, scale = res
    xn = centered * rstd.astype(centered.dtype)
    # param grads: reduce over every non-(g, c/g) axis with an f32 accumulator.
    # d_scale multiplies by the F32 rstd after the spatial reduce — folding a
    # bf16-rounded rstd into xn first puts a coherent 0.4% scale error on the
    # whole same-sign sum (measured 7x the quantization floor)
    p_axes = tuple(i for i in range(xn.ndim - 2))
    sp_axes = tuple(a for a in stat_axes if a != xn.ndim - 1)
    s1 = jnp.sum(gy * centered, axis=sp_axes, keepdims=True, dtype=jnp.float32)
    d_scale = jnp.sum(s1 * rstd, axis=0).reshape(scale.shape)
    d_bias = jnp.sum(gy, axis=p_axes, dtype=jnp.float32)
    # normalization backward (per-group): dx = rstd*(gh - E[gh] - xn*E[gh*xn])
    gh = gy * scale.astype(gy.dtype)
    gmean = jnp.mean(gh, axis=stat_axes, keepdims=True, dtype=jnp.float32)
    gxmean = jnp.mean(gh * xn, axis=stat_axes, keepdims=True, dtype=jnp.float32)
    dx = rstd.astype(gy.dtype) * (
        gh - gmean.astype(gy.dtype) - xn * gxmean.astype(gy.dtype))
    return dx, d_scale.astype(scale.dtype), d_bias.astype(scale.dtype)


_gn_lowp.defvjp(_gn_lowp_fwd, _gn_lowp_bwd)


# ---- LANE-PACKED low-precision GroupNorm ------------------------------------
# The grouped (..., g, c/g) view _gn_lowp normalizes over puts c/g (6 for the
# prod C=192/g=32 GN) in the 128-lane minor dim — every full-size bf16 temp
# then pads massively, which is why the r4 ladder measured the lowp knob
# GROWING peak memory under remat. This variant runs the same numerics
# (f32-accumulated reductions, exact DC-residual fold into an f32 effective
# bias, d_scale staged after the spatial reduce) on the (..., W*C) lane-packed
# view: every full-size tensor is bf16 AND tiles losslessly. Per-channel /
# per-group statistics fold on tiny (B, W, C) reshapes of the reduce outputs.
# gamma/beta arrive as (B, C) f32 (callers broadcast; AD of the broadcast
# restores (C,) grads).

@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_lowp_packed(xp: jax.Array, gamma: jax.Array, beta: jax.Array,
                    w: int, channels: int, g: int, eps: float) -> jax.Array:
    y, _, _ = _gn_lowp_packed_fwd_impl(xp, gamma, beta, w, channels, g, eps)
    return y


def _pk_fold_c(s, b, w, channels):
    """(B, W*C) f32 reduce output -> per-channel (B, C)."""
    return jnp.sum(s.reshape(b, w, channels), axis=1)


def _pk_fold_g(s_c, g):
    """(B, C) -> per-group (B, g)."""
    b, c = s_c.shape
    return jnp.sum(s_c.reshape(b, g, c // g), axis=-1)


def _pk_tile(v_c, b, w, channels, ndim):
    """(B, C) -> (B, 1.., W*C) broadcastable over the packed tensor."""
    pshape = (b,) + (1,) * (ndim - 2) + (w * channels,)
    return jnp.broadcast_to(v_c[:, None, :], (b, w, channels)).reshape(pshape)


def _pk_tile_g(v_g, b, w, channels, g, ndim):
    """(B, g) -> (B, 1.., W*C) (per-group value repeated over channels)."""
    return _pk_tile(jnp.repeat(v_g, channels // g, axis=-1), b, w, channels,
                    ndim)


def _gn_lowp_packed_fwd_impl(xp, gamma, beta, w, channels, g, eps):
    b = xp.shape[0]
    red = tuple(range(1, xp.ndim - 1))
    nel = (xp.size // b) // g                    # elements per group
    s1 = _pk_fold_g(_pk_fold_c(
        jnp.sum(xp, axis=red, dtype=jnp.float32), b, w, channels), g)
    mean_g = s1 / nel                             # (B, g) f32
    mean_b_g = mean_g.astype(xp.dtype)
    centered = xp - _pk_tile_g(mean_b_g, b, w, channels, g, xp.ndim)  # bf16
    s2 = _pk_fold_g(_pk_fold_c(
        jnp.sum(jnp.square(centered), axis=red, dtype=jnp.float32),
        b, w, channels), g)
    rstd_g = jax.lax.rsqrt(s2 / nel + eps)        # (B, g) f32
    r_g = mean_g - mean_b_g.astype(jnp.float32)   # exact DC residual, f32
    rstd_c = jnp.repeat(rstd_g, channels // g, axis=-1)      # (B, C)
    eff_scale = rstd_c * gamma                    # (B, C) f32
    eff_bias = beta - jnp.repeat(r_g, channels // g, axis=-1) * eff_scale
    y = (centered * _pk_tile(eff_scale, b, w, channels, xp.ndim).astype(xp.dtype)
         + _pk_tile(eff_bias, b, w, channels, xp.ndim).astype(xp.dtype))
    return y, centered, rstd_g


def _gn_lowp_packed_fwd(xp, gamma, beta, w, channels, g, eps):
    y, centered, rstd_g = _gn_lowp_packed_fwd_impl(xp, gamma, beta, w,
                                                   channels, g, eps)
    return y, (centered, rstd_g, gamma)


def _gn_lowp_packed_bwd(w, channels, g, eps, res, gy):
    centered, rstd_g, gamma = res
    b = gy.shape[0]
    red = tuple(range(1, gy.ndim - 1))
    nel = (gy.size // b) // g
    xn = centered * _pk_tile_g(rstd_g.astype(centered.dtype), b, w, channels,
                               g, centered.ndim)
    rstd_c = jnp.repeat(rstd_g, channels // g, axis=-1)
    # param grads: f32-accumulated reduces; multiply by the F32 rstd AFTER the
    # spatial reduce (same staging lesson as _gn_lowp_bwd: folding a
    # bf16-rounded rstd into xn first puts a coherent error on the whole sum)
    s1_c = _pk_fold_c(jnp.sum(gy * centered, axis=red, dtype=jnp.float32),
                      b, w, channels)
    d_gamma = s1_c * rstd_c                       # (B, C) f32
    d_beta = _pk_fold_c(jnp.sum(gy, axis=red, dtype=jnp.float32),
                        b, w, channels)
    # dx = rstd*(gh - E[gh] - xn*E[gh*xn]) with per-group f32 means
    gh = gy * _pk_tile(gamma, b, w, channels, gy.ndim).astype(gy.dtype)
    gmean = _pk_fold_g(_pk_fold_c(
        jnp.sum(gh, axis=red, dtype=jnp.float32), b, w, channels), g) / nel
    gxmean = _pk_fold_g(_pk_fold_c(
        jnp.sum(gh * xn, axis=red, dtype=jnp.float32), b, w, channels),
        g) / nel
    dx = _pk_tile_g(rstd_g.astype(gy.dtype), b, w, channels, g, gy.ndim) * (
        gh - _pk_tile_g(gmean.astype(jnp.float32).astype(gy.dtype), b, w,
                        channels, g, gy.ndim)
        - xn * _pk_tile_g(gxmean.astype(gy.dtype), b, w, channels, g,
                          gy.ndim))
    return dx, d_gamma.astype(gamma.dtype), d_beta.astype(gamma.dtype)


_gn_lowp_packed.defvjp(_gn_lowp_packed_fwd, _gn_lowp_packed_bwd)


class GroupNorm(nn.Module):
    """GroupNorm(32) — the production norm (reference utils.py:953; prod norm_layer_type gn).
    Stats in fp32 regardless of activation dtype (torch semantics); under
    `set_gn_lowp_stats(True)` bf16 activations stay bf16 elementwise with fp32
    reduction accumulators (two-pass variance, no cancellation)."""
    channels: int
    groups: int = 32
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = _num_groups(self.channels, self.groups)
        orig_dtype = x.dtype
        shape = x.shape
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.channels,))
            bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        else:
            scale = jnp.ones((self.channels,), jnp.float32)
            bias = jnp.zeros((self.channels,), jnp.float32)
        del orig_dtype, shape  # _gn_forward owns ALL path selection now:
        # packed-lowp when packable, legacy grouped lowp otherwise (so no bf16
        # site ever silently reverts to f32 temps), packed/plain f32 else.
        # Reshape-free stats: the natural (..., g, c/g) grouped reshape puts
        # c/g in the 128-lane minor dim — TPU layout pads it 4x, and the
        # layout-changing copy is a fusion barrier that MATERIALIZES the
        # fp32 square/centered temps of the backward (the 260 MB allocations
        # dominating the batch-2 512px OOM dump). _gn_forward instead takes
        # per-channel spatial sums in the original channels-last layout (or
        # the lane-packed (..., W*C) view under set_gn_lane_pack), with NO
        # shared full-size f32 tensor: each consumer recomputes the cheap
        # upcast+subtract inside its own fusion.
        return _gn_forward(x, g, self.channels, self.eps,
                           scale if self.affine else None,
                           bias if self.affine else None)


class AdaGroupNorm(nn.Module):
    """Adaptive GroupNorm: GN without affine, then per-sample (gamma, beta) modulation
    gamma = weight + delta_gamma, beta = bias + delta_beta (reference AdaptiveGroupNorm
    utils.py:309-335 + assign_adaptive_norm_params utils.py:983-995)."""
    channels: int
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, mod: Mod) -> jax.Array:
        weight = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        dg, db = mod
        gamma = weight[None] + dg  # (B, C)
        beta = bias[None] + db
        # the per-sample affine rides INSIDE the shared GN elementwise region
        # (packed under set_gn_lane_pack — the warp generators' C=32 GN mul was
        # a 4.0x-padded 144 MB copy in the r5 batch-2 HBM dump)
        g = _num_groups(self.channels, self.groups)
        return _gn_forward(x, g, self.channels, self.eps, gamma, beta)


def upsample_nearest(x: jax.Array, factor) -> jax.Array:
    """Nearest-neighbor upsample; factor int (all spatial dims) or per-dim tuple."""
    spatial = x.ndim - 2
    factors = (factor,) * spatial if isinstance(factor, int) else tuple(factor)
    for i, f in enumerate(factors):
        if f != 1:
            x = jnp.repeat(x, f, axis=1 + i)
    return x


def upsample_linear(x: jax.Array, factor) -> jax.Array:
    """Bi/trilinear upsample (torch F.interpolate mode='bilinear'/'trilinear',
    align_corners=False)."""
    spatial = x.ndim - 2
    factors = (factor,) * spatial if isinstance(factor, int) else tuple(factor)
    shape = (x.shape[0],) + tuple(
        s * f for s, f in zip(x.shape[1:-1], factors)) + (x.shape[-1],)
    return jax.image.resize(x, shape, method="linear")


def avg_pool(x: jax.Array, window) -> jax.Array:
    """Average pooling with stride == window (reference downsampling 'avgpool')."""
    spatial = x.ndim - 2
    win = (window,) * spatial if isinstance(window, int) else tuple(window)
    dims = (1,) + win + (1,)
    y = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, dims, "VALID")
    denom = 1
    for w in win:
        denom *= w
    return y / denom


def max_pool_s(x: jax.Array, window) -> jax.Array:
    """Max pooling with stride == window (reference downsampling 'maxpool')."""
    spatial = x.ndim - 2
    win = (window,) * spatial if isinstance(window, int) else tuple(window)
    dims = (1,) + win + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, dims, "VALID")


def _resize_up(x: jax.Array, stride: int, mode: str) -> jax.Array:
    if mode == "nearest":
        return upsample_nearest(x, stride)
    if mode in ("bilinear", "trilinear", "linear"):
        return upsample_linear(x, stride)
    raise ValueError(f"unsupported upsampling resize {mode!r}")


def _resize_down(x: jax.Array, stride: int, mode: str) -> jax.Array:
    if mode == "avgpool":
        return avg_pool(x, stride)
    if mode == "maxpool":
        return max_pool_s(x, stride)
    raise ValueError(f"unsupported downsampling resize {mode!r}")


class TrainBatchNorm(nn.Module):
    """Trainable BatchNorm for generator blocks — the SyncBatchNorm role
    (reference: norm_layer_type='bn' converts generator norms to SyncBN when >1 GPU,
    local_encoder.py:76-79, unet_3d.py:69-72, decoder.py:66-68; prod uses GN).

    TPU-native sync: batch/spatial statistics below are plain jnp means — under
    pjit/GSPMD data parallelism with the batch sharded over the mesh, XLA lowers
    them to the cross-device all-reduce automatically, so this IS synchronized BN
    over the GLOBAL batch with no explicit collective code (apex/SyncBN equivalent).

    Running statistics (torch momentum semantics: new = (1-m)*old + m*batch, unbiased
    var) live in the SAME mutable net-state collection as spectral norm's power
    iteration ("sn_state"), so the existing train-step threading, checkpointing, and
    FSDP replication rules apply unchanged. Mutable collection == training (batch
    stats + EMA update); frozen collection == eval (running stats), matching torch
    train()/eval()."""
    channels: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        xs = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        r_mean = self.variable("sn_state", "running_mean",
                               lambda: jnp.zeros((self.channels,), jnp.float32))
        r_var = self.variable("sn_state", "running_var",
                              lambda: jnp.ones((self.channels,), jnp.float32))
        training = self.is_mutable_collection("sn_state")
        if training:
            mean = jnp.mean(xs, axes)
            var = jnp.mean(jnp.square(xs), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // self.channels
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                r_mean.value = jax.lax.stop_gradient(
                    (1.0 - m) * r_mean.value + m * mean)
                r_var.value = jax.lax.stop_gradient(
                    (1.0 - m) * r_var.value + m * unbiased)
        else:
            mean, var = r_mean.value, r_var.value
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        xn = (xs - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return xn.astype(orig_dtype)


class NormAct(nn.Module):
    """norm -> activation, optionally adaptive."""
    channels: int
    norm: str = "gn"
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, mod: Optional[Mod] = None):
        if self.norm.startswith("ada_"):
            x = AdaGroupNorm(self.channels, name="norm")(x, mod)
        elif self.norm == "bn":
            x = TrainBatchNorm(self.channels, name="norm")(x)
        elif self.norm != "none":
            x = GroupNorm(self.channels, name="norm")(x)
        return activation_fn(self.activation)(x)


class ResBlock(nn.Module):
    """Pre-activation residual block (reference ResBlock, utils.py:661-790).

    Structure: [norm, act, conv3] -> [norm, act, conv3] (+ downsample) with 1x1-conv skip
    when channels change. `stride>1` with resize='nearest'/'bilinear' upsamples BEFORE the
    block; with resize='avgpool' downsamples AFTER. Inner convs are bias-free, matching
    the reference (m_bias=False).

    WS/SN placement replicates the reference's application order and sibling rule
    (va.py:113-118: SN hooks first, THEN replace_conv_to_ws_conv, utils.py:1061-1096):
      * only the FIRST conv (block_feats.2) is WS-converted — the rule requires the
        previous sibling to be a plain nn.GroupNorm (2D) / AdaptiveGroupNorm (3D);
      * the WS replacement builds a FRESH conv with bias=True, dropping its SN hook;
      * conv_1 (block.0, sequential index 0) and skip never match the rule: SN only.
    """
    in_channels: int
    out_channels: int
    ndim: int = 2
    stride: int = 1
    norm: str = "gn"
    activation: str = "relu"
    resize: str = "none"  # 'none' | 'nearest' | 'avgpool'
    use_ws: bool = False
    use_sn: bool = False
    quant: bool = False  # int8-serve the two 3x3 convs (skip stays high precision)
    # reference adaptive_conv_type when conv_mods are threaded (utils.py:1355-1373)
    adaptive_conv_type: str = "sum"

    @nn.compact
    def __call__(self, x, mods: Optional[Sequence[Mod]] = None,
                 conv_mods: Optional[Sequence] = None, conv_alpha=1.0):
        k = (3,) * self.ndim
        # sibling rule: 2D + plain GN or 3D + adaptive GN -> conv_0 is WS'd (bias=True,
        # SN dropped); everything else keeps the SN hook and the original bias=False
        ws0 = self.use_ws and self.norm != "none" and (
            (self.ndim == 2 and not self.norm.startswith("ada_"))
            or (self.ndim == 3 and self.norm.startswith("ada_")))
        conv0_kw = dict(use_bias=ws0, use_ws=ws0, use_sn=self.use_sn and not ws0,
                        quant=self.quant)
        conv_kw = dict(use_bias=False, use_ws=False, use_sn=self.use_sn)
        upsample = self.resize in ("nearest", "bilinear", "trilinear") and self.stride > 1
        downsample = self.resize in ("avgpool", "maxpool") and self.stride > 1
        if self.stride > 1 and not (upsample or downsample):
            raise ValueError(f"unsupported resize {self.resize!r} for stride > 1")

        # Nearest replication commutes EXACTLY with GroupNorm stats (duplicated
        # values leave group mean/var unchanged), the pointwise affine/adaptive
        # modulation, the activation, and the 1x1 skip conv. Running norm+act (and
        # the skip conv) at the LOW resolution and upsampling afterwards is the same
        # math with 1/4 of the normalization bandwidth and skip FLOPs — at 512px
        # this removes the largest fp32 materialization in the decoder. (Bilinear
        # upsampling creates new values, so it keeps the reference order.)
        commute_up = upsample and self.resize == "nearest" and self.norm != "none"

        out = x
        if upsample and not commute_up:
            out = _resize_up(out, self.stride, self.resize)

        m0 = mods[0] if mods is not None else None
        m1 = mods[1] if mods is not None else None
        cm = (lambda i: (conv_mods[i], conv_alpha)) if conv_mods is not None \
            else (lambda i: None)
        act = self.adaptive_conv_type
        # commute_up continuation: fold the nearest-up2 INTO conv_0 as one
        # lhs-dilated conv (see Conv.fuse_nearest_up) — the upsampled activation
        # is never materialized. Exact same math; measured 15-40% faster per
        # up-block conv on v5e.
        fuse_up = (commute_up and self.stride == 2 and self.ndim == 2
                   and not self.quant and conv_mods is None)
        # Down-direction twin: conv_1 feeds the avg_pool directly, so the pair
        # composes into ONE stride-2 smeared-kernel conv (Conv.fuse_avgpool_down)
        # — 4/9 the conv_1 FLOPs and the full-res pool input never materializes.
        # The skip's 1x1 conv commutes exactly with the pool (per-pixel linear map
        # of a spatial average == spatial average of the map), so it pools FIRST
        # and projects at the low resolution: 1/4 the skip FLOPs.
        fuse_down = (_FUSE_DOWN and downsample and self.resize == "avgpool"
                     and self.stride == 2 and self.ndim == 2 and not self.quant
                     and conv_mods is None)
        out = NormAct(self.in_channels, self.norm, self.activation, name="norm_act_0")(out, m0)
        if commute_up and not fuse_up:
            out = _resize_up(out, self.stride, self.resize)
        out = Conv(self.out_channels, k, name="conv_0", adaptive_conv_type=act,
                   fuse_nearest_up=fuse_up, **conv0_kw)(out, ada=cm(0))
        out = NormAct(self.out_channels, self.norm, self.activation, name="norm_act_1")(out, m1)
        out = Conv(self.out_channels, k, name="conv_1", quant=self.quant,
                   adaptive_conv_type=act, fuse_avgpool_down=fuse_down,
                   **conv_kw)(out, ada=cm(1))
        if downsample and not fuse_down:
            out = _resize_down(out, self.stride, self.resize)

        skip = x
        if upsample and not commute_up:
            skip = _resize_up(skip, self.stride, self.resize)
        if fuse_down:
            skip = _resize_down(skip, self.stride, self.resize)
        if self.in_channels != self.out_channels:
            skip = Conv(self.out_channels, (1,) * self.ndim, name="skip",
                        adaptive_conv_type=act, **conv_kw)(skip, ada=cm(2))
        if commute_up:
            skip = _resize_up(skip, self.stride, self.resize)
        if downsample and not fuse_down:
            skip = _resize_down(skip, self.stride, self.resize)
        return out + skip

    @staticmethod
    def num_adaptive_norms(norm: str) -> int:
        return 2 if norm.startswith("ada_") else 0

    @staticmethod
    def conv_specs(in_channels: int, out_channels: int, ndim: int = 2):
        """(out, in, kernel_shape) for each conv that consumes a conv_mod, in
        consumption order (conv_0, conv_1[, skip]) — sizes ops.adaptive.ProjectorConv."""
        specs = [(out_channels, in_channels, (3,) * ndim),
                 (out_channels, out_channels, (3,) * ndim)]
        if in_channels != out_channels:
            specs.append((out_channels, in_channels, (1,) * ndim))
        return specs


class ConvBlock(nn.Module):
    """conv -> norm -> act (+resize) (reference ConvBlock, utils.py:791-880)."""
    in_channels: int
    out_channels: int
    ndim: int = 2
    stride: int = 1
    norm: str = "none"
    activation: str = "relu"
    resize: str = "none"
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, x, mods: Optional[Sequence[Mod]] = None):
        k = (3,) * self.ndim
        upsample = self.resize in ("nearest", "bilinear", "trilinear") and self.stride > 1
        downsample = self.resize in ("avgpool", "maxpool") and self.stride > 1
        if self.stride > 1 and not (upsample or downsample):
            raise ValueError(f"unsupported resize {self.resize!r} for stride > 1")
        out = x
        if upsample:
            out = _resize_up(out, self.stride, self.resize)
        # ConvBlock's conv sits at sequential index 0, so the reference WS replacement
        # never touches it (utils.py:1071-1077) — SN only.
        out = Conv(self.out_channels, k, use_bias=False, use_ws=False,
                   use_sn=self.use_sn, name="conv")(out)
        m0 = mods[0] if mods is not None else None
        if self.norm != "none":
            out = NormAct(self.out_channels, self.norm, self.activation, name="norm_act")(out, m0)
        else:
            out = activation_fn(self.activation)(out)
        if downsample:
            out = _resize_down(out, self.stride, self.resize)
        return out

    @staticmethod
    def num_adaptive_norms(norm: str) -> int:
        return 1 if norm.startswith("ada_") else 0
