"""ResNet-18/50 backbones (torchvision-compatible structure) in flax.linen.

Used by three reference components:
  * IdtEmbed: ResNet-50 trunk, fc replaced by 1x1 conv, adaptive avgpool to 4x4
    (reference: networks/volumetric_avatar/identity_embedder.py:12-93);
  * ExpressionEmbed: ResNet-18 `net_face` -> expression vector
    (reference: networks/volumetric_avatar/expression_embedder.py:343-380 ResNetWrapper);
  * HeadPoseRegressor: frozen ResNet-18 with num_classes=9
    (reference: networks/volumetric_avatar/head_pose_regressor.py:11-31).

Parameter tree mirrors torchvision naming (conv1/bn1/layer{1..4}/{i}/conv{1,2,3}...) so the
port tool (emoportraits_tpu/port) can map `state_dict` keys 1:1. Norm is configurable:
'bn' uses frozen running stats (inference-style, matching the frozen evaluator usage),
'gn' mirrors the reference's replace_bn_to_gn patch (utils.py replace_bn_to_gn).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import Conv, Dense, GroupNorm


class BatchNormInference(nn.Module):
    """BatchNorm evaluated with stored running stats (frozen evaluator usage).

    Running stats live in the `batch_stats` collection so ported torchvision weights keep
    their torch semantics; we never update them (reference freezes these nets in eval mode,
    losses/perceptual.py:228).
    """
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.channels,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.channels,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        return (x - mean.value) * inv + bias


class Norm(nn.Module):
    channels: int
    kind: str = "bn"  # 'bn' | 'gn'

    @nn.compact
    def __call__(self, x):
        if self.kind == "bn":
            return BatchNormInference(self.channels, name="bn")(x)
        return GroupNorm(self.channels, name="gn")(x)


def max_pool(x, window: int, stride: int, padding: int):
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads)


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3-bn-relu-conv3-bn + skip.

    When the trunk is a TRAINABLE generator subnet in the reference (IdtEmbed /
    ExpressionEmbed, both in spn_networks + ws_networks), the sibling rule
    (utils.py:1061-1096) WS-converts conv2 (previous sibling is the GN norm; bias=True,
    SN hook dropped) and leaves SN on conv1/downsample. use_ws/use_sn replicate that;
    frozen-tower usage (bn norm, flags off) is unchanged and torchvision-portable.
    """
    features: int
    stride: int = 1
    norm: str = "bn"
    downsample: bool = False
    use_ws: bool = False
    use_sn: bool = False

    @nn.compact
    def __call__(self, x):
        ws = self.use_ws and self.norm == "gn"
        out = Conv(self.features, (3, 3), strides=self.stride, use_bias=False,
                   use_sn=self.use_sn, name="conv1")(x)
        out = Norm(self.features, self.norm, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features, (3, 3), use_bias=ws, use_ws=ws,
                   use_sn=self.use_sn and not ws, name="conv2")(out)
        out = Norm(self.features, self.norm, name="bn2")(out)
        skip = x
        if self.downsample:
            skip = Conv(self.features, (1, 1), strides=self.stride, use_bias=False,
                        use_sn=self.use_sn, name="downsample_conv")(x)
            skip = Norm(self.features, self.norm, name="downsample_bn")(skip)
        return jax.nn.relu(out + skip)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4). WS/SN placement: see BasicBlock."""
    features: int
    stride: int = 1
    norm: str = "bn"
    downsample: bool = False
    use_ws: bool = False
    use_sn: bool = False
    # atrous stage (torchvision replace_stride_with_dilation; FCN-style trunks)
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        ws = self.use_ws and self.norm == "gn"
        out = Conv(self.features, (1, 1), use_bias=False, use_sn=self.use_sn,
                   name="conv1")(x)
        out = Norm(self.features, self.norm, name="bn1")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features, (3, 3), strides=self.stride, use_bias=ws, use_ws=ws,
                   kernel_dilation=self.dilation,
                   use_sn=self.use_sn and not ws, name="conv2")(out)
        out = Norm(self.features, self.norm, name="bn2")(out)
        out = jax.nn.relu(out)
        out = Conv(self.features * 4, (1, 1), use_bias=ws, use_ws=ws,
                   use_sn=self.use_sn and not ws, name="conv3")(out)
        out = Norm(self.features * 4, self.norm, name="bn3")(out)
        skip = x
        if self.downsample:
            skip = Conv(self.features * 4, (1, 1), strides=self.stride, use_bias=False,
                        use_sn=self.use_sn, name="downsample_conv")(x)
            skip = Norm(self.features * 4, self.norm, name="downsample_bn")(skip)
        return jax.nn.relu(out + skip)


class ResNet(nn.Module):
    """Returns the final feature map (B, H/32, W/32, 512*expansion); heads are applied by
    the caller (num_classes head optional for the pose regressor)."""
    layers: Sequence[int]
    block: str = "basic"  # 'basic' | 'bottleneck'
    norm: str = "bn"
    num_classes: Optional[int] = None
    in_channels: int = 3
    # torchvision width is 64; smaller values give shape-compatible miniatures for
    # tests/dryruns (parameter NAMES unchanged, so only 64 is port-compatible)
    base_width: int = 64
    # trainable-generator-subnet mode (reference SN+WS application; see BasicBlock)
    use_ws: bool = False
    use_sn: bool = False
    # torchvision replace_stride_with_dilation for stages 2-4 (bottleneck only):
    # a True entry turns that stage's stride into dilation (FCN output-stride 8/16
    # trunks, e.g. the RTNet-role face parser)
    replace_stride_with_dilation: Sequence[bool] = ()

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4
        w0 = self.base_width
        x = Conv(w0, (7, 7), strides=2, use_bias=False, use_sn=self.use_sn,
                 name="conv1")(x)
        x = Norm(w0, self.norm, name="bn1")(x)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, 1)
        feats = []
        features = w0
        dilation = 1
        for li, n_blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            prev_dilation = dilation
            if (li >= 1 and li - 1 < len(self.replace_stride_with_dilation)
                    and self.replace_stride_with_dilation[li - 1]):
                dilation *= stride  # torchvision _make_layer(dilate=True)
                stride = 1
            for bi in range(n_blocks):
                needs_down = bi == 0 and (stride != 1 or li == 0 and expansion != 1
                                          or prev_dilation != dilation)
                kw = {}
                if block_cls is Bottleneck:
                    kw["dilation"] = prev_dilation if bi == 0 else dilation
                x = block_cls(
                    features, stride if bi == 0 else 1, self.norm,
                    downsample=needs_down, use_ws=self.use_ws, use_sn=self.use_sn,
                    name=f"layer{li + 1}_{bi}", **kw)(x)
            feats.append(x)
            features *= 2
        if self.num_classes is not None:
            x = jnp.mean(x, axis=(1, 2))
            x = Dense(self.num_classes, name="fc")(x)
        if return_features:
            return x, feats
        return x


def resnet18(norm: str = "bn", num_classes: Optional[int] = None) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), block="basic", norm=norm, num_classes=num_classes)


def resnet50(norm: str = "bn", num_classes: Optional[int] = None) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), block="bottleneck", norm=norm, num_classes=num_classes)
