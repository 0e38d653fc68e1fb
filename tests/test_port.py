"""Checkpoint-porting parity: torch reference nets (torchvision-compatible naming,
random weights) ported to our flax modules must produce numerically identical outputs.

torchvision isn't installed in this image, so the tests build minimal torch modules with
the exact torchvision state_dict naming (conv1/bn1/layer{i}.{j}.conv{k}/downsample...).
"""
import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from emoportraits_tpu.models.backbones.resnet import ResNet
from emoportraits_tpu.losses.perceptual import VGG19_STAGES, VGGFeatures
from emoportraits_tpu.port.torch_port import port_resnet, port_vgg_features


class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        skip = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + skip)


class TBottleneck(nn.Module):
    def __init__(self, cin, cmid, stride=1):
        super().__init__()
        cout = cmid * 4
        self.conv1 = nn.Conv2d(cin, cmid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cmid)
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        skip = self.downsample(x) if self.downsample is not None else x
        return self.relu(out + skip)


class TResNet(nn.Module):
    """torchvision-naming-compatible ResNet."""

    def __init__(self, layers, block="basic", num_classes=None):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        expansion = 1 if block == "basic" else 4
        cin, cmid = 64, 64
        for li, n in enumerate(layers, start=1):
            blocks = []
            for bi in range(n):
                stride = 1 if li == 1 or bi > 0 else 2
                if block == "basic":
                    blocks.append(TBasicBlock(cin, cmid, stride))
                    cin = cmid
                else:
                    blocks.append(TBottleneck(cin, cmid, stride))
                    cin = cmid * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
            cmid *= 2
        self.num_classes = num_classes
        if num_classes:
            self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        if self.num_classes:
            x = x.mean(dim=(2, 3))
            x = self.fc(x)
        return x


def _randomize_bn_stats(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


def test_port_resnet18_output_parity():
    torch.manual_seed(0)
    tnet = TResNet((2, 2, 2, 2), "basic", num_classes=9).eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet)
    variables, manifest = port_resnet(tnet.state_dict(), layers=(2, 2, 2, 2),
                                      block="basic")
    assert not manifest["missing_target_keys"], manifest["missing_target_keys"][:5]
    leftovers = [k for k in manifest["unused_source_keys"]
                 if "num_batches_tracked" not in k]
    assert not leftovers, leftovers[:5]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()

    net = ResNet(layers=(2, 2, 2, 2), block="basic", norm="bn", num_classes=9)
    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, t_out, atol=2e-4, rtol=1e-3)


def test_port_resnet50_output_parity():
    torch.manual_seed(1)
    tnet = TResNet((3, 4, 6, 3), "bottleneck").eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet, 1)
    variables, manifest = port_resnet(tnet.state_dict(), layers=(3, 4, 6, 3),
                                      block="bottleneck")
    assert not manifest["missing_target_keys"]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
        t_out = np.transpose(t_out, (0, 2, 3, 1))
    net = ResNet(layers=(3, 4, 6, 3), block="bottleneck", norm="bn")
    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, t_out, atol=5e-4, rtol=1e-2)


def test_port_vgg19_feature_parity():
    torch.manual_seed(2)
    layers = []
    for (n_convs, ch), cin in zip(VGG19_STAGES, (3, 64, 128, 256, 512)):
        for ci in range(n_convs):
            layers += [nn.Conv2d(cin if ci == 0 else ch, ch, 3, 1, 1), nn.ReLU()]
        layers += [nn.MaxPool2d(2, 2)]
    tnet = nn.Sequential(*layers).eval()
    variables, manifest = port_vgg_features(
        {f"features.{k}": v for k, v in tnet.state_dict().items()}, VGG19_STAGES)
    assert not manifest["missing_target_keys"]

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        xin = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        t11 = np.transpose(tnet[:2](xin).numpy(), (0, 2, 3, 1))
        t31 = np.transpose(tnet[:12](xin).numpy(), (0, 2, 3, 1))

    net = VGGFeatures(stages=VGG19_STAGES)
    feats = net.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feats["relu_1_1"]), t11, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(feats["relu_3_1"]), t31, atol=1e-4, rtol=1e-3)
