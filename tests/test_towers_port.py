"""Porting parity for the frozen towers: head-pose resnet18(9), the face_par_off
BiSeNet (79999_iter.pth layout), and lpips-alex.

The released checkpoints are not in this environment, so oracles are torch nets built
with the EXACT state_dict key anatomy of each checkpoint (random weights + randomized
BN stats); ported outputs must match numerically. Oracle layouts follow the loaders in
reference networks/volumetric_avatar/head_pose_regressor.py:14-16 (torchvision
resnet18), face_parcing.py:23-28 (zllrunning BiSeNet), losses/lpips.py:10 (lpips alex).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_port import TResNet, _randomize_bn_stats  # noqa: E402

from emoportraits_tpu.port.towers_port import (  # noqa: E402
    port_bisenet,
    port_head_pose,
    port_lpips,
)


def _filter(keys):
    return [k for k in keys if "num_batches_tracked" not in k]


# ------------------------------------------------------------------------- head pose

def test_port_head_pose_parity():
    from emoportraits_tpu.models.head_pose import HeadPoseRegressor

    torch.manual_seed(0)
    tnet = TResNet((2, 2, 2, 2), "basic", num_classes=9).eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet)
        # keep thetas well-conditioned: tiny head outputs like the trained regressor
        tnet.fc.weight.mul_(0.01)

    variables, man = port_head_pose(tnet.state_dict())
    assert not man["missing_target_keys"], man["missing_target_keys"][:5]
    assert not _filter(man["unused_source_keys"]), man["unused_source_keys"][:5]

    rng = np.random.default_rng(0)
    x = rng.random((2, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        s, r, t = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())) \
            .split([3, 3, 3], dim=1)

    ours = HeadPoseRegressor()
    theta, s_j, r_j, t_j = ours.apply(variables, jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(s_j), s.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(r_j), r.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_j), t.numpy(), atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------------- BiSeNet

class TConvBNReLU(nn.Module):
    def __init__(self, cin, cout, ks=3, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, ks // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TARM(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConvBNReLU(cin, cout)
        self.conv_atten = nn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = nn.BatchNorm2d(cout)

    def forward(self, x):
        feat = self.conv(x)
        atten = F.avg_pool2d(feat, feat.size()[2:])
        atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
        return feat * atten


class TFFM(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.convblk = TConvBNReLU(cin, cout, ks=1)
        self.conv1 = nn.Conv2d(cout, cout // 4, 1, bias=False)
        self.conv2 = nn.Conv2d(cout // 4, cout, 1, bias=False)

    def forward(self, sp, cp):
        feat = self.convblk(torch.cat([sp, cp], dim=1))
        atten = F.avg_pool2d(feat, feat.size()[2:])
        atten = torch.sigmoid(self.conv2(F.relu(self.conv1(atten))))
        return feat + feat * atten


class TBiSeNetOutput(nn.Module):
    def __init__(self, cin, cmid, n_classes):
        super().__init__()
        self.conv = TConvBNReLU(cin, cmid)
        self.conv_out = nn.Conv2d(cmid, n_classes, 1, bias=False)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class TContextPath(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = TResNet((2, 2, 2, 2), "basic")
        self.arm16 = TARM(256, 128)
        self.arm32 = TARM(512, 128)
        self.conv_head32 = TConvBNReLU(128, 128)
        self.conv_head16 = TConvBNReLU(128, 128)
        self.conv_avg = TConvBNReLU(512, 128, ks=1)

    def forward(self, x):
        r = self.resnet
        x = r.maxpool(F.relu(r.bn1(r.conv1(x))))
        feat4 = r.layer1(x)
        feat8 = r.layer2(feat4)
        feat16 = r.layer3(feat8)
        feat32 = r.layer4(feat16)
        h8, w8 = feat8.size()[2:]
        h16, w16 = feat16.size()[2:]
        h32, w32 = feat32.size()[2:]
        avg = F.avg_pool2d(feat32, feat32.size()[2:])
        avg_up = F.interpolate(self.conv_avg(avg), (h32, w32), mode="nearest")
        feat32_sum = self.arm32(feat32) + avg_up
        feat32_up = F.interpolate(feat32_sum, (h16, w16), mode="nearest")
        feat32_up = self.conv_head32(feat32_up)
        feat16_sum = self.arm16(feat16) + feat32_up
        feat16_up = F.interpolate(feat16_sum, (h8, w8), mode="nearest")
        feat16_up = self.conv_head16(feat16_up)
        return feat8, feat16_up, feat32_up


class TBiSeNet(nn.Module):
    """zllrunning face-parsing BiSeNet with the exact 79999_iter.pth key names."""

    def __init__(self, n_classes=19):
        super().__init__()
        self.cp = TContextPath()
        self.ffm = TFFM(256, 256)
        self.conv_out = TBiSeNetOutput(256, 256, n_classes)
        self.conv_out16 = TBiSeNetOutput(128, 64, n_classes)
        self.conv_out32 = TBiSeNetOutput(128, 64, n_classes)

    def forward(self, x):
        h, w = x.size()[2:]
        feat_res8, feat_cp8, feat_cp16 = self.cp(x)
        feat_fuse = self.ffm(feat_res8, feat_cp8)
        out = self.conv_out(feat_fuse)
        return F.interpolate(out, (h, w), mode="bilinear", align_corners=True)


def test_port_bisenet_parity():
    from emoportraits_tpu.models.face_parsing import BiSeNet

    torch.manual_seed(1)
    tnet = TBiSeNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet)

    variables, man = port_bisenet(tnet.state_dict())
    assert not man["missing_target_keys"], man["missing_target_keys"][:5]
    assert not _filter(man["unused_source_keys"]), man["unused_source_keys"][:5]
    assert man["aux_head_keys"], "aux training heads must be consumed + reported"

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()

    ours = BiSeNet()
    out = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), t_out,
                               atol=5e-4, rtol=1e-3)


# ------------------------------------------------------------------- RT-GENE (gaze)

_VGG16_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _t_vgg16_features():
    layers = []
    cin = 3
    for ch, n in _VGG16_PLAN:
        for _ in range(n):
            layers += [nn.Conv2d(cin, ch, 3, 1, 1), nn.ReLU(inplace=True)]
            cin = ch
        layers.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*layers)


class TGazeModelVGG(nn.Module):
    """GazeEstimationModelVGG key anatomy: two torchvision-vgg16 feature towers +
    unused gaze head (rt_gaze_estimation_models.py:285-321)."""

    def __init__(self):
        super().__init__()
        self.left_features = _t_vgg16_features()
        self.right_features = _t_vgg16_features()
        self.xl = nn.Linear(512, 256)
        self.xr = nn.Linear(512, 256)
        self.concat = nn.Linear(512, 128)
        self.fc = nn.Linear(128, 2)


def test_port_gaze_parity():
    from emoportraits_tpu.losses.perceptual import VGG16_STAGES, VGGFeatures
    from emoportraits_tpu.port.towers_port import port_gaze

    torch.manual_seed(4)
    tnet = TGazeModelVGG().eval()
    variables, man = port_gaze(tnet.state_dict())
    assert not man["missing_target_keys"], man["missing_target_keys"][:5]
    assert not man["unused_source_keys"], man["unused_source_keys"][:5]
    assert man["aux_head_keys"]

    rng = np.random.default_rng(4)
    x = rng.random((2, 36, 60, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    net = VGGFeatures(stages=VGG16_STAGES)
    # the loss taps Sequential indices (1, 6, 11, 18, 25) == relu_{1..5}_1
    for side, tower in (("left", tnet.left_features), ("right", tnet.right_features)):
        ours = net.apply(variables[side], jnp.asarray(x))
        with torch.no_grad():
            y = xt
            taps = {}
            for i, layer in enumerate(tower):
                y = layer(y)
                for si, idx in enumerate((1, 6, 11, 18, 25), start=1):
                    if i == idx:
                        taps[f"relu_{si}_1"] = y.numpy()
        for name, ref in taps.items():
            np.testing.assert_allclose(
                np.transpose(np.asarray(ours[name]), (0, 3, 1, 2)), ref,
                atol=2e-4, rtol=1e-3, err_msg=f"{side}/{name}")


def test_gaze_loss_left_right_params():
    """gaze_loss accepts the ported {'left','right'} param form and the flip terms
    change the result vs a single shared tower only via the tower choice."""
    import jax
    from emoportraits_tpu.losses.gaze import gaze_loss
    from emoportraits_tpu.losses.perceptual import VGGFeatures

    # tiny 5-stage tower: same relu_{i}_1 interface, ~instant compile
    tower = VGGFeatures(stages=((1, 4),) * 5)
    params = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 36, 60, 3)))
    apply_fn = tower.apply
    rng = np.random.default_rng(5)
    pred = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    kp = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 68, 2)).astype(np.float32))
    l_shared = gaze_loss(apply_fn, params, pred, tgt, kp)
    l_pair = gaze_loss(apply_fn, {"left": params, "right": params}, pred, tgt, kp)
    np.testing.assert_allclose(float(l_shared), float(l_pair), rtol=1e-6)
    assert np.isfinite(float(l_shared)) and float(l_shared) > 0


# ----------------------------------------------------------------------------- LPIPS

_ALEX_TV = ((3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
            (384, 256, 3, 1, 1), (256, 256, 3, 1, 1))
_SLICE_BOUNDS = ((0, 2), (2, 5), (5, 8), (8, 10), (10, 12))


class TLPIPS(nn.Module):
    """lpips.LPIPS(net='alex') with the exact state_dict key names."""

    def __init__(self):
        super().__init__()
        feats = []
        convs = iter(_ALEX_TV)
        for i in range(12):
            if i in (0, 3, 6, 8, 10):
                cin, cout, k, s, p = next(convs)
                feats.append(nn.Conv2d(cin, cout, k, s, p))
            elif i in (2, 5):
                feats.append(nn.MaxPool2d(3, 2))
            else:
                feats.append(nn.ReLU())
        feats.append(nn.MaxPool2d(3, 2))
        self.net = nn.Module()
        # lpips keeps the ORIGINAL torchvision features indices as module names
        # inside each slice (add_module(str(x), ...)), so keys are net.slice2.3 etc.
        for si, (lo, hi) in enumerate(_SLICE_BOUNDS, start=1):
            sl = nn.Sequential()
            for i in range(lo, hi):
                sl.add_module(str(i), feats[i])
            setattr(self.net, f"slice{si}", sl)
        for i, ch in enumerate((64, 192, 384, 256, 256)):
            lin = nn.Module()
            lin.model = nn.Sequential(nn.Dropout(), nn.Conv2d(ch, 1, 1, bias=False))
            setattr(self, f"lin{i}", lin)
        self.scaling_layer = nn.Module()
        self.scaling_layer.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.scaling_layer.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def forward(self, a, b):
        def norm_input(img):
            img = img * 2.0 - 1.0
            return (img - self.scaling_layer.shift) / self.scaling_layer.scale

        def feats(x):
            outs = []
            for si in range(1, 6):
                x = getattr(self.net, f"slice{si}")(x)
                outs.append(x)
            return outs

        total = 0.0
        for i, (xa, xb) in enumerate(zip(feats(norm_input(a)),
                                         feats(norm_input(b)))):
            na = xa / (xa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = getattr(self, f"lin{i}").model[1]((na - nb) ** 2)
            total = total + d.mean()
        return total


def test_port_lpips_parity():
    from emoportraits_tpu.losses.lpips import LPIPS

    torch.manual_seed(2)
    tnet = TLPIPS().eval()
    with torch.no_grad():
        for i in range(5):  # released lin weights are non-negative
            m = getattr(tnet, f"lin{i}").model[1]
            m.weight.abs_()

    variables, man = port_lpips(tnet.state_dict())
    assert not man["missing_target_keys"], man["missing_target_keys"][:5]
    assert not man["unused_source_keys"], man["unused_source_keys"][:5]

    rng = np.random.default_rng(2)
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = float(tnet(torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy()),
                           torch.from_numpy(np.transpose(b, (0, 3, 1, 2)).copy())))

    ours = LPIPS()
    out = float(ours.apply(variables, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, t_out, rtol=1e-4, atol=1e-5)


def test_port_cli_roundtrip(tmp_path):
    """End-to-end CLI: torch .pth on disk -> ported .npz + manifest; the saved tree
    reloads and reproduces the net output."""
    import jax
    from emoportraits_tpu.models.head_pose import HeadPoseRegressor
    from emoportraits_tpu.port.cli import load_ported, main

    torch.manual_seed(9)
    tnet = TResNet((2, 2, 2, 2), "basic", num_classes=9).eval()
    ckpt = str(tmp_path / "head_pose_regressor.pth")
    # DataParallel-style prefix must be stripped by the CLI
    torch.save({f"module.{k}": v for k, v in tnet.state_dict().items()}, ckpt)
    out_dir = str(tmp_path / "ported")
    assert main(["head_pose", ckpt, out_dir]) == 0
    variables = load_ported(out_dir + "/head_pose.npz")
    x = np.random.default_rng(9).random((1, 128, 128, 3)).astype(np.float32)
    theta = HeadPoseRegressor().apply(jax.tree.map(jnp.asarray, variables),
                                      jnp.asarray(x))
    assert np.isfinite(np.asarray(theta)).all()
