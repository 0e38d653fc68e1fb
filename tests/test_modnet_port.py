"""MODNet porting parity: a torch oracle with the exact key anatomy of
`modnet_photographic_portrait_matting.ckpt` (ZHKKKe/MODNet, loaded by reference
va_losses_and_visuals.py:1108-1123) vs our flax reimplementation."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from emoportraits_tpu.models.modnet import MODNet  # noqa: E402
from emoportraits_tpu.port.towers_port import port_modnet  # noqa: E402

HR = 32


class TIBNorm(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.bnorm_channels = ch // 2
        self.bnorm = nn.BatchNorm2d(ch // 2)
        self.inorm = nn.InstanceNorm2d(ch - ch // 2, affine=False)

    def forward(self, x):
        bn = self.bnorm(x[:, :self.bnorm_channels].contiguous())
        inn = self.inorm(x[:, self.bnorm_channels:].contiguous())
        return torch.cat((bn, inn), 1)


class TConvIBNR(nn.Module):
    def __init__(self, cin, cout, k, stride=1, pad=0, with_ibn=True, with_relu=True):
        super().__init__()
        layers = [nn.Conv2d(cin, cout, k, stride, pad, bias=True)]
        if with_ibn:
            layers.append(TIBNorm(cout))
        if with_relu:
            layers.append(nn.ReLU(inplace=True))
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


class TSEBlock(nn.Module):
    def __init__(self, cin, cout, reduction=4):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(cin, cin // reduction, bias=False), nn.ReLU(),
            nn.Linear(cin // reduction, cout, bias=False), nn.Sigmoid())

    def forward(self, x):
        b, c = x.shape[:2]
        w = x.mean(dim=(2, 3))
        return x * self.fc(w).view(b, c, 1, 1)


class TInvRes(nn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers += [nn.Conv2d(cin, hidden, 1, bias=False),
                       nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)]
        layers += [nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden, bias=False),
                   nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                   nn.Conv2d(hidden, cout, 1, bias=False), nn.BatchNorm2d(cout)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
         (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class TMobileNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        feats = [nn.Sequential(nn.Conv2d(3, 32, 3, 2, 1, bias=False),
                               nn.BatchNorm2d(32), nn.ReLU6(inplace=True))]
        cin = 32
        for t, c, n, s in _PLAN:
            for bi in range(n):
                feats.append(TInvRes(cin, c, s if bi == 0 else 1, t))
                cin = c
        feats.append(nn.Sequential(nn.Conv2d(cin, 1280, 1, bias=False),
                                   nn.BatchNorm2d(1280), nn.ReLU6(inplace=True)))
        self.features = nn.Sequential(*feats)


class TBackboneWrap(nn.Module):
    def __init__(self):
        super().__init__()
        self.model = TMobileNetV2()

    def forward(self, x):
        taps = []
        for i, m in enumerate(self.model.features):
            x = m(x)
            if i in (1, 3):
                taps.append(x)
        return taps[0], taps[1], x


def _up(x, f=2):
    return F.interpolate(x, scale_factor=f, mode="bilinear", align_corners=False)


class TMODNet(nn.Module):
    """Exact key anatomy: lr_branch.backbone.model.features.*, lr_branch.se_block,
    lr/hr/f branch conv stacks + training-only heads conv_lr / conv_hr."""

    def __init__(self):
        super().__init__()
        lr = nn.Module()
        lr.backbone = TBackboneWrap()
        lr.se_block = TSEBlock(1280, 1280, reduction=4)
        lr.conv_lr16x = TConvIBNR(1280, 96, 5, 1, 2)
        lr.conv_lr8x = TConvIBNR(96, 32, 5, 1, 2)
        lr.conv_lr = TConvIBNR(32, 1, 3, 2, 1, with_ibn=False, with_relu=False)
        self.lr_branch = lr
        hr = nn.Module()
        hr.tohr_enc2x = TConvIBNR(16, HR, 1, 1, 0)
        hr.conv_enc2x = TConvIBNR(HR + 3, HR, 3, 2, 1)
        hr.tohr_enc4x = TConvIBNR(24, HR, 1, 1, 0)
        hr.conv_enc4x = TConvIBNR(2 * HR, 2 * HR, 3, 1, 1)
        hr.conv_hr4x = nn.Sequential(TConvIBNR(3 * HR + 3, 2 * HR, 3, 1, 1),
                                     TConvIBNR(2 * HR, 2 * HR, 3, 1, 1),
                                     TConvIBNR(2 * HR, HR, 3, 1, 1))
        hr.conv_hr2x = nn.Sequential(TConvIBNR(2 * HR, 2 * HR, 3, 1, 1),
                                     TConvIBNR(2 * HR, HR, 3, 1, 1),
                                     TConvIBNR(HR, HR, 3, 1, 1),
                                     TConvIBNR(HR, HR, 3, 1, 1))
        hr.conv_hr = nn.Sequential(TConvIBNR(HR + 3, HR, 3, 1, 1),
                                   TConvIBNR(HR, 1, 1, 1, 0, with_ibn=False,
                                             with_relu=False))
        self.hr_branch = hr
        f = nn.Module()
        f.conv_lr4x = TConvIBNR(32, HR, 5, 1, 2)
        f.conv_f2x = TConvIBNR(2 * HR, HR, 3, 1, 1)
        f.conv_f = nn.Sequential(TConvIBNR(HR + 3, HR // 2, 3, 1, 1),
                                 TConvIBNR(HR // 2, 1, 1, 1, 0, with_ibn=False,
                                           with_relu=False))
        self.f_branch = f

    def forward(self, img):
        enc2x, enc4x, enc32x = self.lr_branch.backbone(img)
        enc32x = self.lr_branch.se_block(enc32x)
        lr8x = self.lr_branch.conv_lr8x(_up(self.lr_branch.conv_lr16x(_up(enc32x))))
        img2x = F.interpolate(img, scale_factor=0.5, mode="bilinear",
                              align_corners=False, recompute_scale_factor=False)
        img4x = F.interpolate(img, scale_factor=0.25, mode="bilinear",
                              align_corners=False, recompute_scale_factor=False)
        enc2x = self.hr_branch.tohr_enc2x(enc2x)
        hr4x = self.hr_branch.conv_enc2x(torch.cat((img2x, enc2x), 1))
        enc4x = self.hr_branch.tohr_enc4x(enc4x)
        hr4x = self.hr_branch.conv_enc4x(torch.cat((hr4x, enc4x), 1))
        hr4x = self.hr_branch.conv_hr4x(torch.cat((hr4x, _up(lr8x), img4x), 1))
        hr2x = self.hr_branch.conv_hr2x(torch.cat((_up(hr4x), enc2x), 1))
        lr4x = self.f_branch.conv_lr4x(_up(lr8x))
        f2x = self.f_branch.conv_f2x(torch.cat((_up(lr4x), hr2x), 1))
        f = self.f_branch.conv_f(torch.cat((_up(f2x), img), 1))
        return torch.sigmoid(f)


@pytest.mark.slow
def test_port_modnet_parity():
    from test_port import _randomize_bn_stats

    torch.manual_seed(3)
    tnet = TMODNet().eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet)

    variables, man = port_modnet(tnet.state_dict())
    assert not man["missing_target_keys"], man["missing_target_keys"][:5]
    leftovers = [k for k in man["unused_source_keys"]
                 if "num_batches_tracked" not in k]
    assert not leftovers, leftovers[:5]
    assert man["aux_head_keys"], "training-only heads must be consumed + reported"

    rng = np.random.default_rng(3)
    x = (rng.random((1, 64, 64, 3)).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()

    ours = MODNet()
    out = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)), t_out,
                               atol=5e-4, rtol=1e-3)
