"""PyTorch oracle models for parity testing.

Independent torch constructions of the published Attention-ASPP-UNet
architecture (SURVEY.md §2 #5-9) used ONLY as numerical oracles: the unit
tests copy their random weights into the flax models through the checkpoint
importer and require matching outputs.  State-dict key layout deliberately
matches the reference checkpoints so the importer's mapping rules are
exercised end to end.
"""

import torch
from torch import nn
import torch.nn.functional as F


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(cin, cout, k, padding=k // 2, bias=False),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.block(x)


class ASPP(nn.Module):
    def __init__(self, cin, cout, rates=(6, 12, 18)):
        super().__init__()
        branches = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                  nn.BatchNorm2d(cout), nn.ReLU(inplace=True))]
        for r in rates:
            branches.append(nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True)))
        self.blocks = nn.ModuleList(branches)
        self.pool = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                  nn.Conv2d(cin, cout, 1, bias=False),
                                  nn.BatchNorm2d(cout), nn.ReLU(inplace=True))
        self.project = nn.Sequential(nn.Conv2d(cout * 5, cout, 1, bias=False),
                                     nn.BatchNorm2d(cout), nn.ReLU(inplace=True),
                                     nn.Dropout(0.1))

    def forward(self, x):
        h, w = x.shape[2:]
        outs = [b(x) for b in self.blocks]
        pooled = F.interpolate(self.pool(x), (h, w), mode="bilinear",
                               align_corners=False)
        outs.append(pooled)
        return self.project(torch.cat(outs, dim=1))


class AttentionGateV1(nn.Module):
    def __init__(self, fg, fl, fint):
        super().__init__()
        self.Wg = nn.Sequential(nn.Conv2d(fg, fint, 1, bias=False),
                                nn.BatchNorm2d(fint))
        self.Wx = nn.Sequential(nn.Conv2d(fl, fint, 1, bias=False),
                                nn.BatchNorm2d(fint))
        self.psi = nn.Sequential(nn.Conv2d(fint, 1, 1, bias=False),
                                 nn.BatchNorm2d(1), nn.Sigmoid())
        self.relu = nn.ReLU(inplace=True)

    def forward(self, g, x):
        return x * self.psi(self.relu(self.Wg(g) + self.Wx(x)))


class AttentionGateV2(nn.Module):
    def __init__(self, fg, fl, fint=None):
        super().__init__()
        fint = fint if fint is not None else max(8, min(fg, fl) // 4)
        self.Wg = nn.Conv2d(fg, fint, 1, bias=False)
        self.Wx = nn.Conv2d(fl, fint, 1, bias=False)
        self.psi = nn.Sequential(nn.ReLU(inplace=True),
                                 nn.Conv2d(fint, 1, 1, bias=True),
                                 nn.Sigmoid())

    def forward(self, g, x):
        a = self.psi(self.Wg(g) + self.Wx(x))
        return x * a + x, a


class UpBlockV1(nn.Module):
    def __init__(self, cin, cout, use_att=True):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cout, 2, 2)
        self.att = AttentionGateV1(cout, cout, cout // 2) if use_att else None
        self.conv = nn.Sequential(ConvBNReLU(cin, cout), ConvBNReLU(cout, cout))

    def forward(self, g, x):
        g = self.up(g)
        if g.shape[-2:] != x.shape[-2:]:
            g = F.interpolate(g, size=x.shape[-2:], mode="bilinear",
                              align_corners=False)
        if self.att is not None:
            x = self.att(g, x)
        return self.conv(torch.cat([x, g], dim=1))


class UpBlockV2(nn.Module):
    def __init__(self, cin, cout, use_att=True):
        super().__init__()
        self.up = nn.ConvTranspose2d(cin, cout, 2, 2)
        self.att = AttentionGateV2(cout, cout) if use_att else None
        self.conv = nn.Sequential(ConvBNReLU(cin, cout), ConvBNReLU(cout, cout))

    def forward(self, g, x):
        g = self.up(g)
        if g.shape[-2:] != x.shape[-2:]:
            g = F.interpolate(g, size=x.shape[-2:], mode="bilinear",
                              align_corners=False)
        psi = None
        if self.att is not None:
            x, psi = self.att(g, x)
        return self.conv(torch.cat([x, g], dim=1)), psi


class AttentionASPPUNetV1(nn.Module):
    """v1 wiring: gates on u4/u3/u2, u1 plain, ASPP bridge."""

    def __init__(self, in_channels=1, num_classes=1, base_c=8):
        super().__init__()
        c = base_c
        self.d1 = nn.Sequential(ConvBNReLU(in_channels, c), ConvBNReLU(c, c))
        self.p1 = nn.MaxPool2d(2)
        self.d2 = nn.Sequential(ConvBNReLU(c, c * 2), ConvBNReLU(c * 2, c * 2))
        self.p2 = nn.MaxPool2d(2)
        self.d3 = nn.Sequential(ConvBNReLU(c * 2, c * 4), ConvBNReLU(c * 4, c * 4))
        self.p3 = nn.MaxPool2d(2)
        self.d4 = nn.Sequential(ConvBNReLU(c * 4, c * 8), ConvBNReLU(c * 8, c * 8))
        self.p4 = nn.MaxPool2d(2)
        self.bridge = ASPP(c * 8, c * 16)
        self.u4 = UpBlockV1(c * 16, c * 8)
        self.u3 = UpBlockV1(c * 8, c * 4)
        self.u2 = UpBlockV1(c * 4, c * 2)
        self.u1 = UpBlockV1(c * 2, c, use_att=False)
        self.out_conv = nn.Conv2d(c, num_classes, 1)

    def forward(self, x):
        x1 = self.d1(x)
        x2 = self.d2(self.p1(x1))
        x3 = self.d3(self.p2(x2))
        x4 = self.d4(self.p3(x3))
        b = self.bridge(self.p4(x4))
        d = self.u4(b, x4)
        d = self.u3(d, x3)
        d = self.u2(d, x2)
        d = self.u1(d, x1)
        return self.out_conv(d)


class AttentionASPPUNetV2(nn.Module):
    """Ablation wiring: v2 gates on u4 (depth>=4) / u3 (depth>=3) only;
    bridge is ASPP or ConvBNReLU+Dropout; forward returns ψ maps."""

    def __init__(self, in_channels=1, num_classes=1, base_c=8,
                 use_att=True, use_aspp=True, att_depth=4):
        super().__init__()
        c = base_c
        self.d1 = nn.Sequential(ConvBNReLU(in_channels, c), ConvBNReLU(c, c))
        self.p1 = nn.MaxPool2d(2)
        self.d2 = nn.Sequential(ConvBNReLU(c, c * 2), ConvBNReLU(c * 2, c * 2))
        self.p2 = nn.MaxPool2d(2)
        self.d3 = nn.Sequential(ConvBNReLU(c * 2, c * 4), ConvBNReLU(c * 4, c * 4))
        self.p3 = nn.MaxPool2d(2)
        self.d4 = nn.Sequential(ConvBNReLU(c * 4, c * 8), ConvBNReLU(c * 8, c * 8))
        self.p4 = nn.MaxPool2d(2)
        if use_aspp:
            self.bridge = ASPP(c * 8, c * 16)
        else:
            self.bridge = nn.Sequential(ConvBNReLU(c * 8, c * 16), nn.Dropout(0.1))
        self.u4 = UpBlockV2(c * 16, c * 8, use_att and att_depth >= 4)
        self.u3 = UpBlockV2(c * 8, c * 4, use_att and att_depth >= 3)
        self.u2 = UpBlockV2(c * 4, c * 2, False)
        self.u1 = UpBlockV2(c * 2, c, False)
        self.out_conv = nn.Conv2d(c, num_classes, 1)

    def forward(self, x):
        x1 = self.d1(x)
        x2 = self.d2(self.p1(x1))
        x3 = self.d3(self.p2(x2))
        x4 = self.d4(self.p3(x3))
        b = self.bridge(self.p4(x4))
        d, psi3 = self.u4(b, x4)
        d, psi2 = self.u3(d, x3)
        d, _ = self.u2(d, x2)
        d, _ = self.u1(d, x1)
        return self.out_conv(d), [psi3, psi2]


def randomize_bn_stats(model: nn.Module, gen: torch.Generator):
    """Give every BatchNorm non-trivial running stats so eval-mode parity
    actually exercises the imported batch_stats."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.75)
