"""Shared torch mirror of the reference NestedResUNet for the parity and
baseline benchmarks (the ONE definition all cross-stack scripts import, so
a semantics fix lands everywhere at once).

Mirrors ref models/nested_residual_unet.py:7-105 semantics without
importing reference code: conv-BN-ReLU x2 blocks with optional residual
3^3 conv and channel dropout, AvgPool3d down, trilinear align-corners up,
UNet++ nested skip grid, 3^3 out conv + softmax.
"""
import torch
import torch.nn.functional as F
from torch import nn


class Block(nn.Module):
    def __init__(self, cin, cout, residual=False, dropout_p=0.0):
        super().__init__()
        self.seq = nn.Sequential(
            nn.Conv3d(cin, cout, 3, padding=1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU(),
            nn.Conv3d(cout, cout, 3, padding=1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU())
        self.res = nn.Conv3d(cin, cout, 3, padding=1) if residual else None
        self.drop = nn.Dropout3d(dropout_p) if dropout_p else None

    def forward(self, x):
        out = self.seq(x)
        if self.res is not None:
            out = out + self.res(x)
        if self.drop is not None:
            out = self.drop(out)
        return out


class NestedResUNet(nn.Module):
    """UNet++ nested skip grid, ref nested_residual_unet.py:49-105."""

    def __init__(self, cin, cout, f=40, dropout_p=0.0):
        super().__init__()
        b = lambda i, o, r: Block(i, o, residual=r, dropout_p=dropout_p)  # noqa: E731
        self.c00 = b(cin, f, True)
        self.c10 = b(f, f, False)
        self.c01 = b(2 * f, f, True)
        self.c20 = b(f, f, False)
        self.c11 = b(3 * f, f, False)
        self.c02 = b(2 * f, f, True)
        self.c30 = b(f, f, False)
        self.c21 = b(3 * f, f, False)
        self.c12 = b(3 * f, f, False)
        self.c03 = b(2 * f, f, True)
        self.out = nn.Conv3d(f, cout, 3, padding=1)

    def forward(self, x):
        down = lambda t: F.avg_pool3d(t, 2, 2)  # noqa: E731
        up = lambda t: F.interpolate(  # noqa: E731
            t, scale_factor=2, mode="trilinear", align_corners=True)
        cat = lambda *ts: torch.cat(ts, dim=1)  # noqa: E731
        x00 = self.c00(x)
        x10 = self.c10(down(x00))
        x01 = self.c01(cat(x00, up(x10)))
        x20 = self.c20(down(x10))
        x11 = self.c11(cat(x10, up(x20), down(x01)))
        x02 = self.c02(cat(x01, up(x11)))
        x30 = self.c30(down(x20))
        x21 = self.c21(cat(x20, up(x30), down(x11)))
        x12 = self.c12(cat(x11, up(x21), down(x02)))
        x03 = self.c03(cat(x02, up(x12)))
        return torch.softmax(self.out(x03), dim=1)
