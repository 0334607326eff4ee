"""Measure the reference-stack msseg2 patch-train throughput on CPU torch.

The reference publishes no numbers (BASELINE.md), so this measures its
canonical msseg2 training workload fresh: depth-6 BlurConv ModularUNet
(ref research/msseg2/msseg2.py:84-93), batch 4 x 96^3 x 2ch weighted patches
(msseg2.py:17,148-153), hybrid Dice/log loss with class weights [1,100]
(msseg2.py:95), SGD momentum 0.95 — one full train step
(forward + loss + backward + step).

The torch model mirrors the reference semantics (conv-BN-ReLU x2 residual
blocks, weights pre-blurred with a 2^3 box kernel for the anti-aliased
strided down/up convs, trilinear skip-concat decoder) without importing
reference code. Updates BASELINE_MEASURED.json's msseg2 entries.

Run: python benchmarks/torch_msseg2_baseline.py [--steps 1] [--batch 4]
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


def blur_weight(weight: torch.Tensor, scale: float) -> torch.Tensor:
    """2^3 box blur of an OIDHW kernel with zero pad 1: (k)^3 -> (k+1)^3."""
    k = weight.shape[2:]
    padded = F.pad(weight, (1, 1, 1, 1, 1, 1))
    out = torch.zeros(*weight.shape[:2], k[0] + 1, k[1] + 1, k[2] + 1,
                      dtype=weight.dtype)
    for dw in range(2):
        for dh in range(2):
            for dd in range(2):
                out = out + padded[:, :, dw:dw + k[0] + 1, dh:dh + k[1] + 1,
                                   dd:dd + k[2] + 1]
    return out * scale


class BlurConv3d(nn.Module):
    def __init__(self, cin, cout, kernel_size=3, stride=2, padding=1):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, kernel_size, stride, padding)
        self.stride, self.padding = stride, padding

    def forward(self, x):
        w = blur_weight(self.conv.weight, 1.0 / (8.0 * self.stride ** 3))
        return F.conv3d(x, w, self.conv.bias, self.stride, self.padding)


class BlurConvTranspose3d(nn.Module):
    def __init__(self, cin, cout, kernel_size=3, stride=2, padding=1,
                 output_padding=0):
        super().__init__()
        self.conv = nn.ConvTranspose3d(cin, cout, kernel_size, stride, padding,
                                       output_padding)
        self.stride, self.padding = stride, padding
        self.output_padding = output_padding

    def forward(self, x):
        w = blur_weight(self.conv.weight, self.stride ** 3 / 8.0)
        return F.conv_transpose3d(x, w, self.conv.bias, self.stride,
                                  self.padding, self.output_padding)


class Block3d(nn.Module):
    def __init__(self, cin, cout, residual=True):
        super().__init__()
        self.c1 = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
        self.b1 = nn.BatchNorm3d(cout)
        self.c2 = nn.Conv3d(cout, cout, 3, padding=1, bias=False)
        self.b2 = nn.BatchNorm3d(cout)
        self.res = nn.Conv3d(cin, cout, 3, padding=1) if residual else None

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        y = F.relu(self.b2(self.c2(y)))
        if self.res is not None:
            y = y + self.res(x)
        return y


class ModularUNet(nn.Module):
    """Depth-6 encoder/decoder with BlurConv down/up and skip concat."""

    def __init__(self, cin=2, cout=2, filters=(40, 40, 80, 80, 120, 120)):
        super().__init__()
        self.enc = nn.ModuleList()
        self.down = nn.ModuleList()
        c = cin
        for i, f in enumerate(filters):
            self.enc.append(Block3d(c, f))
            if i < len(filters) - 1:
                self.down.append(BlurConv3d(f, filters[i + 1]))
            c = filters[i + 1] if i < len(filters) - 1 else f
        self.up = nn.ModuleList()
        self.dec = nn.ModuleList()
        for i in range(len(filters) - 2, -1, -1):
            self.up.append(BlurConvTranspose3d(filters[i + 1], filters[i]))
            self.dec.append(Block3d(filters[i] * 2, filters[i]))
        self.out = nn.Conv3d(filters[0], cout, 3, padding=1)

    def forward(self, x):
        skips = []
        for i, enc in enumerate(self.enc):
            x = enc(x)
            skips.append(x)
            if i < len(self.down):
                x = self.down[i](x)
        x = skips.pop()
        for up, dec in zip(self.up, self.dec):
            x = up(x)
            x = dec(torch.cat([x, skips.pop()], dim=1))
        return torch.softmax(self.out(x), dim=1)


def hybrid_loss(y_pred, y, class_weights=(1.0, 100.0), dice_weight=0.5):
    spatial = tuple(range(2, y_pred.dim()))
    intersect = (y_pred * y).sum(spatial)
    denom = (y_pred ** 2).sum(spatial) + (y ** 2).sum(spatial)
    dice = 1 - (2 * intersect / denom.clamp(min=1e-8)).mean()
    w = torch.tensor(class_weights)[None, :, None, None, None]
    logistic = -(w * y * torch.log(y_pred.clamp(min=1e-8))).mean()
    return dice_weight * dice + (1 - dice_weight) * logistic


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--warm-shape", type=int, default=96,
                        help="spatial size of the warmup step; must equal the "
                             "timed 96 for honest timing (oneDNN primitives "
                             "and allocations are shape-dependent)")
    args = parser.parse_args()

    torch.manual_seed(0)
    model = ModularUNet()
    opt = torch.optim.SGD(model.parameters(), lr=0.001, momentum=0.95)

    def step(x, y):
        opt.zero_grad()
        loss = hybrid_loss(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    rng = np.random.default_rng(0)

    def batch(shape):
        X = rng.normal(size=(args.batch, 2, *shape)).astype(np.float32)
        lab = (X[:, 0] > 0.5).astype(np.float32)
        y = np.stack([1 - lab, lab], axis=1)
        return torch.from_numpy(X), torch.from_numpy(y)

    # warmup at the timed shape: oneDNN primitive caches and allocations are
    # shape-dependent, so a smaller warmup would leave first-touch costs in
    # the timed step
    xw, yw = batch((args.warm_shape,) * 3)
    step(xw, yw)

    x, y = batch((96, 96, 96))
    t0 = time.time()
    for _ in range(args.steps):
        loss = step(x, y)
    dt = (time.time() - t0) / args.steps
    pps = args.batch / dt
    print(f"torch CPU msseg2 train step: {dt:.1f}s/step, {pps:.4f} patches/sec "
          f"(loss {loss:.3f}, threads {torch.get_num_threads()})")

    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    data = json.loads(path.read_text())
    data["torch_cpu_msseg2_patches_per_sec"] = round(pps, 4)
    data["torch_cpu_msseg2_seconds_per_step"] = round(dt, 2)
    data["msseg2_measured_with"] = (
        "benchmarks/torch_msseg2_baseline.py: depth-6 BlurConv ModularUNet, "
        f"batch {args.batch} x 96^3 x 2ch, hybrid loss [1,100], SGD m=0.95; "
        f"{args.steps} timed step(s) after a {args.warm_shape}^3 warmup")
    path.write_text(json.dumps(data, indent=2) + "\n")
    print(f"updated {path}")


if __name__ == "__main__":
    main()
