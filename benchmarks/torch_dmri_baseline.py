"""Measure the reference-stack dmri_hippo train throughput on CPU torch.

The reference publishes no numbers (BASELINE.md), so this measures its
canonical dmri_hippo training workload fresh: NestedResUNet(3->2,
filters=40, dropout 0.2) equivalent to ref models/nested_residual_unet.py
:49-105 / main_config.py:123-127, one full train step (forward + hybrid
Dice/log loss + backward + Adam) on batch 4 whole volumes 96x88x24
(main_config.py:23,80).

--split measures the shape the reference config ACTUALLY trains at:
StandardPredict(sagittal_split=True) halves each volume along W and stacks
the flipped right hemisphere into the batch (ref prediction.py:16-27,
main_config.py:182-183), so the canonical step is batch 8 x 48x88x24.
Total voxels are identical to the unsplit shape.

The torch model mirrors the reference semantics (conv-BN-ReLU x2 blocks,
optional residual conv, channel dropout, AvgPool3d down, trilinear
align-corners up, nested UNet++ skip grid, 3^3 out conv + softmax) without
importing reference code. Updates BASELINE_MEASURED.json.

Run: python benchmarks/torch_dmri_baseline.py [--steps 3] [--split]
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np
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

    def __init__(self, cin, cout, f=40, dropout_p=0.2):
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


def hybrid_loss(probs, target, dice_weight=0.5, eps=1e-7):
    """Ref criterions/hybrid_logistic_dice_loss.py:17-37."""
    spatial = (2, 3, 4)
    num = 2 * (probs * target).sum(spatial)
    den = (probs ** 2).sum(spatial) + (target ** 2).sum(spatial)
    dice = 1 - (num / (den + eps)).mean()
    logistic = -(target * torch.log(probs + eps)).sum(1).mean()
    return dice_weight * dice + (1 - dice_weight) * logistic


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--split", action="store_true",
                    help="sagittal-split shape: batch 8 x 48x88x24")
    args = ap.parse_args()

    torch.manual_seed(0)
    shape = (8, 3, 48, 88, 24) if args.split else (4, 3, 96, 88, 24)
    model = NestedResUNet(3, 2)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)

    rng = np.random.default_rng(0)
    X = torch.from_numpy(rng.normal(size=shape).astype(np.float32))
    lab = (X[:, 0] > 0.5).float()
    y = torch.stack([1 - lab, lab], dim=1)

    def step():
        opt.zero_grad()
        loss = hybrid_loss(model(X), y)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.time()
    for _ in range(args.steps):
        step()
    dt = (time.time() - t0) / args.steps
    vols_per_sec = shape[0] / dt / (2.0 if args.split else 1.0)

    label = "split" if args.split else "unsplit"
    print(json.dumps({"shape": list(shape), "mode": label,
                      "seconds_per_step": round(dt, 2),
                      "volumes_per_sec": round(vols_per_sec, 4)}))

    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    data = json.loads(path.read_text())
    if args.split:
        data["torch_cpu_train_split_volumes_per_sec"] = round(vols_per_sec, 4)
        data["torch_cpu_split_seconds_per_step"] = round(dt, 2)
        data["split_measured_with"] = (
            "benchmarks/torch_dmri_baseline.py --split: the reference "
            "config's actual training shape (sagittal_split=True -> batch 8 "
            "half-volumes 48x88x24, main_config.py:182-183), volumes/sec "
            "counts WHOLE volumes (2 halves each); "
            f"{args.steps} timed steps after warmup")
    else:
        data["torch_cpu_train_volumes_per_sec"] = round(vols_per_sec, 4)
        data["torch_cpu_seconds_per_step"] = round(dt, 2)
        data["measured_with"] = (
            "benchmarks/torch_dmri_baseline.py: torch CPU, "
            f"{args.steps} timed steps after warmup")
    path.write_text(json.dumps(data, indent=2) + "\n")


if __name__ == "__main__":
    main()
