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

The torch model is the shared mirror in benchmarks/torch_models.py
(reference semantics without importing reference code). Updates
BASELINE_MEASURED.json.

Run: python benchmarks/torch_dmri_baseline.py [--steps 3] [--split]
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np
import torch

from torch_models import NestedResUNet  # shared torch mirror


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
    model = NestedResUNet(3, 2, f=40, dropout_p=0.2)  # ref main_config.py:123-127
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
