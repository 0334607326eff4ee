"""Cross-stack MULTI-CLASS Dice parity (the qsm_deep_grey_matter-style
label path: one-hot C>2, per-structure Dice): same synthetic dataset, same
NestedResUNet f=8 architecture, same hyperparameters and batch order; ours
(jax, CPU) vs torch (CPU). Complements benchmarks/parity_experiment.py
(2-class dmri path) and the msseg2 patch-path experiment.

Small scale so torch finishes: 24x24x16 volumes, 150 iterations, batch 4,
5 foreground structures + background = 6 classes.
"""
import time

import numpy as np

rng = np.random.default_rng(42)
N_TRAIN, N_VAL = 8, 4
W, H, D = 24, 24, 16
N_CLASSES = 6

def make_case(rs):
    img = rs.normal(scale=0.4, size=(1, W, H, D)).astype(np.float32)
    seg = np.zeros((W, H, D), np.int64)
    zz, yy, xx = np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                             indexing="ij")
    # 5 ellipsoid structures anchored in disjoint regions (jittered) so
    # every class is present and learnable; distinct intensity per label
    anchors = [(6, 6, 5), (18, 6, 5), (6, 18, 5), (18, 18, 5), (12, 12, 11)]
    for label in range(1, N_CLASSES):
        c = np.array(anchors[label - 1], float) + rs.uniform(-1.5, 1.5, 3)
        r = rs.uniform(2.2, 3.8, size=3)
        mask = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                + ((xx - c[2]) / r[2]) ** 2) <= 1.0
        seg[mask] = label
        img[0][mask] += 0.5 * label + rs.uniform(-0.1, 0.1)
    onehot = np.eye(N_CLASSES, dtype=np.float32)[seg]      # (W,H,D,C)
    return img, np.moveaxis(onehot, -1, 0), seg

train = [make_case(rng) for _ in range(N_TRAIN)]
val = [make_case(rng) for _ in range(N_VAL)]
Xtr = np.stack([c[0] for c in train]); ytr = np.stack([c[1] for c in train])
Xva = np.stack([c[0] for c in val])
Sva = np.stack([c[2] for c in val])
ITERS, BATCH, LR = 150, 4, 1e-3
order_rng = np.random.default_rng(7)
batches = [order_rng.choice(N_TRAIN, BATCH, replace=False) for _ in range(ITERS)]

def mean_dice(pred_labels, true_labels):
    """Mean over subjects and foreground classes (qsm scoring style)."""
    scores = []
    for i in range(pred_labels.shape[0]):
        for c in range(1, N_CLASSES):
            p = pred_labels[i] == c
            t = true_labels[i] == c
            if t.sum() == 0 and p.sum() == 0:
                continue
            scores.append(2 * (p & t).sum() / max(p.sum() + t.sum(), 1))
    return float(np.mean(scores))

# ---------------- ours (jax CPU) ----------------
import jax; jax.config.update("jax_platforms", "cpu")  # noqa: E402
from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss  # noqa: E402
from segmentation_pipeline_tpu.models import NestedResUNet  # noqa: E402
from segmentation_pipeline_tpu.training.model import SegModel  # noqa: E402
from segmentation_pipeline_tpu.training.optimizers import Adam  # noqa: E402
from segmentation_pipeline_tpu.training.train_step import (  # noqa: E402
    collate_to_device, create_train_state, make_train_step)

model = SegModel(NestedResUNet(input_channels=1, output_channels=N_CLASSES,
                               filters=8))
crit = HybridLogisticDiceLoss()
opt = Adam(lr=LR)
state = create_train_state(model, opt, {"X": Xtr[:BATCH], "y": ytr[:BATCH]})
step = make_train_step(model.module, crit, opt)
key = jax.random.PRNGKey(0)
t0 = time.time()
for ids in batches:
    batch = collate_to_device({"X": Xtr[ids], "y": ytr[ids]})
    key, sub = jax.random.split(key)
    state, ld, _ = step(state, batch, sub)
model.update_variables(state.params, state.batch_stats)
pred = np.argmax(np.asarray(model(Xva)), axis=1)
ours_dice = mean_dice(pred, Sva)
print(f"ours (jax): val mean multiclass dice {ours_dice:.4f}  "
      f"({time.time()-t0:.0f}s, final loss {float(ld['loss']):.4f})")

# ---------------- torch reference ----------------
import torch  # noqa: E402

from torch_models import NestedResUNet as TorchNet  # shared torch mirror

torch.manual_seed(0)
net = TorchNet(1, N_CLASSES, f=8)
topt = torch.optim.Adam(net.parameters(), lr=LR)
Xt = torch.from_numpy(Xtr); yt = torch.from_numpy(ytr)
t0 = time.time()
for ids in batches:
    topt.zero_grad()
    p = net(Xt[ids]); y = yt[ids]
    eps = 1e-8
    overlap = (p * y).sum((2, 3, 4))
    total = (p * p).sum((2, 3, 4)) + (y * y).sum((2, 3, 4))
    dloss = (1 - 2 * overlap / (total + eps)).mean()
    lloss = -((y * torch.log((p + eps) / (1 + eps))).mean((2, 3, 4))).mean()
    (0.5 * dloss + 0.5 * lloss).backward()
    topt.step()
net.eval()
with torch.no_grad():
    pred_t = net(torch.from_numpy(Xva)).argmax(1).numpy()
torch_dice = mean_dice(pred_t, Sva)
print(f"torch:      val mean multiclass dice {torch_dice:.4f}  ({time.time()-t0:.0f}s)")
print(f"parity gap: {abs(ours_dice - torch_dice):.4f}")
