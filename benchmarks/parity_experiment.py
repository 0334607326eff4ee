"""Cross-stack Dice parity: same synthetic dataset, same architecture
(NestedResUNet f=8), same hyperparameters; ours (jax, CPU) vs torch (CPU).
Small scale so torch finishes: 24x24x16 volumes, 150 iterations, batch 4.
"""
import time, numpy as np

# ---------------- shared synthetic dataset ----------------
rng = np.random.default_rng(42)
N_TRAIN, N_VAL = 8, 4
W, H, D = 24, 24, 16
def make_case(rs):
    img = rs.normal(scale=0.4, size=(1, W, H, D)).astype(np.float32)
    # random ellipsoid lesion
    c = rs.uniform([6, 6, 4], [18, 18, 12])
    r = rs.uniform(3, 6, size=3)
    zz, yy, xx = np.meshgrid(np.arange(W), np.arange(H), np.arange(D), indexing="ij")
    mask = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
            + ((xx - c[2]) / r[2]) ** 2) <= 1.0
    img[0][mask] += rs.uniform(1.0, 2.0)
    seg = mask.astype(np.float32)[None]
    return img, seg
train = [make_case(rng) for _ in range(N_TRAIN)]
val = [make_case(rng) for _ in range(N_VAL)]
Xtr = np.stack([c[0] for c in train]); Str = np.stack([c[1] for c in train])
Xva = np.stack([c[0] for c in val]); Sva = np.stack([c[1] for c in val])
ytr = np.concatenate([1 - Str, Str], 1); yva = np.concatenate([1 - Sva, Sva], 1)
ITERS, BATCH, LR = 150, 4, 1e-3
order_rng = np.random.default_rng(7)
batches = [order_rng.choice(N_TRAIN, BATCH, replace=False) for _ in range(ITERS)]

def dice(pred_labels, true_labels):
    scores = []
    for i in range(pred_labels.shape[0]):
        p = pred_labels[i] == 1; t = true_labels[i] == 1
        tp = (p & t).sum(); 
        scores.append(2 * tp / max(p.sum() + t.sum(), 1))
    return float(np.mean(scores))

# ---------------- ours (jax CPU) ----------------
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
from segmentation_pipeline_tpu.training.model import SegModel
from segmentation_pipeline_tpu.training.optimizers import Adam
from segmentation_pipeline_tpu.training.train_step import (
    collate_to_device, create_train_state, make_train_step)

model = SegModel(NestedResUNet(input_channels=1, output_channels=2, filters=8))
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
ours_dice = dice(pred, Sva[:, 0])
print(f"ours (jax): val dice {ours_dice:.4f}  ({time.time()-t0:.0f}s, final loss {float(ld['loss']):.4f})")

# ---------------- torch reference ----------------
import torch
from torch_models import NestedResUNet as TorchNet  # shared torch mirror
torch.manual_seed(0)
net = TorchNet(1, 2, f=8); topt = torch.optim.Adam(net.parameters(), lr=LR)
Xt = torch.from_numpy(Xtr); yt = torch.from_numpy(ytr)
t0 = time.time()
for ids in batches:
    topt.zero_grad()
    p = net(Xt[ids]); y = yt[ids]
    eps = 1e-8
    overlap = (p * y).sum((2,3,4)); total = (p*p).sum((2,3,4)) + (y*y).sum((2,3,4))
    dloss = (1 - 2*overlap/(total+eps)).mean()
    lloss = -((y * torch.log((p+eps)/(1+eps))).mean((2,3,4))).mean()
    (0.5*dloss + 0.5*lloss).backward(); topt.step()
net.eval()
with torch.no_grad():
    pred_t = net(torch.from_numpy(Xva)).argmax(1).numpy()
torch_dice = dice(pred_t, Sva[:, 0])
print(f"torch:      val dice {torch_dice:.4f}  ({time.time()-t0:.0f}s)")
print(f"parity gap: {abs(ours_dice - torch_dice):.4f}")
