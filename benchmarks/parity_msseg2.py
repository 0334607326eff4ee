"""msseg2-style cross-stack Dice parity: weighted patch training of the
BlurConv ModularUNet, ours (jax, CPU) vs a faithful torch mirror (CPU).

Mirrors the reference's patch path (ref research/msseg2/msseg2.py:84-153):
two-timepoint input, lesion-weighted patch-probability map, weighted patch
sampling, depth-scaled ModularUNet with BlurConv3d down / BlurConvTranspose3d
up (weights pre-blurred with the 2^3 box kernel, ref components.py:91-154),
class-weighted hybrid logistic/Dice loss ([1, 100], ref msseg2.py:95),
SGD+momentum. Scaled down so torch CPU finishes: 48x48x32 volumes, 24^3
patches, depth 4, filters [8, 8, 16, 16].

Both stacks consume the IDENTICAL precomputed (subject, patch-start)
sequence — drawn once with numpy from the same valid-center probability
math the framework's WeightedSampler uses — so the only divergence sources
are weight init and BN dynamics: the remaining Dice gap is the
cross-stack parity number.
"""
import time

import numpy as np

# ---------------- shared synthetic dataset ----------------
rng = np.random.default_rng(42)
N_TRAIN, N_VAL = 8, 4
W, H, D = 48, 48, 32
PATCH = 24
ITERS, BATCH = 200, 4
LR, MOMENTUM = 3e-3, 0.95
FILTERS = [8, 8, 16, 16]
DEPTH = 4


def make_case(rs):
    base = rs.normal(scale=0.3, size=(W, H, D)).astype(np.float32)
    lesions = np.zeros((W, H, D), np.float32)
    for _ in range(4):
        c = rs.uniform([6, 6, 5], [W - 6, H - 6, D - 5])
        r = rs.uniform(2, 4, size=3)
        zz, yy, xx = np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                                 indexing="ij")
        mask = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                + ((xx - c[2]) / r[2]) ** 2) <= 1.0
        lesions[mask] = 1.0
    t1 = base
    t2 = base + lesions * rs.uniform(1.0, 1.8)
    X = np.stack([t1, t2])  # (2, W, H, D): the two-timepoint concat
    return X, lesions[None]


train = [make_case(rng) for _ in range(N_TRAIN)]
val = [make_case(rng) for _ in range(N_VAL)]
Xtr = np.stack([c[0] for c in train])
Str = np.stack([c[1] for c in train])
Xva = np.stack([c[0] for c in val])
Sva = np.stack([c[1] for c in val])
ytr = np.concatenate([1 - Str, Str], 1)

# ---------------- shared weighted patch sequence ----------------
# the framework's WeightedSampler valid-center math: brain 1 + lesion 100,
# centers masked so the patch fits (loader.py WeightedSampler)
half = PATCH // 2
lo, hi = half, np.array([W, H, D]) - (PATCH - half)
order_rng = np.random.default_rng(7)
subject_seq = [order_rng.permutation(N_TRAIN) for _ in
               range(-(-ITERS * BATCH // N_TRAIN))]
subject_seq = np.concatenate(subject_seq)[:ITERS * BATCH]
starts = np.zeros((ITERS * BATCH, 3), np.int64)
for n, si in enumerate(subject_seq):
    prob = 1.0 + 100.0 * Str[si, 0]
    masked = np.zeros_like(prob)
    sl = tuple(slice(int(l), int(h) + 1) for l, h in zip([lo] * 3, hi))
    masked[sl] = prob[sl]
    flat = masked.ravel() / masked.sum()
    idx = order_rng.choice(flat.shape[0], p=flat)
    center = np.unravel_index(idx, prob.shape)
    starts[n] = np.array(center) - half

Xp = np.stack([Xtr[si, :, s[0]:s[0] + PATCH, s[1]:s[1] + PATCH,
                   s[2]:s[2] + PATCH]
               for si, s in zip(subject_seq, starts)])
yp = np.stack([ytr[si, :, s[0]:s[0] + PATCH, s[1]:s[1] + PATCH,
                   s[2]:s[2] + PATCH]
               for si, s in zip(subject_seq, starts)])


def dice(pred_labels, true_labels):
    scores = []
    for i in range(pred_labels.shape[0]):
        p = pred_labels[i] == 1
        t = true_labels[i] == 1
        tp = (p & t).sum()
        scores.append(2 * tp / max(p.sum() + t.sum(), 1))
    return float(np.mean(scores))


# ---------------- ours (jax CPU) ----------------
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss  # noqa: E402
from segmentation_pipeline_tpu.models import (BlurConv3d,  # noqa: E402
                                              BlurConvTranspose3d, ModularUNet)
from segmentation_pipeline_tpu.training.model import SegModel  # noqa: E402
from segmentation_pipeline_tpu.training.optimizers import SGD  # noqa: E402
from segmentation_pipeline_tpu.training.train_step import (  # noqa: E402
    collate_to_device, create_train_state, make_train_step)

model = SegModel(ModularUNet(
    in_channels=2, out_channels=2, filters=FILTERS, depth=DEPTH,
    block_params={"residual": True},
    downsample_class=BlurConv3d,
    downsample_params={"kernel_size": 3, "stride": 2, "padding": 1},
    upsample_class=BlurConvTranspose3d,
    upsample_params={"kernel_size": 3, "stride": 2, "padding": 1,
                     "output_padding": 0}))
crit = HybridLogisticDiceLoss(logistic_class_weights=[1, 100])
opt = SGD(lr=LR, momentum=MOMENTUM)
state = create_train_state(model, opt, {"X": Xp[:BATCH], "y": yp[:BATCH]})
step = make_train_step(model.module, crit, opt)
key = jax.random.PRNGKey(0)
t0 = time.time()
for it in range(ITERS):
    sl = slice(it * BATCH, (it + 1) * BATCH)
    batch = collate_to_device({"X": Xp[sl], "y": yp[sl]})
    key, sub = jax.random.split(key)
    state, ld, _ = step(state, batch, sub)
model.update_variables(state.params, state.batch_stats)
pred = np.argmax(np.asarray(model(Xva)), axis=1)
ours_dice = dice(pred, Sva[:, 0])
print(f"ours (jax): val dice {ours_dice:.4f}  "
      f"({time.time() - t0:.0f}s, final loss {float(ld['loss']):.4f})")

# ---------------- torch mirror ----------------
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

torch.manual_seed(0)


def blur_weight_t(w, scale):
    """2^3 box blur of an (O, I, k, k, k) kernel -> (O, I, k+1, k+1, k+1)
    (mirror of components._blur_weight / ref components.py:103-119)."""
    k = w.shape[2:]
    padded = F.pad(w, (1, 1, 1, 1, 1, 1))
    out = torch.zeros((*w.shape[:2], k[0] + 1, k[1] + 1, k[2] + 1),
                      dtype=w.dtype)
    for dw in range(2):
        for dh in range(2):
            for dd in range(2):
                out = out + padded[:, :, dw:dw + k[0] + 1, dh:dh + k[1] + 1,
                                   dd:dd + k[2] + 1]
    return out * scale


class BlurConvT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(cout, cin, 3, 3, 3))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        self.bias = nn.Parameter(torch.zeros(cout))

    def forward(self, x):
        w = blur_weight_t(self.weight, 1.0 / (8.0 * 8.0))
        return F.conv3d(x, w, self.bias, stride=2, padding=1)


class BlurConvTransposeT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(cout, cin, 3, 3, 3))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        self.bias = nn.Parameter(torch.zeros(cout))

    def forward(self, x):
        w = blur_weight_t(self.weight, 8.0 / 8.0)
        # torch transpose weight layout is (I, O, k...)
        return F.conv_transpose3d(x, w.transpose(0, 1), self.bias, stride=2,
                                  padding=1, output_padding=0)


class BlockT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm3d(cout)
        self.conv2 = nn.Conv3d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm3d(cout)
        self.res = nn.Conv3d(cin, cout, 3, padding=1)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        return h + self.res(x)


class ModularUNetT(nn.Module):
    def __init__(self, cin=2, cout=2, filters=FILTERS):
        super().__init__()
        f = filters
        self.down_blocks = nn.ModuleList(
            [BlockT(cin if i == 0 else f[i - 1], f[i]) for i in range(DEPTH)])
        self.down = nn.ModuleList(
            [BlurConvT(f[i], f[i]) for i in range(DEPTH - 1)])
        self.up = nn.ModuleList(
            [BlurConvTransposeT(f[i + 1], f[i + 1]) for i in range(DEPTH - 1)])
        self.up_blocks = nn.ModuleList(
            [BlockT(f[i + 1] + f[i], f[i]) for i in range(DEPTH - 1)])
        self.out = nn.Conv3d(f[0], cout, 3, padding=1)

    def forward(self, x):
        skips = []
        for i in range(DEPTH):
            x = self.down_blocks[i](x)
            if i != DEPTH - 1:
                skips.append(x)
                x = self.down[i](x)
        for i in reversed(range(DEPTH - 1)):
            x = self.up[i](x)
            x = self.up_blocks[i](torch.cat([x, skips[i]], 1))
        return torch.softmax(self.out(x), 1)


net = ModularUNetT()
topt = torch.optim.SGD(net.parameters(), lr=LR, momentum=MOMENTUM)
Xpt = torch.from_numpy(Xp)
ypt = torch.from_numpy(yp)
class_w = torch.tensor([1.0, 100.0])
t0 = time.time()
for it in range(ITERS):
    sl = slice(it * BATCH, (it + 1) * BATCH)
    topt.zero_grad()
    p = net(Xpt[sl])
    y = ypt[sl]
    eps = 1e-8
    overlap = (p * y).sum((2, 3, 4))
    total = (p * p).sum((2, 3, 4)) + (y * y).sum((2, 3, 4))
    dloss = (1 - 2 * overlap / (total + eps)).mean()
    logistic = (y * torch.log((p + eps) / (1 + eps))).mean((2, 3, 4)) * class_w
    lloss = -logistic.mean()
    (0.5 * dloss + 0.5 * lloss).backward()
    topt.step()
net.eval()
with torch.no_grad():
    pred_t = net(torch.from_numpy(Xva)).argmax(1).numpy()
torch_dice = dice(pred_t, Sva[:, 0])
print(f"torch:      val dice {torch_dice:.4f}  ({time.time() - t0:.0f}s)")
print(f"parity gap: {abs(ours_dice - torch_dice):.4f}")
