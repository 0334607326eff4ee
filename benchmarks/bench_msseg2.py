"""MSSEG2-scale benchmarks on TPU: patch-train throughput + whole-volume
sliding-window inference latency."""
import time, numpy as np, jax, jax.numpy as jnp
from segmentation_pipeline_tpu.models import BlurConv3d, BlurConvTranspose3d, ModularUNet
from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
from segmentation_pipeline_tpu.training.model import SegModel, to_channels_last
from segmentation_pipeline_tpu.training.optimizers import SGD
from segmentation_pipeline_tpu.training.train_step import collate_to_device, create_train_state, make_train_step
from segmentation_pipeline_tpu.ops.sliding_window import sliding_window_inference

model = SegModel(ModularUNet(
    in_channels=2, out_channels=2, filters=[40, 40, 80, 80, 120, 120], depth=6,
    block_params={"residual": True},
    downsample_class=BlurConv3d,
    downsample_params={"kernel_size": 3, "stride": 2, "padding": 1},
    upsample_class=BlurConvTranspose3d,
    upsample_params={"kernel_size": 3, "stride": 2, "padding": 1, "output_padding": 0},
    remat=True))
criterion = HybridLogisticDiceLoss(logistic_class_weights=[1, 100])
opt = SGD(lr=0.001, momentum=0.95)

rng_np = np.random.default_rng(0)
X = rng_np.normal(size=(4, 2, 96, 96, 96)).astype(np.float32)
lab = (X[:, 0] > 0.5).astype(np.float32)
y = np.stack([1 - lab, lab], 1)
batch_cf = {"X": X, "y": y}
t0 = time.time()
state = create_train_state(model, opt, batch_cf)
print(f"init {time.time()-t0:.0f}s params={model.num_params:,}", flush=True)
step = make_train_step(model.module, criterion, opt)
batch = collate_to_device(batch_cf)
rng = jax.random.PRNGKey(0)
t0 = time.time()
state, ld, _ = step(state, batch, rng); jax.block_until_ready(ld["loss"])
print(f"train compile {time.time()-t0:.0f}s", flush=True)
t0 = time.time(); N = 10
for _ in range(N):
    rng, sub = jax.random.split(rng)
    state, ld, _ = step(state, batch, sub)
jax.block_until_ready(ld["loss"])
dt = time.time() - t0
print(f"msseg2 patch train: {N*4/dt:.2f} patches(96^3)/sec/chip", flush=True)
model.update_variables(state.params, state.batch_stats)

# whole-volume inference (240x240x176, 96^3 patches, overlap 12, batch 4)
vol = rng_np.normal(size=(2, 240, 240, 176)).astype(np.float32)
def model_fn(p_cl):
    return jnp.moveaxis(model(jnp.moveaxis(p_cl, -1, 1)), 1, -1)
t0 = time.time()
out = sliding_window_inference(vol, model_fn, patch_size=96, patch_overlap=12, patch_batch=4)
jax.block_until_ready(out)
print(f"whole-volume infer compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = sliding_window_inference(vol, model_fn, patch_size=96, patch_overlap=12, patch_batch=4)
jax.block_until_ready(out)
dt = time.time() - t0
print(f"whole-volume (240x240x176) sliding-window infer: {dt:.2f}s -> {60/dt:.1f} volumes/min", flush=True)
