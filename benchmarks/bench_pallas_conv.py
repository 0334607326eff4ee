"""Validate Pallas conv3d vs XLA on the real TPU + microbenchmark."""
import time, numpy as np, jax, jax.numpy as jnp
from segmentation_pipeline_tpu.ops.pallas_conv import pallas_conv3d_3x3_s1p1
from segmentation_pipeline_tpu.ops.convolution import conv3d

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(2, 32, 24, 16, 40)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(3, 3, 3, 40, 40)).astype(np.float32) * 0.1)

ref = conv3d(x, k, stride=1, padding=1)
out = pallas_conv3d_3x3_s1p1(x, k)
err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
print("fwd rel err:", err)

# gradient check
def loss_p(x, k): return (pallas_conv3d_3x3_s1p1(x, k) ** 2).sum()
def loss_x(x, k): return (conv3d(x, k, 1, 1) ** 2).sum()
gp = jax.grad(loss_p, argnums=(0, 1))(x, k)
gx = jax.grad(loss_x, argnums=(0, 1))(x, k)
for name, a, b in (("dx", gp[0], gx[0]), ("dk", gp[1], gx[1])):
    e = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
    print(f"{name} rel err:", e)

# benchmark at dmri_hippo scale
x = jnp.asarray(rng.normal(size=(4, 96, 88, 24, 40)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(3, 3, 3, 40, 40)).astype(np.float32) * 0.1)
fp = jax.jit(pallas_conv3d_3x3_s1p1)
fx = jax.jit(lambda x, k: conv3d(x, k, 1, 1))
for name, f in (("pallas", fp), ("xla", fx)):
    jax.block_until_ready(f(x, k))
    t0 = time.time(); N = 20
    for _ in range(N):
        out = f(x, k)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / N
    gflops = 2 * 4 * 96 * 88 * 24 * 27 * 40 * 40 / 1e9
    print(f"{name}: {dt*1e3:.2f} ms -> {gflops/dt/1e3:.1f} TFLOP/s")
