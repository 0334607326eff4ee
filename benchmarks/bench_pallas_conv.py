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

# benchmark at dmri_hippo scale.
# Methodology note (axon tunnel): repeated dispatches with identical args
# are memoized by the tunnel and block_until_ready can be a no-op, so the
# honest timing is ONE dispatch of an on-device fori_loop over K conv
# applications, seeded uniquely per call, forced with a scalar D2H fetch.
from jax import lax

gflops = 2 * 4 * 96 * 88 * 24 * 27 * 40 * 40 / 1e9
K = 50


def bench(conv_fn, dtype, label):
    @jax.jit
    def loop(seed):
        key = jax.random.PRNGKey(seed)
        xx = jax.random.normal(key, (4, 96, 88, 24, 40), jnp.float32).astype(dtype)
        kk = (jax.random.normal(key, (3, 3, 3, 40, 40), jnp.float32)
              * 0.02).astype(dtype)

        def body(i, x):
            y = conv_fn(x, kk)
            return y * jnp.asarray(0.02, x.dtype) + x * jnp.asarray(0.7, x.dtype)

        return lax.fori_loop(0, K, body, xx).sum()

    float(loop(0))  # compile + warm
    t0 = time.time(); float(loop(1)); t1 = time.time() - t0
    t0 = time.time(); float(loop(2)); t2 = time.time() - t0
    dt = min(t1, t2) / K
    print(f"{label}: {dt*1e3:.2f} ms/conv -> {gflops/dt/1e3:.1f} TFLOP/s")


bench(lambda a, b: conv3d(a, b, 1, 1), jnp.float32, "xla f32")
bench(lambda a, b: conv3d(a, b, 1, 1), jnp.bfloat16, "xla bf16")
bench(pallas_conv3d_3x3_s1p1, jnp.float32, "pallas f32")
