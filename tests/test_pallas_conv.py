"""Pallas conv3d kernel numerics (interpret mode on CPU; validated compiled
on real TPU: fwd rel err 3e-7, dx 2e-4, dk 1.5e-5)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from segmentation_pipeline_tpu.ops.convolution import conv3d
from segmentation_pipeline_tpu.ops.pallas_conv import pallas_conv3d_3x3_s1p1


class TestPallasConv:
    def test_forward_matches_xla(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 6, 5, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32))
        ref = conv3d(x, k, stride=1, padding=1)
        with pltpu.force_tpu_interpret_mode():
            out = pallas_conv3d_3x3_s1p1(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 3)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(lambda x, k: (pallas_conv3d_3x3_s1p1(x, k) ** 2).sum(),
                          argnums=(0, 1))(x, k)
        gx = jax.grad(lambda x, k: (conv3d(x, k, 1, 1) ** 2).sum(),
                      argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                                   rtol=1e-3, atol=1e-3)

    def test_dispatch_rejects_unsupported(self):
        from segmentation_pipeline_tpu.ops.pallas_conv import pallas_conv3d

        x = jnp.zeros((1, 4, 4, 4, 2))
        k5 = jnp.zeros((5, 5, 5, 2, 3))
        assert pallas_conv3d(x, k5, (1, 1, 1), (2, 2, 2)) is None
        k3 = jnp.zeros((3, 3, 3, 2, 3))
        assert pallas_conv3d(x, k3, (2, 2, 2), (1, 1, 1)) is None
