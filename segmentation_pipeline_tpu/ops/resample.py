"""Device-side volume resampling (affine-grid trilinear/nearest).

The batched TPU counterpart of the host scipy path in transforms/spatial.py
(SURVEY §2.3: ITK resampling -> XLA gather kernels): computes destination
voxel -> source voxel coordinates from the affines and samples with the
fused trilinear gather from ops/augment.py.  Used for on-device
resample-to-grid (e.g. mapping predictions back onto an original scanner
grid without leaving the device).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .augment import trilinear_sample


@partial(jax.jit, static_argnames=("dst_shape", "nearest"))
def _resample_jit(volume_cl: jnp.ndarray, matrix: jnp.ndarray, offset: jnp.ndarray,
                  dst_shape: Tuple[int, int, int], nearest: bool,
                  cval: float = 0.0) -> jnp.ndarray:
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in dst_shape],
                         indexing="ij")
    dst_idx = jnp.stack(grids)  # (3, W', H', D')
    src_idx = jnp.einsum("ij,jwhd->iwhd", matrix, dst_idx) + offset[:, None, None, None]
    out = trilinear_sample(volume_cl, src_idx, nearest=nearest)
    # constant fill outside the source grid (scipy mode='constant' parity —
    # transforms/spatial.py host path); edge-clamped samples would smear the
    # border across the out-of-FOV region
    src_shape = jnp.asarray(volume_cl.shape[:3], jnp.float32)
    inside = jnp.all((src_idx >= -0.5) &
                     (src_idx <= src_shape[:, None, None, None] - 0.5), axis=0)
    return jnp.where(inside[..., None], out, cval)


def resample_volume(
    data_cf,
    src_affine: np.ndarray,
    dst_affine: np.ndarray,
    dst_shape: Tuple[int, int, int],
    order: int = 1,
) -> jnp.ndarray:
    """Resample (C, W, H, D) data from the src grid onto the dst grid in
    world space on device. order: 0 nearest (labels) or 1 trilinear.
    Returns a (C, W', H', D') jax array.
    """
    M = np.linalg.inv(np.asarray(src_affine)) @ np.asarray(dst_affine)
    matrix = jnp.asarray(M[:3, :3], jnp.float32)
    offset = jnp.asarray(M[:3, 3], jnp.float32)
    volume_cl = jnp.moveaxis(jnp.asarray(data_cf, jnp.float32), 0, -1)
    out = _resample_jit(volume_cl, matrix, offset, tuple(int(s) for s in dst_shape),
                        order == 0)
    return jnp.moveaxis(out, -1, 0)
