"""Spatially-sharded whole-network forward (no patching).

The strongest form of the CP analog (SURVEY §2.4): the volume's W axis is
sharded across the mesh and stays sharded through the ENTIRE network — every
conv halo-exchanges its 1-voxel receptive-field margin, pooling stays local
(shard boundaries align with even indices), and the align-corners trilinear
upsample gathers with global index arithmetic.  No device ever materializes
the full volume or any full feature map, so whole-volume inference scales to
volumes far beyond one chip's HBM with zero patch-boundary artifacts.

Supported: models whose convs are 3^3/s1/p1 with AvgPool-2 down and
trilinear-2x up (NestedResUNet).  Requires W divisible by
mesh_size * 2^levels (8 for NestedResUNet's three pooling levels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def spatial_sharded_inference(model, volume_cf, mesh: Mesh,
                              axis_name: str = "data") -> jnp.ndarray:
    """Run a SegModel's forward on a W-sharded volume.

    model: SegModel wrapping a module with a ``spatial_shard_axis`` field
    (NestedResUNet). volume_cf: (C, W, H, D) single volume. Returns
    (C_out, W, H, D), numerically identical to the unsharded forward.
    """
    n_dev = mesh.shape[axis_name]
    volume_cl = jnp.moveaxis(jnp.asarray(volume_cf, jnp.float32), 0, -1)[None]
    W = volume_cl.shape[1]
    if W % (n_dev * 8) != 0:
        raise ValueError(
            f"W={W} must be divisible by mesh_size*8 = {n_dev * 8} "
            f"(shard-aligned pooling at three levels)")

    if model.variables is None:
        # init from a small divisibility-respecting dummy — conv params are
        # shape-independent, and tracing init over the full volume would
        # allocate full-size feature maps on ONE device, defeating the
        # beyond-HBM purpose of this path
        levels = getattr(model.module, "pooling_levels", 3)
        s = 2 ** levels
        cin = volume_cl.shape[-1]
        model.ensure_initialized(np.zeros((1, cin, 2 * s, 2 * s, s), np.float32))
    sharded_module = model.module.clone(spatial_shard_axis=axis_name)
    variables = model.variables

    def forward(variables, x):
        return sharded_module.apply(variables, x, train=False)

    fn = shard_map(forward, mesh=mesh,
                   in_specs=(P(), P(None, axis_name)),
                   out_specs=P(None, axis_name))
    out = jax.jit(fn)(variables, volume_cl)
    return jnp.moveaxis(out[0], -1, 0)
