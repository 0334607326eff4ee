"""Device mesh + sharding helpers.

The reference has no distributed machinery at all (SURVEY §2.4); this module
is the TPU-native layer that replaces "the NCCL layer": a named mesh with a
'data' axis (DP over i.i.d. patches/volumes) and an optional 'model' axis
reserved for spatial sharding of whole-volume inference (halo exchange in
parallel/halo.py).  All collectives are XLA's, inserted by GSPMD from the
shardings declared here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class MeshRecipe:
    """Picklable stand-in for a jax Mesh: device handles are process-local,
    so checkpoints (training/context.py) and pickled predictors store the
    (axis_names, shape) recipe and rebuild over this process's
    jax.devices() on restore."""

    def __init__(self, axis_names, shape):
        self.axis_names = tuple(axis_names)
        self.shape = tuple(shape)

    @classmethod
    def of(cls, mesh: Mesh) -> "MeshRecipe":
        return cls(mesh.axis_names, mesh.devices.shape)

    def build(self) -> Mesh:
        n = int(np.prod(self.shape))
        devices = jax.devices()
        if len(devices) < n:
            raise RuntimeError(
                f"Checkpoint mesh {dict(zip(self.axis_names, self.shape))} "
                f"needs {n} devices but only {len(devices)} are available")
        return Mesh(np.asarray(devices[:n]).reshape(self.shape),
                    self.axis_names)


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first n devices. Default: 1-D 'data' mesh over
    all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh], axis: str = "data") -> dict:
    """Place a dict of host arrays onto the mesh, batch-sharded. Without a
    mesh this is a plain device_put."""
    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    sharding = batch_sharding(mesh, axis)
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}


def pad_batch_to_devices(batch: dict, n_devices: int):
    """Pad the batch dim up to a multiple of the mesh size (XLA needs even
    shards); returns (padded_batch, real_batch_size)."""
    import numpy as np

    sizes = {v.shape[0] for v in batch.values()}
    assert len(sizes) == 1, f"Inconsistent batch sizes {sizes}"
    n = sizes.pop()
    rem = (-n) % n_devices
    if rem == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad_width = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(np.asarray(v), pad_width)
    return out, n
