"""Bit-packed label-id transfer.

Hard segmentations need ceil(log2(C)) bits per voxel, but a uint8 fetch
ships 8.  Packing on device before the D2H copy cuts the transfer 8x for
binary masks (1 bit/voxel), 4x for <=4 classes and 2x for <=16 — decisive
on bandwidth-limited host links (this rig's tunnel moves ~25 MB/s, so a
240x240x176 binary prediction drops from ~0.4 s to ~0.05 s of pure
transfer).  The pack is a few elementwise shift/or ops fused by XLA; the
unpack is vectorized numpy on host.  Round trips are bit-exact.

No reference counterpart — the reference fetches full float probability
volumes (ref segmentation_pipeline/prediction.py:105-152); this is part of
the compact-transfer design around the same prediction API.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bits_for", "pack_ids", "unpack_ids", "fetch_ids"]


def bits_for(n_classes: int) -> int:
    """Bits per voxel needed for class ids 0..n_classes-1 (1, 2, 4 or 8)."""
    if n_classes <= 2:
        return 1
    if n_classes <= 4:
        return 2
    if n_classes <= 16:
        return 4
    return 8


@partial(jax.jit, static_argnames=("n_classes",))
def pack_ids(ids: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Pack integer class ids into a flat uint8 vector on device.

    ids: any-shape integer array with values in [0, n_classes).  Returns a
    1-D uint8 array of ceil(ids.size * bits / 8) bytes (little-endian bit
    fields within each byte).  With n_classes > 16 this is just a uint8
    cast — still half of an int16 fetch.
    """
    bits = bits_for(n_classes)
    flat = ids.astype(jnp.uint8).reshape(-1)
    if bits == 8:
        return flat
    per = 8 // bits
    pad = (-flat.shape[0]) % per
    if pad:
        flat = jnp.pad(flat, (0, pad))
    g = flat.reshape(-1, per)
    out = g[:, 0]
    for j in range(1, per):
        out = out | (g[:, j] << (bits * j))
    return out


def unpack_ids(packed: np.ndarray, n_classes: int, shape) -> np.ndarray:
    """Host-side inverse of pack_ids -> uint8 ids of the given shape."""
    packed = np.asarray(packed, dtype=np.uint8)
    bits = bits_for(n_classes)
    if bits == 8:
        return packed.reshape(shape)
    per = 8 // bits
    mask = np.uint8((1 << bits) - 1)
    cols = [(packed >> np.uint8(bits * j)) & mask for j in range(per)]
    flat = np.stack(cols, axis=1).reshape(-1)
    n = int(np.prod(shape))
    return flat[:n].reshape(shape)


def fetch_ids(ids_dev, n_classes: int) -> np.ndarray:
    """One packed D2H fetch of device label ids -> host uint8 ids array.

    The pack runs as its own tiny jitted program (cached per shape), the
    transfer moves bits_for(n_classes)/8 bytes per voxel, and the unpack is
    vectorized numpy — bit-identical to ``np.asarray(ids_dev)``.
    """
    shape = tuple(ids_dev.shape)
    packed = np.asarray(pack_ids(ids_dev, n_classes))
    return unpack_ids(packed, n_classes, shape)
