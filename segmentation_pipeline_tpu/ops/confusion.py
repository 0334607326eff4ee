"""On-device confusion reduction for validation sweeps.

The host evaluator path (ref evaluators/segmentation_evaluator.py:74-90)
fetches the predicted ids volume and histograms it on host; this module
computes the same (L+1) x (L+1) joint histogram ON DEVICE so a
SegmentationEvaluator-only sweep fetches L^2 scalars instead of an ids
volume (VERDICT r2 #4).  Bucket layout matches native/confusion.c exactly:
row = target bucket, column = prediction bucket, bucket L = "any value not
in label_values".  Exact parity is asserted per sweep setup by the probe
machinery in training/device_confusion.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_buckets",))
def joint_histogram_device(target_idx: jnp.ndarray, pred_idx: jnp.ndarray,
                           n_buckets: int) -> jnp.ndarray:
    """Joint histogram of two already-bucketed index volumes.

    target_idx / pred_idx: integer arrays of identical shape with values in
    [0, n_buckets).  Returns (n_buckets, n_buckets) int32 with
    out[t, p] = |{voxels: target==t and pred==p}| — one scatter-add over the
    fused joint index, the device counterpart of the native C streaming pass.
    """
    flat = (target_idx.astype(jnp.int32).ravel() * n_buckets
            + pred_idx.astype(jnp.int32).ravel())
    return (jnp.zeros((n_buckets * n_buckets,), jnp.int32)
            .at[flat].add(1).reshape(n_buckets, n_buckets))


@partial(jax.jit, static_argnames=("n_buckets",))
def bucketed_joint_from_channel_ids(target_idx: jnp.ndarray,
                                    pred_channel_ids: jnp.ndarray,
                                    channel_maps: jnp.ndarray,
                                    n_buckets: int) -> jnp.ndarray:
    """Joint histogram where the prediction side is raw argmax CHANNEL ids
    (what the sliding window / device argmax produce) mapped into bucket
    space.  channel_maps is either a (C,) LUT (pure value remapping) or a
    full-shape (C, W, H, D) per-channel bucket tensor (position-dependent
    label inversions, e.g. masked remaps), built by probing the
    label-inverse machinery (training/device_confusion.py)."""
    ids = pred_channel_ids.astype(jnp.int32)
    if channel_maps.ndim == 1:
        pred_idx = jnp.take(channel_maps.astype(jnp.int32), ids)
    else:
        pred_idx = jnp.take_along_axis(channel_maps.astype(jnp.int32),
                                       ids[None], axis=0)[0]
    return joint_histogram_device(target_idx, pred_idx, n_buckets)


def value_lut(label_values: dict, vmax: int | None = None) -> np.ndarray:
    """LUT mapping raw label VALUES -> bucket index (bucket L = other),
    identical to the one confusion_stats feeds the native histogram."""
    values = [int(v) for v in label_values.values()]
    L = len(values)
    top = max(max(values, default=0), 0, int(vmax or 0))
    lut = np.full(top + 1, L, dtype=np.int32)
    for i, v in enumerate(values):
        if v >= 0:
            lut[v] = i
    return lut


def bucketize_values(ids: np.ndarray, lut: np.ndarray, n_buckets: int
                     ) -> np.ndarray:
    """Host-side: map a raw label-value volume into bucket space (values
    beyond the LUT -> bucket L).  uint8 when it fits (compact mirror)."""
    ids = np.asarray(ids)
    clipped = np.clip(ids, 0, len(lut) - 1)
    out = lut[clipped]
    out = np.where((ids < 0) | (ids >= len(lut)), n_buckets - 1, out)
    dtype = np.uint8 if n_buckets <= 256 else np.int32
    return out.astype(dtype)
