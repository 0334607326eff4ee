"""Fused on-device sliding-window inference.

TPU-native replacement for the reference's host-side
GridSampler -> DataLoader -> GridAggregator loop (ref prediction.py:131-147):
patch extraction via ``lax.dynamic_slice`` inside a ``lax.scan``, the model
applied per patch-batch, and overlap-add aggregation (average or Hann/
Gaussian-weighted) via ``lax.dynamic_update_slice`` accumulation — one XLA
program per (volume shape, patch config), no host round-trips between
patches.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def grid_locations(spatial_shape: Sequence[int], patch_size: Sequence[int],
                   overlap: Sequence[int]) -> np.ndarray:
    """Patch start locations covering the volume: stride = patch - overlap,
    last window snapped to the boundary (torchio GridSampler coverage)."""
    starts = []
    for size, patch, ov in zip(spatial_shape, patch_size, overlap):
        if patch > size:
            raise ValueError(f"Patch size {patch} exceeds volume size {size}")
        stride = patch - ov
        if stride <= 0:
            raise ValueError(f"Overlap {ov} must be smaller than patch {patch}")
        axis_starts = list(range(0, size - patch + 1, stride))
        if axis_starts[-1] != size - patch:
            axis_starts.append(size - patch)
        starts.append(axis_starts)
    grid = np.stack(np.meshgrid(*starts, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid.astype(np.int32)


def hann_window(patch_size: Sequence[int]) -> np.ndarray:
    """Separable raised-cosine weight window (smooth overlap blending)."""
    ws = []
    for p in patch_size:
        w = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(p) + 0.5) / p)
        ws.append(w.astype(np.float32))
    return ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]


def _pad_locations(locations: np.ndarray, batch: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the location list to a multiple of ``batch`` by repeating the last
    location. Returns (padded_locations, validity): padded entries carry
    validity 0 and must contribute ZERO weight — a duplicated patch would
    otherwise be over-weighted relative to other patches in overlap regions.
    """
    n = locations.shape[0]
    rem = (-n) % batch
    validity = np.ones(n + rem, np.float32)
    if rem:
        locations = np.concatenate([locations, np.repeat(locations[-1:], rem, 0)], 0)
        validity[n:] = 0.0
    return locations, validity


@partial(jax.jit, static_argnames=("model_fn", "patch_size", "patch_batch", "mode",
                                   "out_channels", "output_labels"))
def _sliding_window_jit(volume: jnp.ndarray, locations: jnp.ndarray,
                        validity: jnp.ndarray, model_args, model_fn,
                        patch_size: Tuple[int, int, int],
                        patch_batch: int, mode: str, out_channels: int,
                        output_labels: bool = False):
    """volume: (W, H, D, C). locations: (L, 3) padded to patch_batch multiple;
    validity: (L,) 1/0 weight gate for padded duplicate locations.

    model_fn is a STATIC argument keyed into the jit cache — callers must
    reuse the same function object across calls (see sliding_window_inference)
    — while ``model_args`` (e.g. network variables) are traced, so weight
    updates don't require recompilation and never go stale."""
    W, H, D, _ = volume.shape
    pw, ph, pd = patch_size

    acc = jnp.zeros((W, H, D, out_channels), jnp.float32)
    div = jnp.zeros((W, H, D, 1), jnp.float32)

    if mode == "hann":
        weight = jnp.asarray(hann_window(patch_size))[..., None]
    else:
        weight = jnp.ones((pw, ph, pd, 1), jnp.float32)

    locs = locations.reshape(-1, patch_batch, 3)
    valid = validity.reshape(-1, patch_batch)

    def body(carry, inputs):
        loc_batch, valid_batch = inputs
        acc, div = carry
        patches = jax.vmap(
            lambda loc: lax.dynamic_slice(
                volume, (loc[0], loc[1], loc[2], 0), (pw, ph, pd, volume.shape[3]))
        )(loc_batch)
        preds = model_fn(patches, *model_args)  # (B, pw, ph, pd, out_channels)

        def scatter(carry, args):
            acc, div = carry
            loc, pred, v = args
            w = weight * v
            start = (loc[0], loc[1], loc[2], 0)
            cur = lax.dynamic_slice(acc, start, (pw, ph, pd, out_channels))
            acc = lax.dynamic_update_slice(acc, cur + pred * w, start)
            curd = lax.dynamic_slice(div, start, (pw, ph, pd, 1))
            div = lax.dynamic_update_slice(div, curd + w, start)
            return (acc, div), None

        (acc, div), _ = lax.scan(scatter, (acc, div),
                                 (loc_batch, preds, valid_batch))
        return (acc, div), None

    (acc, div), _ = lax.scan(body, (acc, div), (locs, valid))
    out = acc / jnp.maximum(div, 1e-8)
    if output_labels:
        # argmax on device: D2H shrinks from C x f32 to one small-int channel
        # (argmax is invariant to the positive per-voxel normalization, but
        # the division must stay — overlap-averaging mixes patches first)
        idx_dtype = jnp.uint8 if out_channels <= 255 else jnp.int32
        return jnp.argmax(out, axis=-1).astype(idx_dtype)
    return out


def sliding_window_inference(
    volume_cf: jnp.ndarray,
    model_fn: Callable[..., jnp.ndarray],
    patch_size,
    patch_overlap=(0, 0, 0),
    patch_batch: int = 8,
    mode: str = "average",
    out_channels: int = None,
    model_args=(),
    output_labels: bool = False,
    transfer_dtype=None,
) -> jnp.ndarray:
    """volume_cf: (C, W, H, D) single volume; model_fn maps channels-last
    patch batches (B, pw, ph, pd, C) [, *model_args] -> (B, pw, ph, pd, C_out).
    Returns (C_out, W, H, D) aggregated prediction. ``mode``: 'average'
    (uniform overlap-add, tio default) or 'hann'.

    ``output_labels=True`` argmaxes on device and returns (W, H, D) label ids
    (uint8/int32) — the host-transfer-lean path for inference/eval consumers
    that only need the hard segmentation. ``transfer_dtype`` (e.g. bfloat16)
    casts the volume on host before upload, halving H2D bytes; use it when
    the model computes in that dtype anyway (SegModel compute_dtype).

    model_fn is a static jit key: reuse the SAME function object across calls
    to avoid recompiles, and pass anything that changes between calls
    (network variables) via ``model_args`` so it is traced, not baked in.
    """
    if isinstance(patch_size, int):
        patch_size = (patch_size,) * 3
    if isinstance(patch_overlap, int):
        patch_overlap = (patch_overlap,) * 3
    patch_size = tuple(int(p) for p in patch_size)

    if isinstance(volume_cf, jax.Array):
        # already device-resident (PatchPredict cache_inputs): never round
        # trip through the host; cast (usually a no-op) and transpose on device
        in_dtype = jnp.dtype(transfer_dtype) if transfer_dtype is not None \
            else jnp.float32
        volume = jnp.moveaxis(volume_cf.astype(in_dtype), 0, -1)
    elif transfer_dtype is None:
        in_dtype = jnp.float32
        volume = jnp.moveaxis(jnp.asarray(volume_cf, jnp.float32), 0, -1)
    else:
        # cast on host so the upload itself shrinks
        in_dtype = jnp.dtype(transfer_dtype)
        volume = jnp.moveaxis(jnp.asarray(np.asarray(volume_cf).astype(in_dtype)), 0, -1)
    spatial = volume.shape[:3]
    locations = grid_locations(spatial, patch_size, patch_overlap)
    locations, validity = _pad_locations(locations, patch_batch)

    if out_channels is None:
        probe = jax.eval_shape(
            model_fn, jax.ShapeDtypeStruct((patch_batch, *patch_size, volume.shape[3]),
                                           in_dtype), *model_args)
        out_channels = probe.shape[-1]

    out = _sliding_window_jit(volume, jnp.asarray(locations), jnp.asarray(validity),
                              tuple(model_args), model_fn, patch_size, patch_batch,
                              mode, out_channels, output_labels)
    if output_labels:
        return out
    return jnp.moveaxis(out, -1, 0)
