"""Spatial sharding: halo exchange + distributed whole-volume inference.

The 3D-segmentation counterpart of sequence/context parallelism (SURVEY §2.4):
volumes too large for one chip are sharded spatially across the mesh.  Two
mechanisms:

- ``halo_exchange`` / ``sharded_conv3d``: shard the W axis across devices and
  exchange conv receptive-field halos with ``lax.ppermute`` — the building
  block for running stencils directly on sharded volumes.
- ``distributed_sliding_window``: shard the sliding-window *patch grid*
  across devices (patches are independent), each device overlap-adds its
  share into a local accumulator, and a single ``psum`` merges them — this
  replaces the reference's host-side GridSampler loop (prediction.py:131-147)
  with one SPMD XLA program over the mesh.
- ``sharded_volume_sliding_window``: the volume itself is W-sharded (never
  replicated) — halo reads + neighbor margin-add writes — so volumes larger
  than one chip's HBM are processable.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.sliding_window import grid_locations, hann_window


def halo_exchange(x: jax.Array, halo: int, axis_name: str,
                  axis: int = 0) -> jax.Array:
    """Inside shard_map: x is the local shard with ``axis`` sharded; returns
    x widened by ``halo`` rows of neighbor data on each side of that axis
    (zero-padded at the global ends).

    Left neighbor's last ``halo`` rows are prepended; right neighbor's first
    ``halo`` rows appended — one bidirectional ppermute pair over ICI.
    """
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    x_m = jnp.moveaxis(x, axis, 0)
    send_right = x_m[-halo:]
    send_left = x_m[:halo]
    from_left = lax.ppermute(send_right, axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    from_right = lax.ppermute(send_left, axis_name,
                              [(i + 1, i) for i in range(n - 1)])
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    out = jnp.concatenate([from_left, x_m, from_right], axis=0)
    return jnp.moveaxis(out, 0, axis)


def sharded_conv3d(x: jax.Array, kernel: jax.Array, mesh: Mesh,
                   axis_name: str = "data") -> jax.Array:
    """3^3/s1/p1 conv over a volume whose W axis is sharded across the mesh:
    halo exchange + local conv, numerically identical to the unsharded conv.

    x: (W, H, D, Cin) global; returns (W, H, D, Cout) with the same sharding.
    """
    from ..ops.convolution import DIMENSION_NUMBERS

    def local_conv(x_local, kernel):
        x_halo = halo_exchange(x_local, 1, axis_name)
        x_b = x_halo[None]
        out = lax.conv_general_dilated(
            x_b, kernel, window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=jnp.float32)
        return out[0]

    fn = shard_map(local_conv, mesh=mesh,
                   in_specs=(P(axis_name), P()),
                   out_specs=P(axis_name))
    return fn(x, kernel)


import functools


@functools.lru_cache(maxsize=64)
def _distributed_window_program(model_fn, patch_size, mode, out_channels,
                                mesh, axis_name, patch_batch):
    """Build (once per static config) the jitted patch-grid-sharded
    sliding-window program; jax's own shape-keyed jit cache then makes
    repeated calls free.  model_fn must be a stable function object;
    per-call values (network variables) ride in the traced ``model_args``.
    ``patch_batch`` patches run through the model per step (MXU batching),
    exactly like the single-device ops/sliding_window.py program."""
    pw, ph, pd = patch_size

    def local_work(volume, locs, valid, model_args):
        W, H, D = volume.shape[:3]
        if mode == "hann":
            weight = jnp.asarray(hann_window(patch_size))[..., None]
        else:
            weight = jnp.ones((pw, ph, pd, 1), jnp.float32)
        acc = jnp.zeros((W, H, D, out_channels), jnp.float32)
        div = jnp.zeros((W, H, D, 1), jnp.float32)
        # mark as device-varying so the scan carry type matches the body
        # output (locs differ per device)
        acc = lax.pcast(acc, (axis_name,), to="varying")
        div = lax.pcast(div, (axis_name,), to="varying")
        locs_b = locs.reshape(-1, patch_batch, 3)
        valid_b = valid.reshape(-1, patch_batch)

        def body(carry, inputs):
            loc_batch, valid_batch = inputs
            acc, div = carry
            patches = jax.vmap(
                lambda loc: lax.dynamic_slice(
                    volume, (loc[0], loc[1], loc[2], 0),
                    (pw, ph, pd, volume.shape[3])))(loc_batch)
            preds = model_fn(patches, *model_args)

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

        (acc, div), _ = lax.scan(body, (acc, div), (locs_b, valid_b))
        acc = lax.psum(acc, axis_name)
        div = lax.psum(div, axis_name)
        return acc / jnp.maximum(div, 1e-8)

    fn = shard_map(local_work, mesh=mesh,
                   in_specs=(P(), P(axis_name), P(axis_name), P()),
                   out_specs=P())
    return jax.jit(fn)


def distributed_sliding_window(
    volume_cf: jax.Array,
    model_fn: Callable[..., jax.Array],
    patch_size,
    patch_overlap=(0, 0, 0),
    patch_batch: int = 1,
    mode: str = "average",
    mesh: Mesh = None,
    axis_name: str = "data",
    out_channels: int = None,
    model_args=(),
) -> jax.Array:
    """Whole-volume sliding-window inference with the patch grid sharded
    across the mesh. volume_cf: (C, W, H, D); model_fn maps channels-last
    patch batches [, *model_args]. Returns (C_out, W, H, D).

    The compiled program is cached per (model_fn, patch config, mesh):
    reuse the same model_fn object across calls and pass network variables
    via ``model_args`` so weight updates don't recompile or go stale.
    """
    if isinstance(patch_size, int):
        patch_size = (patch_size,) * 3
    if isinstance(patch_overlap, int):
        patch_overlap = (patch_overlap,) * 3
    patch_size = tuple(int(p) for p in patch_size)

    volume = jnp.moveaxis(jnp.asarray(volume_cf, jnp.float32), 0, -1)
    spatial = volume.shape[:3]
    locations = grid_locations(spatial, patch_size, patch_overlap)

    n_dev = mesh.shape[axis_name]
    patch_batch = max(1, int(patch_batch))
    # pad the location list so every device gets the same count, a multiple
    # of patch_batch; padded entries carry validity 0 so they contribute
    # zero weight (a duplicated patch would otherwise be over-weighted in
    # overlap regions)
    chunk = n_dev * patch_batch
    total = -(-len(locations) // chunk) * chunk
    n_real = len(locations)
    reps = np.concatenate([locations,
                           np.repeat(locations[-1:], total - n_real, 0)])
    locations_sharded = reps.reshape(total, 3).astype(np.int32)
    validity = np.ones(total, np.float32)
    validity[n_real:] = 0.0

    if out_channels is None:
        probe = jax.eval_shape(model_fn, jax.ShapeDtypeStruct(
            (patch_batch, *patch_size, volume.shape[3]), jnp.float32), *model_args)
        out_channels = probe.shape[-1]

    fn = _distributed_window_program(model_fn, patch_size, mode,
                                     int(out_channels), mesh, axis_name,
                                     patch_batch)
    out = fn(volume, jnp.asarray(locations_sharded), jnp.asarray(validity),
             tuple(model_args))
    return jnp.moveaxis(out, -1, 0)


@functools.lru_cache(maxsize=64)
def _sharded_volume_window_program(model_fn, patch_size, mode, out_channels,
                                   mesh, axis_name):
    """Jitted W-sharded sliding-window program, cached per static config
    (same contract as _distributed_window_program)."""
    pw, ph, pd = patch_size

    def local_work(vol_local, locs, valid, model_args):
        w_loc, H, D, C = vol_local.shape
        if mode == "hann":
            weight = jnp.asarray(hann_window(patch_size))[..., None]
        else:
            weight = jnp.ones((pw, ph, pd, 1), jnp.float32)
        # vol_local: (w_loc, H, D, C) shard; widen by pw on each side
        vol_ext = halo_exchange(vol_local, pw, axis_name)  # (w_loc+2pw, ...)
        locs = locs[0]
        valid = valid[0]

        acc = jnp.zeros((w_loc + 2 * pw, H, D, out_channels), jnp.float32)
        div = jnp.zeros((w_loc + 2 * pw, H, D, 1), jnp.float32)
        acc = lax.pcast(acc, (axis_name,), to="varying")
        div = lax.pcast(div, (axis_name,), to="varying")

        def body(carry, inputs):
            loc, v = inputs
            acc, div = carry
            patch = lax.dynamic_slice(vol_ext, (loc[0], loc[1], loc[2], 0),
                                      (pw, ph, pd, C))
            pred = model_fn(patch[None], *model_args)[0]
            w = weight * v
            start = (loc[0], loc[1], loc[2], 0)
            cur = lax.dynamic_slice(acc, start, (pw, ph, pd, out_channels))
            acc = lax.dynamic_update_slice(acc, cur + pred * w, start)
            curd = lax.dynamic_slice(div, start, (pw, ph, pd, 1))
            div = lax.dynamic_update_slice(div, curd + w, start)
            return (acc, div), None

        (acc, div), _ = lax.scan(body, (acc, div), (locs, valid))

        # write-margin exchange: patches are owned by the device containing
        # their start row, so local writes span ext rows [pw, w_loc + 2pw) —
        # only the RIGHT margin can hold spill (our right margin belongs to
        # the right neighbor's interior head). Rows [0, pw) are provably
        # never written, so no backward exchange is needed.
        n = lax.psum(1, axis_name)
        fwd = [(i, i + 1) for i in range(n - 1)]

        # right margin -> right neighbor's head rows [pw, 2pw)
        acc_from_left = lax.ppermute(acc[-pw:], axis_name, fwd)
        div_from_left = lax.ppermute(div[-pw:], axis_name, fwd)
        acc = acc.at[pw:2 * pw].add(acc_from_left)
        div = div.at[pw:2 * pw].add(div_from_left)

        interior_acc = acc[pw:w_loc + pw]
        interior_div = div[pw:w_loc + pw]
        return interior_acc / jnp.maximum(interior_div, 1e-8)

    fn = shard_map(local_work, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
                   out_specs=P(axis_name))
    return jax.jit(fn)


def sharded_volume_sliding_window(
    volume_cf: jax.Array,
    model_fn: Callable[..., jax.Array],
    patch_size,
    patch_overlap=(0, 0, 0),
    mode: str = "average",
    mesh: Mesh = None,
    axis_name: str = "data",
    out_channels: int = None,
    model_args=(),
) -> jax.Array:
    """Sliding-window inference with the volume itself W-sharded across the
    mesh — no device ever holds the full volume, so volumes larger than one
    chip's HBM become processable (the spatial-sharding counterpart of
    ``distributed_sliding_window``, which replicates the volume).

    Mechanics: a ppermute halo exchange widens each local W-shard by one
    patch width for reads; every patch is owned by the device containing its
    start row and overlap-adds into a local accumulator with one patch width
    of write margin on each side; margins are ppermute'd to the neighbors and
    added; the final division happens on the shard.  Exact vs the unsharded
    path (validity-gated padding, same weights).

    Requires W divisible by the mesh size and local W >= patch width.
    volume_cf: (C, W, H, D). Returns (C_out, W, H, D).
    """
    if isinstance(patch_size, int):
        patch_size = (patch_size,) * 3
    if isinstance(patch_overlap, int):
        patch_overlap = (patch_overlap,) * 3
    pw, ph, pd = (int(p) for p in patch_size)

    volume = jnp.moveaxis(jnp.asarray(volume_cf, jnp.float32), 0, -1)
    W, H, D, C = volume.shape
    n_dev = mesh.shape[axis_name]
    if W % n_dev != 0:
        raise ValueError(f"W={W} must divide evenly over {n_dev} devices")
    w_loc = W // n_dev
    if w_loc < pw:
        raise ValueError(f"local W {w_loc} must be >= patch width {pw}")

    locations = grid_locations((W, H, D), (pw, ph, pd), patch_overlap)
    # assign each patch to the device owning its start row; store the W
    # coordinate relative to the device's halo-extended local block
    per_dev_locs = [[] for _ in range(n_dev)]
    for g_w, g_h, g_d in locations:
        d = min(int(g_w) // w_loc, n_dev - 1)
        per_dev_locs[d].append((int(g_w) - d * w_loc + pw, int(g_h), int(g_d)))
    max_count = max(len(l) for l in per_dev_locs)
    locs = np.zeros((n_dev, max_count, 3), np.int32)
    valid = np.zeros((n_dev, max_count), np.float32)
    for d, lst in enumerate(per_dev_locs):
        for i, loc in enumerate(lst):
            locs[d, i] = loc
            valid[d, i] = 1.0

    if out_channels is None:
        probe = jax.eval_shape(model_fn, jax.ShapeDtypeStruct(
            (1, pw, ph, pd, C), jnp.float32), *model_args)
        out_channels = probe.shape[-1]

    fn = _sharded_volume_window_program(model_fn, (pw, ph, pd), mode,
                                        int(out_channels), mesh, axis_name)
    out = fn(volume, jnp.asarray(locs), jnp.asarray(valid),
             tuple(model_args))
    return jnp.moveaxis(out, -1, 0)
