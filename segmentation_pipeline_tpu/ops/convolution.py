"""3D convolution primitives (XLA path + Pallas dispatch point).

All model convs route through here so the backend can swap between
``lax.conv_general_dilated`` (XLA -> MXU) and the Pallas conv3d kernels in
ops/pallas_conv.py without touching model code.  Layout is channels-last
(N, W, H, D, C) with HWDIO kernels — the TPU-friendly layout (lane dim = C).

Replaces the reference's delegation to cuDNN via nn.Conv3d
(ref models/nested_residual_unet.py:13, SURVEY §2.3).
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")

# Backend flag: 'xla' (default) or 'pallas' for the hand-written MXU kernels.
_CONV_BACKEND = os.environ.get("SPT_CONV_BACKEND", "xla")


def set_conv_backend(name: str):
    global _CONV_BACKEND
    assert name in ("xla", "pallas")
    _CONV_BACKEND = name


def get_conv_backend() -> str:
    return _CONV_BACKEND


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(v)


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """x: (N, W, H, D, Cin); kernel: (kw, kh, kd, Cin, Cout).

    Explicit symmetric padding (torch Conv3d semantics — NOT XLA 'SAME',
    whose asymmetric pad placement differs for strided convs).
    """
    stride = _triple(stride)
    padding = _triple(padding)
    pad = [(p, p) for p in padding]
    if _CONV_BACKEND == "pallas":
        from .pallas_conv import pallas_conv3d

        out = pallas_conv3d(x, kernel, stride, padding)
        if out is not None:
            return out
    # bf16 inputs keep bf16 outputs (f32 preferred type breaks the conv
    # transpose rule under AD: f32 cotangent vs bf16 kernel); the MXU still
    # accumulates in f32 internally.
    preferred = preferred_dtype if x.dtype == jnp.float32 else None
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=stride,
        padding=pad,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred,
    )


def conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    stride: Union[int, Sequence[int]] = 2,
    padding: Union[int, Sequence[int]] = 0,
    output_padding: Union[int, Sequence[int]] = 0,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """torch ConvTranspose3d semantics: out = (in-1)*s - 2p + k + output_padding.

    kernel: (kw, kh, kd, Cin, Cout) — already in forward orientation; we
    implement the transpose as an input-dilated convolution with the
    spatially-flipped kernel, which is exactly torch's gradient convolution.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    output_padding = _triple(output_padding)
    k = kernel.shape[:3]
    flipped = jnp.flip(kernel, axis=(0, 1, 2))
    pad = [(kd - 1 - p, kd - 1 - p + op) for kd, p, op in zip(k, padding, output_padding)]
    preferred = preferred_dtype if x.dtype == jnp.float32 else None
    return lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1, 1),
        padding=pad,
        lhs_dilation=stride,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred,
    )


def avg_pool3d(x: jax.Array, window: int = 2, stride: int = 2,
               count_include_pad: bool = False) -> jax.Array:
    """AvgPool3d(k=2, s=2) over (N, W, H, D, C). VALID padding — matches the
    reference's usage on divisible shapes (nested_residual_unet.py:67)."""
    window_shape = (1, window, window, window, 1)
    strides = (1, stride, stride, stride, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, window_shape, strides, "VALID")
    return summed / float(window ** 3)


def upsample_trilinear2x(x: jax.Array, align_corners: bool = True) -> jax.Array:
    """Trilinear 2x upsample matching torch nn.Upsample(scale_factor=2,
    mode='trilinear', align_corners=True) (nested_residual_unet.py:68).

    Implemented as three per-axis interpolation matmuls — dense (out, in)
    interp matrices ride the MXU and fuse well under XLA.
    """
    n, w, h, d, c = x.shape
    for axis, size in ((1, w), (2, h), (3, d)):
        x = _interp_axis(x, axis, size * 2, align_corners)
    return x


def _interp_matrix(in_size: int, out_size: int, align_corners: bool, dtype) -> jax.Array:
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype=dtype)
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = jnp.clip((out_idx + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m = jnp.zeros((out_size, in_size), dtype=jnp.float32)
    m = m.at[jnp.arange(out_size), lo].add(1.0 - frac)
    m = m.at[jnp.arange(out_size), hi].add(frac)
    return m.astype(dtype)


def _interp_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    m = _interp_matrix(in_size, out_size, align_corners, x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.tensordot(x, m, axes=[[-1], [1]])  # (..., out)
    return jnp.moveaxis(x, -1, axis)


def resize_trilinear(x: jax.Array, out_spatial: Tuple[int, int, int],
                     align_corners: bool = True) -> jax.Array:
    """General trilinear resize over (N, W, H, D, C)."""
    for axis, size in zip((1, 2, 3), out_spatial):
        if x.shape[axis] != size:
            x = _interp_axis(x, axis, size, align_corners)
    return x


def upsample_trilinear2x_sharded(x: jax.Array, axis_name: str) -> jax.Array:
    """Trilinear 2x upsample (align_corners=True) with the W axis sharded
    over ``axis_name`` inside shard_map.

    H and D use the standard interpolation matmuls; W interpolation is
    global-index aware: align-corners source positions are computed from the
    global W size and gathered from a 1-voxel halo-extended local shard, so
    the result is exactly the unsharded upsample, W-sharded.
    x: (N, W_local, H, D, C).
    """
    from ..parallel.halo import halo_exchange

    n = lax.psum(1, axis_name)
    d = lax.axis_index(axis_name)
    w_loc = x.shape[1]
    w_in = n * w_loc
    w_out = 2 * w_in

    x_ext = halo_exchange(x, 1, axis_name, axis=1)  # (N, w_loc+2, H, D, C)

    g = jnp.arange(2 * w_loc, dtype=jnp.float32) + (d * 2 * w_loc).astype(jnp.float32)
    src = g * (w_in - 1) / (w_out - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, w_in - 1)
    frac = (src - lo.astype(jnp.float32)).astype(x.dtype)

    base = (d * w_loc).astype(jnp.int32)
    a = jnp.take(x_ext, lo - base + 1, axis=1)
    b = jnp.take(x_ext, hi - base + 1, axis=1)
    shape = (1, 2 * w_loc, 1, 1, 1)
    out = a * (1 - frac).reshape(shape) + b * frac.reshape(shape)

    # H, D axes are local: standard interpolation matmuls
    for axis in (2, 3):
        out = _interp_axis(out, axis, out.shape[axis] * 2, align_corners=True)
    return out
