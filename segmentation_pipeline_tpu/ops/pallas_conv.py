"""Pallas TPU conv3d kernels (forward + custom-VJP backward).

Replaces the cuDNN conv3d the reference leans on (SURVEY §2.3) with a
hand-written MXU kernel for the dominant shape class in this framework:
kernel 3x3x3, stride 1, symmetric padding 1, channels-last.

Formulation: a 3^3 conv is 27 tap-shifted (M, Cin) @ (Cin, Cout) matmuls
accumulated in f32, M = H*D rows per output W-slice.  The grid runs over
(batch, W); overlapping receptive fields along W are fed as three adjacent
1-wide slabs of the padded input (block indices w, w+1, w+2), so each block
is expressible in plain blocked indexing and Pallas double-buffers the slab
DMAs.  The backward pass reuses the forward kernel: dX is the conv of the
cotangent with the flipped, transposed kernel; dW contracts tap-shifted
inputs with the cotangent (27 batched matmuls via lax.scan).

Other shapes (strides != 1, other kernel sizes) fall back to XLA's conv,
which is already MXU-tiled; ``pallas_conv3d`` returns None for those and the
dispatcher in ops/convolution.py keeps the XLA path.  Select with
SPT_CONV_BACKEND=pallas or ops.convolution.set_conv_backend('pallas').

Measured on TPU v5e (dmri_hippo shape, on-device fori_loop timing): this
kernel 7.7 TFLOP/s vs XLA 10.2 (f32) / 12.6 (bf16) — XLA stays the default.
Variants tried and rejected: hoisted D-slices (no change — Mosaic already
hoists); 9 D-preshifted slabs (VMEM OOM: lane padding 40->128 triples block
memory); D-taps packed into a K=3*Cin=120 contraction with XLA-side packing
(6.2 TFLOP/s: the 3x HBM/DMA traffic outweighs the MXU lane-utilization
win).  The bound at C=40 is MXU lane padding (K=N=40 of 128); the remaining
idea is channel-blocked model layouts (C a multiple of 128), which is a
model-architecture choice, not a kernel fix.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x0_ref, x1_ref, x2_ref, w_ref, out_ref, acc_ref):
    """One output W-slice: out (1, 1, H, D, Cout) from three padded input
    slabs (1, 1, H+2, D+2, Cin) at W offsets 0/1/2 and weights (27, Cin, Cout)."""
    H = out_ref.shape[2]
    D = out_ref.shape[3]
    cin = x0_ref.shape[4]
    cout = out_ref.shape[4]
    slabs = (x0_ref, x1_ref, x2_ref)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dw in range(3):
        slab = slabs[dw][0, 0]  # (H+2, D+2, Cin)
        for dh in range(3):
            for dd in range(3):
                tap = dw * 9 + dh * 3 + dd
                window = slab[dh:dh + H, dd:dd + D, :]
                rows = window.reshape(H * D, cin)
                acc_ref[:] += jnp.dot(rows, w_ref[tap],
                                      preferred_element_type=jnp.float32)
    out_ref[:] = acc_ref[:].reshape(1, 1, H, D, cout).astype(out_ref.dtype)


@jax.jit
def _pallas_conv3x3_s1p1(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x: (N, W, H, D, Cin) f32; kernel: (3, 3, 3, Cin, Cout)."""
    N, W, H, D, cin = x.shape
    cout = kernel.shape[-1]
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w_taps = kernel.reshape(27, cin, cout)

    slab = (1, 1, H + 2, D + 2, cin)
    grid = (N, W)
    return pl.pallas_call(
        _conv3x3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(slab, lambda n, w: (n, w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, lambda n, w: (n, w + 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(slab, lambda n, w: (n, w + 2, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, cin, cout), lambda n, w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, D, cout), lambda n, w: (n, w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W, H, D, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((H * D, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * W * H * D * 27 * cin * cout,
            bytes_accessed=x_pad.size * 4 + N * W * H * D * cout * 4,
            transcendentals=0,
        ),
    )(x_pad, x_pad, x_pad, w_taps)


@jax.custom_vjp
def pallas_conv3d_3x3_s1p1(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return _pallas_conv3x3_s1p1(x, kernel)


def _fwd(x, kernel):
    return _pallas_conv3x3_s1p1(x, kernel), (x, kernel)


def _vmem_fits(H: int, D: int, cin: int, cout: int) -> bool:
    """Same VMEM budget the forward dispatch enforces (slabs + accumulator +
    kernel); the backward dX conv swaps cin/cout so it must re-check."""
    vmem = 3 * (H + 2) * (D + 2) * cin * 4 * 2 + H * D * cout * 8 + 27 * cin * cout * 4
    return vmem <= 12 * 1024 * 1024


def _bwd(res, g):
    x, kernel = res
    # dX: conv of g with the spatially-flipped kernel, Cin/Cout swapped
    k_flip = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    if _vmem_fits(g.shape[2], g.shape[3], g.shape[-1], kernel.shape[3]):
        dx = _pallas_conv3x3_s1p1(g, k_flip)
    else:
        # transposed channel count blows the VMEM budget: XLA fallback for
        # this gradient (numerics identical)
        dx = lax.conv_general_dilated(
            g, k_flip, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
    # dW[tap] = x_window(tap)^T @ g over all voxels
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    N, W, H, D, cin = x.shape
    cout = g.shape[-1]
    g_rows = g.reshape(-1, cout)

    def tap_grad(_, tap):
        dw, rem = tap // 9, tap % 9
        dh, dd = rem // 3, rem % 3
        window = lax.dynamic_slice(x_pad, (0, dw, dh, dd, 0), (N, W, H, D, cin))
        rows = window.reshape(-1, cin)
        return None, jnp.dot(rows.T, g_rows, preferred_element_type=jnp.float32)

    _, dw_taps = lax.scan(tap_grad, None, jnp.arange(27))
    dkernel = dw_taps.reshape(3, 3, 3, cin, cout).astype(kernel.dtype)
    return dx.astype(x.dtype), dkernel


pallas_conv3d_3x3_s1p1.defvjp(_fwd, _bwd)


def pallas_conv3d(x, kernel, stride: Tuple[int, int, int],
                  padding: Tuple[int, int, int]) -> Optional[jax.Array]:
    """Dispatch entry: returns None when this kernel doesn't cover the shape
    (the caller then falls back to the XLA conv)."""
    if kernel.shape[:3] != (3, 3, 3):
        return None
    if tuple(stride) != (1, 1, 1) or tuple(padding) != (1, 1, 1):
        return None
    if x.dtype != jnp.float32:
        return None
    H, D = x.shape[2], x.shape[3]
    cin, cout = x.shape[4], kernel.shape[-1]
    if not _vmem_fits(H, D, cin, cout):
        return None
    return pallas_conv3d_3x3_s1p1(x, kernel)
