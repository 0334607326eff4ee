"""On-device morphology: connected components + binary dilation.

The device-side counterpart of native/ccl.cpp (SURVEY §2.3: "on-device CC
labeling (iterative label-propagation) ... host fallback acceptable for
offline eval").  Connected components run as iterative min-label propagation
under ``lax.while_loop`` — each sweep takes the minimum label over the
neighborhood, converging in O(component diameter) sweeps — entirely on the
TPU, so instance post-processing can stay fused with inference.  Labels are
component-unique but not compact; ``compact_labels`` renumbers on host when
1..N ids are needed (the exact host path remains native/ccl.cpp).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INF = jnp.int32(2 ** 30)


def _neighbor_min(labels: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    """Min over the 6- (connectivity 1) or 26- (connectivity 3) neighborhood,
    treating out-of-bounds as +inf. labels: (W, H, D) int32."""
    padded = jnp.pad(labels, 1, constant_values=_INF)
    W, H, D = labels.shape
    best = labels
    for dw in (-1, 0, 1):
        for dh in (-1, 0, 1):
            for dd in (-1, 0, 1):
                if dw == dh == dd == 0:
                    continue
                manhattan = abs(dw) + abs(dh) + abs(dd)
                if connectivity == 1 and manhattan > 1:
                    continue
                if connectivity == 2 and manhattan > 2:
                    continue
                shifted = lax.dynamic_slice(padded, (1 + dw, 1 + dh, 1 + dd),
                                            (W, H, D))
                best = jnp.minimum(best, shifted)
    return best


@partial(jax.jit, static_argnames=("connectivity", "max_iterations"))
def connected_components_device(mask: jnp.ndarray, connectivity: int = 3,
                                max_iterations: int = 256) -> jnp.ndarray:
    """Label a (W, H, D) boolean mask on device.

    Returns int32 labels: 0 for background, a component-unique positive id
    (the smallest flat voxel index in the component + 1) for foreground.
    Converges when no label changes, capped at ``max_iterations`` sweeps.
    """
    mask = jnp.asarray(mask) > 0
    W, H, D = mask.shape
    flat_ids = (jnp.arange(W * H * D, dtype=jnp.int32).reshape(W, H, D) + 1)
    labels = jnp.where(mask, flat_ids, _INF)

    def cond(state):
        labels, changed, it = state
        return jnp.logical_and(changed, it < max_iterations)

    def body(state):
        labels, _, it = state
        new = jnp.minimum(labels, _neighbor_min(labels, connectivity))
        new = jnp.where(mask, new, _INF)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return jnp.where(mask, labels, 0).astype(jnp.int32)


def compact_labels(device_labels) -> Tuple[np.ndarray, int]:
    """Renumber device CC output to 1..N by first occurrence (host)."""
    arr = np.asarray(device_labels)
    uniques, inverse = np.unique(arr, return_inverse=True)
    # uniques is sorted; background 0 first when present
    has_bg = uniques[0] == 0
    new_ids = np.arange(len(uniques), dtype=np.int32) + (0 if has_bg else 1)
    out = new_ids[inverse].reshape(arr.shape)
    return out, int(len(uniques) - (1 if has_bg else 0))


@partial(jax.jit, static_argnames=("connectivity", "iterations"))
def binary_dilation_device(mask: jnp.ndarray, connectivity: int = 1,
                           iterations: int = 1) -> jnp.ndarray:
    """Binary dilation of a (W, H, D) mask with the 6/18/26 structuring
    element, ``iterations`` times (device counterpart of the cross-footprint
    dilation used by post-processing)."""
    out = jnp.asarray(mask) > 0

    def body(_, m):
        grown = jnp.logical_not(
            _neighbor_min(jnp.where(m, jnp.int32(0), jnp.int32(1)), connectivity)
            .astype(bool))
        return jnp.logical_or(m, grown)

    return lax.fori_loop(0, iterations, body, out)
