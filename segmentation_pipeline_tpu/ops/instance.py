"""On-device instance-overlap reduction for validation sweeps.

The host instance path (ref evaluators/instance_segmentation_evaluator.py:
10-175 — CC-label both masks, 2-D bincount their overlap, run the msseg
detection test on the small histogram) fetches a full ids volume per subject
just to label it on host.  Every input the detection test needs is the
(N+1, M+1) overlap histogram — tiny — so this module computes it ON DEVICE:

1. ``connected_components_device`` labels each mask (labels = min flat voxel
   index + 1 per component, 0 background — ops/morphology.py).
2. The labels are compacted on device with a fixed-capacity
   ``jnp.unique(size=K)`` + ``searchsorted`` (static shapes for XLA; K is the
   component budget).  Background compacts to bucket 0 and components to
   buckets 1..N in ascending min-flat-index order — exactly the host's
   first-occurrence numbering (np.unique/scan order agree on C-order
   volumes), so the histogram MATRIX matches the host chain entry for entry,
   not just its marginals.
3. ``joint_histogram_device`` (ops/confusion.py) bincounts the pair volume.

A sweep then fetches (K+1)^2 int32 counts + 2(K+1) unique ids per subject
(~260 KB at the default K=255) instead of a multi-MB ids volume — on this
rig's ~25 MB/s tunnel that is the difference between ~10 ms and seconds per
subject.  Component overflow (more than K components in a mask) is detected
host-side from the fetched unique arrays and falls back to the host path;
correctness is additionally PROVEN per run by the probe machinery in
training/device_confusion.py (exact histogram comparison on the first
eligible sweep).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .confusion import joint_histogram_device
from .morphology import connected_components_device

#: sentinel greater than any real component label (labels are flat voxel
#: indices + 1 <= W*H*D < 2^30 for any volume that fits in HBM)
_FILL = jnp.int32(2 ** 30)


@partial(jax.jit, static_argnames=("capacity",))
def compact_labels_device(labels: jnp.ndarray, capacity: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Renumber CC labels to dense buckets on device, fixed capacity.

    labels: (W, H, D) int32 from connected_components_device (0 background,
    positive component-unique ids).  Returns ``(idx, uniq)`` where ``uniq``
    is the sorted (capacity + 1,) unique-label vector (0 first, then
    component ids ascending, padded with _FILL) and ``idx`` maps each voxel
    to its position in ``uniq`` — bucket 0 = background, buckets 1..N =
    components in first-occurrence order.  If the mask has MORE than
    ``capacity`` components jnp.unique truncates silently; callers must
    check ``uniq`` host-side (see ``component_count``) and fall back.
    """
    flat = labels.ravel()
    # force 0 into the unique set so background always occupies bucket 0,
    # even for an all-foreground mask
    with_bg = jnp.concatenate([jnp.zeros((1,), jnp.int32), flat])
    uniq = jnp.unique(with_bg, size=capacity + 1, fill_value=_FILL)
    idx = jnp.searchsorted(uniq, flat).reshape(labels.shape)
    # a truncated unique drops the LARGEST labels; searchsorted would send
    # them to the last bucket — harmless for counts because overflow is
    # detected and the result discarded, but clip anyway so the histogram
    # stays in range
    idx = jnp.minimum(idx, capacity).astype(jnp.int32)
    return idx, uniq


def component_count(uniq: np.ndarray) -> Tuple[int, bool]:
    """(number of components, overflowed?) from a fetched unique vector.

    Overflow means the capacity was exhausted — there may be MORE components
    than capacity (jnp.unique truncates silently), so the histogram cannot
    be trusted and the caller must use the host path."""
    uniq = np.asarray(uniq)
    n_finite = int((uniq < int(_FILL)).sum())
    n = n_finite - 1  # bucket 0 is the forced background
    return n, n_finite == len(uniq)


@partial(jax.jit, static_argnames=("capacity", "connectivity"))
def overlap_histogram_device(target_mask: jnp.ndarray, pred_mask: jnp.ndarray,
                             capacity: int = 255, connectivity: int = 2):
    """Device counterpart of instance_segmentation_evaluator.overlap_histogram
    (ref instance_segmentation_evaluator.py:29-35) including the CC labeling.

    target_mask / pred_mask: (W, H, D) boolean.  Returns
    ``(hist, t_uniq, p_uniq)``: hist is (capacity+1, capacity+1) int32 with
    hist[i, j] = |target component i ∩ predicted component j| (0 =
    background), rows/columns beyond the true component counts are zero;
    t_uniq / p_uniq are the compaction vectors for ``component_count``.
    """
    t_lab = connected_components_device(target_mask, connectivity=connectivity)
    p_lab = connected_components_device(pred_mask, connectivity=connectivity)
    t_idx, t_uniq = compact_labels_device(t_lab, capacity)
    p_idx, p_uniq = compact_labels_device(p_lab, capacity)
    hist = joint_histogram_device(t_idx, p_idx, capacity + 1)
    return hist, t_uniq, p_uniq


@partial(jax.jit, static_argnames=("capacity", "connectivity"))
def instance_hist_from_channel_ids(target_fg: jnp.ndarray,
                                   pred_channel_ids: jnp.ndarray,
                                   fg_maps: jnp.ndarray,
                                   capacity: int = 255,
                                   connectivity: int = 2):
    """``overlap_histogram_device`` where the prediction side is raw argmax
    CHANNEL ids mapped to eval-space foreground through per-channel boolean
    maps — fg_maps[c, w, h, d] = "does an argmax of channel c at this voxel
    invert to a positive eval label?", built by the same label-inverse probe
    machinery as the confusion reduction (training/device_confusion.py)."""
    ids = pred_channel_ids.astype(jnp.int32)
    pred_fg = jnp.take_along_axis(fg_maps.astype(jnp.bool_), ids[None],
                                  axis=0)[0]
    return overlap_histogram_device(target_fg, pred_fg, capacity,
                                    connectivity)
