"""Connected-component label cleanup applied after inference.

Behavioral parity with ref post_processing.py:5-73: keep the N largest
components while iteratively dilating survivors into removed voxels (so no
holes appear), fill small holes with dilation-based label assignment, and
remove small components by inverting.  skimage is replaced by scipy.ndimage
with matching conventions: component labeling uses full 26-connectivity
(skimage.morphology.label default), dilation uses the cross-shaped
connectivity-1 footprint (skimage.morphology.dilation default).  A faster
native C++ path can slot in behind the same functions later; outputs are the
contract.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

from .native import connected_components_native, grey_dilation_native

_DILATE_FOOTPRINT = ndi.generate_binary_structure(3, 1)  # 6-neighborhood cross


def _label(img: np.ndarray) -> np.ndarray:
    # native C++ union-find (26-connectivity, skimage label default);
    # scipy fallback inside when no compiler is available
    labels, _ = connected_components_native(img > 0, connectivity=3)
    return labels


def _dilate_labels(img: np.ndarray) -> np.ndarray:
    """Grey dilation with the cross footprint (skimage dilation default)."""
    return grey_dilation_native(img)


def _remove_small_holes(mask: np.ndarray, hole_size: int) -> np.ndarray:
    """skimage.remove_small_holes semantics: fill background components of
    size <= ``hole_size`` voxels (area_threshold inclusive; connectivity 1)."""
    inverted = ~mask
    labels, num = ndi.label(inverted, structure=_DILATE_FOOTPRINT)
    if num == 0:
        return mask.copy()
    counts = np.bincount(labels.ravel())
    small = counts <= hole_size
    small[0] = False
    filled = mask | small[labels]
    return filled


def unsort_by_size(img: np.ndarray, sorted_labels: np.ndarray) -> np.ndarray:
    """Invert :func:`sort_by_size` (ref post_processing.py:5-10).

    ``img`` must hold the DENSE RANK indices ``0..len(sorted_labels)-1``
    produced by ``sort_by_size`` — it is a LUT gather, not the reference's
    masked-assignment loop, so values outside that range are an error
    rather than being passed through untouched.
    """
    if img.size and (int(img.min()) < 0
                     or int(img.max()) >= len(sorted_labels)):
        raise ValueError(
            f"unsort_by_size expects dense rank indices in "
            f"[0, {len(sorted_labels)}); got range "
            f"[{int(img.min())}, {int(img.max())}]")
    return sorted_labels[img]


def sort_by_size(img: np.ndarray, descending: bool = False):
    """Relabel so that label rank follows component size (ref :12-26)."""
    unique_labels, unique_counts = np.unique(img, return_counts=True)
    ids = np.argsort(unique_counts, kind="stable")
    if descending:
        ids = ids[::-1]
    unique_labels = unique_labels[ids]
    unique_counts = unique_counts[ids]
    # LUT: original label value -> rank; labels are arbitrary ints so map
    # through searchsorted over the sorted unique values (one volume pass).
    # ascending[j] = unique_labels[order[j]], so a voxel matching ascending
    # position j carries rank order[j].
    order = np.argsort(unique_labels, kind="stable")
    positions = np.searchsorted(unique_labels[order], img)
    out = order.astype(img.dtype)[positions]
    return out, unique_labels, unique_counts


def keep_components(img: np.ndarray, num: int, max_dilations: int = 100):
    """Keep the ``num`` largest connected components; removed voxels are
    filled by iteratively dilating the survivors into them (ref :28-47)."""
    img = img.copy()
    num_components_removed = num_elements_removed = 0
    for i in range(max_dilations):
        img_comp = _label(img)
        img_comp_sorted, _, _ = sort_by_size(img_comp, descending=True)
        keep = img_comp_sorted <= num
        remove = ~keep
        if i == 0:
            num_elements_removed = int(remove.sum())
            # clamp: fewer components than ``num`` must report 0, not a
            # negative count
            num_components_removed = max(0, int(img_comp_sorted.max()) - num)
        if remove.sum() == 0:
            break
        sorted_img, sorted_labels, _ = sort_by_size(img)
        to_dilate = sorted_img * keep
        dilated = _dilate_labels(to_dilate)
        change = (dilated != to_dilate) & remove
        sorted_img[change] = dilated[change]
        img = unsort_by_size(sorted_img, sorted_labels)
    return img, num_components_removed, num_elements_removed


def remove_holes(img: np.ndarray, hole_size: int, max_dilations: int = 100):
    """Fill holes smaller than hole_size; hole voxels take labels from
    iterative dilation of the surrounding labels (ref :51-65)."""
    img = img.copy()
    total_holes = 0
    for i in range(max_dilations):
        mask = img > 0
        small_holes = ~mask & _remove_small_holes(mask, hole_size)
        num_holes = int(small_holes.sum())
        if i == 0:
            total_holes = num_holes
        if num_holes == 0:
            break
        img[small_holes] = _dilate_labels(img)[small_holes]
    return img, total_holes


def remove_small_components(img: np.ndarray, component_size: int, max_dilations: int = 100):
    """Remove foreground components smaller than component_size by treating
    them as holes of the inverted mask (ref :68-73)."""
    img = img.copy()
    inverted = (img == 0).astype(img.dtype)
    holes_removed, counts = remove_holes(inverted, component_size,
                                         max_dilations=max_dilations)
    img[holes_removed.astype(bool)] = 0
    return img, counts
