"""Stochastic spatial augmentation: RandomFlip, RandomAffine, RandomElastic.

Behavioral parity with the torchio spatial augmentation the reference uses
(tio.RandomFlip main_config.py:89, tio.RandomAffine msseg2.py:49,
tio.RandomElasticDeformation main_config.py:90-91).  RandomFlip applies the
concrete, invertible Flip to the tape; affine/elastic are non-invertible (the
reference's inverse paths skip them the same way).  Host path uses scipy; the
batched fused device path lives in ops/augment.py.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import numpy as np
from scipy import ndimage as ndi

from ..core.subject import LabelMap
from .base import RandomTransform, SpatialTransform
from .spatial import Flip, _pad_value


class RandomFlip(RandomTransform, SpatialTransform):
    """Flip each listed spatial axis independently with probability
    ``flip_probability`` (tio.RandomFlip semantics)."""

    def __init__(self, axes: Union[int, Sequence[int]] = 0, flip_probability: float = 0.5, **kwargs):
        super().__init__(**kwargs)
        if isinstance(axes, int):
            axes = (axes,)
        self.axes = tuple(axes)
        self.flip_probability = flip_probability

    def __call__(self, subject, record: bool = True):
        if isinstance(subject, (list, tuple)):
            return [self(s, record=record) for s in subject]
        if self.p < 1.0 and self.rng.random() > self.p:
            return subject
        chosen = tuple(a for a in self.axes if self.rng.random() < self.flip_probability)
        if not chosen:
            return subject
        concrete = Flip(chosen, **self._sel())
        return concrete(subject, record=record)

    def apply_transform(self, subject):  # pragma: no cover
        raise RuntimeError("dispatches via __call__")


def _as_range(value, center: float = 0.0) -> Tuple[float, float]:
    if isinstance(value, (tuple, list)):
        if len(value) == 2:
            return float(value[0]), float(value[1])
        raise ValueError(f"Range must have 2 elements, got {value}")
    v = float(value)
    return center - v, center + v


def _interp_order(interpolation: str, is_label: bool) -> int:
    """scipy spline order for an interpolation name; labels always nearest.
    Mirrors spatial.py's Resample dispatch so 'nearest' means nearest here
    too (it previously fell through to cubic)."""
    if is_label or interpolation == "nearest":
        return 0
    if interpolation == "linear":
        return 1
    if interpolation in ("bspline", "cubic"):
        return 3
    raise ValueError(f"Unsupported interpolation {interpolation!r}")


class RandomAffine(RandomTransform, SpatialTransform):
    """Random rotation/scale/translation about the image center
    (tio.RandomAffine: scales=s -> U(1-s, 1+s), degrees=d -> U(-d, d) per
    axis, default_pad_value='otsu' pads scalars with the mean sub-Otsu
    background, msseg2.py:49)."""

    def __init__(self, scales=0.1, degrees=10, translation=0,
                 image_interpolation: str = "linear",
                 default_pad_value: Union[str, float] = "minimum", **kwargs):
        super().__init__(**kwargs)
        self.scales = _as_range(scales, center=1.0)
        self.degrees = _as_range(degrees)
        self.translation = _as_range(translation)
        self.image_interpolation = image_interpolation
        self.default_pad_value = default_pad_value

    def apply_transform(self, subject):
        scales = self.rng.uniform(*self.scales, size=3)
        degrees = self.rng.uniform(*self.degrees, size=3)
        translation = self.rng.uniform(*self.translation, size=3)

        radians = np.deg2rad(degrees)
        cx, cy, cz = np.cos(radians)
        sx, sy, sz = np.sin(radians)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = Rx @ Ry @ Rz
        S = np.diag(scales)
        M = R @ S  # output-voxel -> input-voxel linear part (about center)

        for image in self.get_images(subject):
            data = np.asarray(image.data)
            spatial = np.array(data.shape[1:], dtype=np.float64)
            center = (spatial - 1) / 2
            spacing = np.array(image.spacing)
            # Work in voxel space scaled by spacing so rotations are rigid in mm.
            A = np.diag(1.0 / spacing) @ M @ np.diag(spacing)
            offset = center - A @ center - translation / spacing

            is_label = isinstance(image, LabelMap)
            order = _interp_order(self.image_interpolation, is_label)
            cval = 0.0 if is_label else _pad_value(data, self.default_pad_value)

            src = data.astype(np.float32)
            out = np.stack([
                ndi.affine_transform(src[c], A, offset=offset, order=order,
                                     mode="constant", cval=cval, prefilter=order > 1)
                for c in range(data.shape[0])
            ])
            if is_label:
                out = np.rint(out).astype(data.dtype)
            image.set_data(out)

        return {"scales": scales.tolist(), "degrees": degrees.tolist(),
                "translation": translation.tolist()}

    def is_invertible(self):
        return False


class RandomElasticDeformation(RandomTransform, SpatialTransform):
    """B-spline free-form deformation: a coarse control grid of random
    displacements (mm), upsampled to a dense field, warps all images
    (tio.RandomElasticDeformation; num_control_points includes border points,
    locked_borders zeroes that many outer layers; main_config.py:90-91)."""

    def __init__(self, num_control_points: Union[int, Tuple[int, int, int]] = 7,
                 max_displacement: Union[float, Tuple[float, float, float]] = 7.5,
                 locked_borders: int = 2,
                 image_interpolation: str = "linear", **kwargs):
        super().__init__(**kwargs)
        if isinstance(num_control_points, int):
            num_control_points = (num_control_points,) * 3
        self.num_control_points = tuple(num_control_points)
        if isinstance(max_displacement, (int, float)):
            max_displacement = (float(max_displacement),) * 3
        self.max_displacement = tuple(max_displacement)
        self.locked_borders = locked_borders
        self.image_interpolation = image_interpolation

    def sample_control_grid(self) -> np.ndarray:
        grid = np.stack([
            self.rng.uniform(-d, d, size=self.num_control_points)
            for d in self.max_displacement
        ])  # (3, cp_w, cp_h, cp_d), displacements in mm
        lb = self.locked_borders
        if lb > 0:
            for axis in range(3):
                sl = [slice(None)] * 4
                sl[1 + axis] = slice(0, lb)
                grid[tuple(sl)] = 0
                sl[1 + axis] = slice(-lb, None)
                grid[tuple(sl)] = 0
        return grid

    @staticmethod
    def _bspline_matrix(n_cp: int, size: int) -> np.ndarray:
        """(size, n_cp) matrix of the 1D cubic-B-spline interpolation operator
        (prefilter + basis, mode='nearest') evaluated at the dense positions
        linspace(0, n_cp-1, size).  map_coordinates is linear in its input,
        so the matrix built from basis vectors reproduces it exactly."""
        pos = np.linspace(0, n_cp - 1, size, dtype=np.float64)[None]
        eye = np.eye(n_cp, dtype=np.float64)
        cols = [ndi.map_coordinates(eye[j], pos, order=3, mode="nearest")
                for j in range(n_cp)]
        return np.stack(cols, axis=1).astype(np.float32)

    @staticmethod
    def dense_field(control_grid: np.ndarray, spatial_shape: Tuple[int, int, int]) -> np.ndarray:
        """Upsample the (3, cw, ch, cd) control grid to (3, W, H, D) with
        cubic b-spline interpolation. Control points span the image extent.

        Tensor-grid B-spline interpolation is separable (prefilter and basis
        both factor per axis), so instead of a generic map_coordinates over
        W*H*D points (~1.4 s/axis at 160x192x160) this contracts the control
        grid with three small (S, n_cp) basis matrices (~milliseconds) —
        bit-equal to the map_coordinates result up to fp association."""
        cp = control_grid.shape[1:]
        Ms = [RandomElasticDeformation._bspline_matrix(c, s)
              for c, s in zip(cp, spatial_shape)]
        out = np.einsum("aijk,wi->awjk", control_grid.astype(np.float32), Ms[0])
        out = np.einsum("awjk,hj->awhk", out, Ms[1])
        out = np.einsum("awhk,dk->awhd", out, Ms[2])
        return np.ascontiguousarray(out, dtype=np.float32)

    def apply_transform(self, subject):
        control_grid = self.sample_control_grid()
        field_cache = {}  # per spatial shape: all images usually share one
        for image in self.get_images(subject):
            data = np.asarray(image.data)
            spatial = data.shape[1:]
            field_mm = field_cache.get(spatial)
            if field_mm is None:
                field_mm = field_cache[spatial] = self.dense_field(
                    control_grid, spatial)
            spacing = np.array(image.spacing, dtype=np.float32)
            field_vox = field_mm / spacing[:, None, None, None]

            idx = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in spatial], indexing="ij")
            sample_coords = [idx[a] + field_vox[a] for a in range(3)]

            is_label = isinstance(image, LabelMap)
            order = _interp_order(self.image_interpolation, is_label)
            src = data.astype(np.float32)
            out = np.stack([
                ndi.map_coordinates(src[c], sample_coords, order=order, mode="nearest")
                for c in range(data.shape[0])
            ])
            if is_label:
                out = np.rint(out).astype(data.dtype)
            image.set_data(out)
        return {"control_grid": control_grid}

    def is_invertible(self):
        return False
