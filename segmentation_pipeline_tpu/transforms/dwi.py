"""Physics-aware DWI augmentation.

Parity with the reference's reconstruct_mean_dwi.py:11-108: regenerate the
``mean_dwi`` input from the full 4-D DWI series + gradient table by averaging
a directionally-biased random subset of diffusion directions.
"""
from __future__ import annotations

from numbers import Number
from typing import Tuple, Union

import numpy as np

from .base import RandomTransform


class ReconstructMeanDWI(RandomTransform):
    """Directionally-biased random-subset mean DWI (ref :11-106).

    Sampling probabilities are |bvec . random_direction|^directionality; the
    number of averaged DWIs follows a power-law draw when given as a range
    (ref :75-86).
    """

    def __init__(self, full_dwi_image_name: str = "full_dwi",
                 mean_dwi_image_name: str = "mean_dwi", bvec_name: str = "grad",
                 num_dwis: Union[int, Tuple[int, int]] = 15,
                 num_directions: Union[int, Tuple[int, int]] = 1,
                 directionality: Union[Number, Tuple[Number, Number]] = 4,
                 bval_range: Tuple[float, float] = (1e-5, 501.0), **kwargs):
        super().__init__(**kwargs)
        self.full_dwi_image_name = full_dwi_image_name
        self.mean_dwi_image_name = mean_dwi_image_name
        self.bvec_name = bvec_name
        self.num_dwis = num_dwis
        self.num_directions = num_directions
        self.directionality = directionality
        self.bval_range = bval_range

    def _sample_num_dwis(self) -> int:
        if isinstance(self.num_dwis, int):
            return self.num_dwis
        low, high = self.num_dwis
        sample = self.rng.random() ** 2  # power-law bias toward few DWIs (ref :80-84)
        return int(sample * (high - low + 1) + low)

    def _sample_num_directions(self) -> int:
        if isinstance(self.num_directions, int):
            return self.num_directions
        return int(self.rng.integers(self.num_directions[0], self.num_directions[1] + 1))

    def _sample_directionality(self) -> float:
        if isinstance(self.directionality, tuple):
            return float(self.rng.uniform(*self.directionality))
        return float(self.directionality)

    def apply_transform(self, subject):
        if self.full_dwi_image_name not in subject:
            return None

        full_dwi_image = subject[self.full_dwi_image_name]
        full_dwi = np.asarray(full_dwi_image.data)
        grad = np.asarray(full_dwi_image[self.bvec_name])

        bvals = grad[:, 3]
        bvecs = grad[:, :3]
        mask = (bvals > self.bval_range[0]) & (bvals < self.bval_range[1])
        bvecs = bvecs[mask]
        full_dwi = full_dwi[mask]

        num_dwis = self._sample_num_dwis()
        num_directions = self._sample_num_directions()
        directionality = self._sample_directionality()

        directions = self.rng.standard_normal((3, num_directions))
        directions = directions / np.linalg.norm(directions, axis=0, keepdims=True)

        probs = np.max(np.abs(bvecs @ directions) ** directionality, axis=1)
        probs = probs / probs.sum()

        indices = self.rng.choice(full_dwi.shape[0], size=num_dwis, p=probs)
        mean_dwi = np.mean(full_dwi[indices], axis=0, keepdims=True).astype(np.float32)

        if self.mean_dwi_image_name in subject:
            mean_image = subject[self.mean_dwi_image_name]
        else:
            # build a fresh container — deepcopying the full 4-D DWI series
            # just to overwrite its data would copy 60-100 volumes per call
            # (and inherit the series' file paths into the mean image)
            mean_image = type(full_dwi_image)(tensor=mean_dwi,
                                              affine=full_dwi_image.affine.copy())
            subject.add_image(mean_image, self.mean_dwi_image_name)
        mean_image.set_data(mean_dwi)
        return {"indices": indices.tolist()}

    def is_invertible(self):
        return False


class ReconstructMeanDWIClassic(RandomTransform):
    """Nearest-gradient-neighborhood subset mean DWI (ref :108-172)."""

    def __init__(self, full_dwi_image_name: str = "full_dwi",
                 mean_dwi_image_name: str = "mean_dwi", bvec_name: str = "grad",
                 subset_size: int = 15,
                 bval_range: Tuple[float, float] = (1e-5, 501.0), **kwargs):
        super().__init__(**kwargs)
        self.full_dwi_image_name = full_dwi_image_name
        self.mean_dwi_image_name = mean_dwi_image_name
        self.bvec_name = bvec_name
        self.subset_size = subset_size
        self.bval_range = bval_range

    def apply_transform(self, subject):
        if self.full_dwi_image_name not in subject:
            return None

        full_dwi_image = subject[self.full_dwi_image_name]
        full_dwi = np.asarray(full_dwi_image.data)
        grad = np.asarray(full_dwi_image[self.bvec_name])

        bvals = grad[:, 3]
        bvecs = grad[:, :3]
        mask = (bvals > self.bval_range[0]) & (bvals < self.bval_range[1])
        bvecs = bvecs[mask]
        full_dwi = full_dwi[mask]

        rand_bvec = bvecs[self.rng.integers(bvecs.shape[0])]
        dist = np.sum((bvecs - rand_bvec) ** 2, axis=1)
        closest = np.argsort(dist)[: self.subset_size]

        n_select = int(self.rng.integers(1, self.subset_size))
        ids = self.rng.permutation(closest.shape[0])[:n_select]
        selected = closest[ids]
        mean_dwi = np.mean(full_dwi[selected], axis=0, keepdims=True).astype(np.float32)

        if self.mean_dwi_image_name in subject:
            mean_image = subject[self.mean_dwi_image_name]
        else:
            # build a fresh container — deepcopying the full 4-D DWI series
            # just to overwrite its data would copy 60-100 volumes per call
            # (and inherit the series' file paths into the mean image)
            mean_image = type(full_dwi_image)(tensor=mean_dwi,
                                              affine=full_dwi_image.affine.copy())
            subject.add_image(mean_image, self.mean_dwi_image_name)
        mean_image.set_data(mean_dwi)
        return {"indices": selected.tolist()}

    def is_invertible(self):
        return False
