"""Ensembling / test-time augmentation wrappers.

Behavioral parity with ref models/ensemble.py:9-103 (EnsembleModels,
EnsembleFlips with all 2^k flip combos, EnsembleOrientations with all
6 permutations x 8 flips = 48 orientations), re-designed as callables over
channel-first (N, C, W, H, D) arrays that wrap any model callable (SegModel,
another ensemble, ...).  The flip/permute loop is Python-unrolled — each
member call reuses the wrapped model's cached jit executable, so TTA costs
k compiled forwards and no recompiles.
"""
from __future__ import annotations

import itertools
from typing import Sequence

import jax.numpy as jnp


def parse_strategy(strategy: str) -> str:
    strategies = ("mean", "majority")
    if strategy not in strategies:
        raise ValueError(f"Ensembling strategy must be one of {strategies} not {strategy}")
    return strategy


def apply_strategy(predictions: Sequence[jnp.ndarray], strategy: str) -> jnp.ndarray:
    """predictions: list of (N, C, ...) prob tensors."""
    stacked = jnp.stack(predictions)  # (E, N, C, ...)
    if strategy == "mean":
        return jnp.mean(stacked, axis=0)
    if strategy == "majority":
        C = stacked.shape[2]
        votes = jnp.argmax(stacked, axis=2)            # (E, N, ...)
        counts = jnp.stack([(votes == c).sum(axis=0) for c in range(C)], axis=1)
        winner = jnp.argmax(counts, axis=1)            # (N, ...) smallest-index ties
        one_hot = jnp.moveaxis(
            jnp.eye(C, dtype=stacked.dtype)[winner], -1, 1)
        return one_hot
    raise RuntimeError(f"Invalid prediction strategy {strategy}")


class EnsembleModels:
    """Average / majority-vote over a list of models (e.g. CV folds)."""

    def __init__(self, models: Sequence, strategy: str = "mean"):
        self.models = list(models)
        self.strategy = parse_strategy(strategy)

    def __call__(self, x):
        return apply_strategy([model(x) for model in self.models], self.strategy)


class EnsembleFlips:
    """TTA over all flip combinations of the chosen spatial dims; each
    prediction is un-flipped before combining (ref :50-71)."""

    def __init__(self, model, strategy: str = "mean",
                 spatial_dims: Sequence[int] = (2, 3, 4)):
        self.model = model
        self.strategy = parse_strategy(strategy)
        self.spatial_dims = tuple(spatial_dims)
        self.flips = []
        for order in range(len(self.spatial_dims) + 1):
            self.flips += list(itertools.combinations(self.spatial_dims, order))

    def __call__(self, x):
        x = jnp.asarray(x)
        predictions = []
        for flip in self.flips:
            x_flipped = jnp.flip(x, axis=flip) if flip else x
            y = self.model(x_flipped)
            y = jnp.flip(y, axis=flip) if flip else y
            predictions.append(y)
        return apply_strategy(predictions, self.strategy)


class EnsembleOrientations:
    """TTA over all 6 spatial permutations x 8 flips = 48 orientations
    (ref :74-103); the packaged run_inference TTA path."""

    def __init__(self, model, strategy: str = "mean"):
        self.model = model
        self.strategy = parse_strategy(strategy)
        spatial_dims = (2, 3, 4)
        self.permutations = list(itertools.permutations(spatial_dims))
        self.flips = []
        for order in range(len(spatial_dims) + 1):
            self.flips += list(itertools.combinations(spatial_dims, order))

    def __call__(self, x):
        import numpy as np

        x = jnp.asarray(x)
        predictions = []
        for permutation in self.permutations:
            inverse_permutation = tuple(int(i) + 2 for i in np.argsort(permutation))
            x_permuted = jnp.transpose(x, (0, 1, *permutation))
            for flip in self.flips:
                x_flipped = jnp.flip(x_permuted, axis=flip) if flip else x_permuted
                y = self.model(x_flipped)
                y = jnp.flip(y, axis=flip) if flip else y
                predictions.append(jnp.transpose(y, (0, 1, *inverse_permutation)))
        return apply_strategy(predictions, self.strategy)
