"""Ensembling / test-time augmentation wrappers.

Behavioral parity with ref models/ensemble.py:9-103 (EnsembleModels,
EnsembleFlips with all 2^k flip combos, EnsembleOrientations with all
6 permutations x 8 flips = 48 orientations), re-designed as callables over
channel-first (N, C, W, H, D) arrays that wrap any model callable (SegModel,
another ensemble, ...).

Two execution modes:

- unrolled (default, reference semantics): each member is a separate
  forward; reuses the wrapped model's cached jit executable, so TTA costs
  k compiled forwards and no recompiles.
- batched (``batched=True`` or ``mesh=...``): the ensemble axis is folded
  into the batch and all members run in ONE forward.  With a ``mesh`` the
  folded batch is sharded over the mesh's ``data`` axis, so the 2^k flips
  (or the 8 flips of each orientation group) execute SPMD across devices —
  TTA is embarrassingly parallel and rides ICI instead of looping on one
  chip.  Results are numerically identical to the unrolled mode (same
  member forwards, same combine).
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


def _shard_batch(x, mesh):
    """Place a channel-first batch on the mesh, sharded over its data axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


class EnsembleModels:
    """Average / majority-vote over a list of models (e.g. CV folds)."""

    def __init__(self, models: Sequence, strategy: str = "mean"):
        self.models = list(models)
        self.strategy = parse_strategy(strategy)

    def __call__(self, x):
        return apply_strategy([model(x) for model in self.models], self.strategy)


class EnsembleFlips:
    """TTA over all flip combinations of the chosen spatial dims; each
    prediction is un-flipped before combining (ref :50-71).

    ``batched=True`` folds the 2^k flip members into the batch dim and runs
    them in one forward; ``mesh`` additionally shards that folded batch over
    the mesh's data axis (SPMD flip-TTA)."""

    def __init__(self, model, strategy: str = "mean",
                 spatial_dims: Sequence[int] = (2, 3, 4),
                 batched: bool = False, mesh=None):
        self.model = model
        self.strategy = parse_strategy(strategy)
        self.spatial_dims = tuple(spatial_dims)
        self.batched = batched or mesh is not None
        self.mesh = mesh
        self.flips = []
        for order in range(len(self.spatial_dims) + 1):
            self.flips += list(itertools.combinations(self.spatial_dims, order))

    def _members(self, x):
        """Predicted, un-flipped member outputs, one per flip combo."""
        if not self.batched:
            out = []
            for flip in self.flips:
                x_flipped = jnp.flip(x, axis=flip) if flip else x
                y = self.model(x_flipped)
                out.append(jnp.flip(y, axis=flip) if flip else y)
            return out
        n = x.shape[0]
        stacked = jnp.concatenate(
            [jnp.flip(x, axis=flip) if flip else x for flip in self.flips], axis=0)
        pad = 0
        if self.mesh is not None:
            # GSPMD requires the folded batch divisible by the data-axis
            # size; pad with wrapped member rows (results discarded below)
            # so any (members x batch) works — e.g. 4 flip members of a
            # trailing batch of 1 on an 8-device mesh
            total = stacked.shape[0]
            axis = ("data" if "data" in self.mesh.axis_names
                    else self.mesh.axis_names[0])
            pad = (-total) % self.mesh.shape[axis]
            if pad:
                wrap = jnp.take(stacked, jnp.arange(pad) % total, axis=0)
                stacked = jnp.concatenate([stacked, wrap], axis=0)
            stacked = _shard_batch(stacked, self.mesh)
        y_all = self.model(stacked)  # (E*N [+pad], C, ...)
        if pad:
            y_all = y_all[:-pad]
        out = []
        for i, flip in enumerate(self.flips):
            y = y_all[i * n:(i + 1) * n]
            out.append(jnp.flip(y, axis=flip) if flip else y)
        return out

    def __call__(self, x):
        x = jnp.asarray(x)
        return apply_strategy(self._members(x), self.strategy)


class EnsembleOrientations:
    """TTA over all 6 spatial permutations x 8 flips = 48 orientations
    (ref :74-103); the packaged run_inference TTA path.

    In batched/mesh mode the 8 flips of each permutation group (identical
    shapes) run as one sharded forward — 48 member forwards become 6."""

    def __init__(self, model, strategy: str = "mean",
                 batched: bool = False, mesh=None):
        self.model = model
        self.strategy = parse_strategy(strategy)
        self.batched = batched or mesh is not None
        self.mesh = mesh
        spatial_dims = (2, 3, 4)
        self.permutations = list(itertools.permutations(spatial_dims))
        self._flip_group = EnsembleFlips(model, strategy="mean",
                                         spatial_dims=spatial_dims,
                                         batched=batched, mesh=mesh)

    @property
    def flips(self):
        return self._flip_group.flips

    def __call__(self, x):
        import numpy as np

        x = jnp.asarray(x)
        predictions = []
        for permutation in self.permutations:
            inverse_permutation = tuple(int(i) + 2 for i in np.argsort(permutation))
            x_permuted = jnp.transpose(x, (0, 1, *permutation))
            for y in self._flip_group._members(x_permuted):
                predictions.append(jnp.transpose(y, (0, 1, *inverse_permutation)))
        return apply_strategy(predictions, self.strategy)
