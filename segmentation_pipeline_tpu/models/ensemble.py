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


def apply_strategy_masked(predictions: Sequence[jnp.ndarray],
                          masks: Sequence[jnp.ndarray],
                          strategy: str) -> jnp.ndarray:
    """Combine (N, C, ...) member predictions under per-voxel validity
    masks (spatial shape, True where the member has a real prediction):
    masked mean, or majority among valid voters only."""
    stacked = jnp.stack(predictions)                    # (E, N, C, ...)
    w = jnp.stack([m.astype(stacked.dtype) for m in masks]
                  )[:, None, None]                      # (E, 1, 1, ...)
    if strategy == "mean":
        denom = jnp.maximum(w.sum(axis=0), 1.0)
        return (stacked * w).sum(axis=0) / denom
    if strategy == "majority":
        C = stacked.shape[2]
        votes = jnp.argmax(stacked, axis=2)             # (E, N, ...)
        wv = w[:, :, 0]                                 # (E, 1, ...)
        counts = jnp.stack([((votes == c) * wv).sum(axis=0)
                            for c in range(C)], axis=1)
        winner = jnp.argmax(counts, axis=1)
        return jnp.moveaxis(jnp.eye(C, dtype=stacked.dtype)[winner], -1, 1)
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


class EnsembleAffines:
    """TTA over K random affine warps (rotation + scale about the volume
    center): warp the input, forward, warp the prediction back with the
    INVERSE matrix, and combine under a per-voxel validity mask so voxels
    the inverse warp pulls from outside a member's grid don't vote.

    This is the affine-family TTA the reference gets latently from
    torchio's invertible ``Affine`` history (ref
    research/dmri_hippo/hippo_inference.py:27-32,
    segmentation_pipeline/prediction.py:157-170 — augment, predict, invert
    through ``get_composed_history().inverse()``), made a first-class
    ensemble here: both warps run on device with the fused augmentation's
    coordinate math (ops/augment.py), so members never leave HBM, and
    probabilities (not hard labels) are inverse-interpolated.

    Member 0 is the identity when ``include_identity=True`` (default), so
    every voxel has at least one valid vote.  Matrices are drawn once at
    construction from ``seed`` — TTA is deterministic and repeatable.

    ``batched=True`` folds the K members into the batch dim and runs ONE
    forward; ``mesh`` additionally shards that folded batch over the
    mesh's data axis (SPMD affine-TTA), exactly like EnsembleFlips."""

    def __init__(self, model, num_members: int = 4, scales: float = 0.1,
                 degrees: float = 10.0, strategy: str = "mean",
                 seed: int = 0, include_identity: bool = True,
                 pad_value: float = 0.0, batched: bool = False, mesh=None):
        import jax
        import numpy as np

        from ..ops.augment import draw_affine_matrix

        self.model = model
        self.strategy = parse_strategy(strategy)
        self.pad_value = float(pad_value)
        self.batched = batched or mesh is not None
        self.mesh = mesh
        matrices = []
        if include_identity:
            matrices.append(np.eye(3, dtype=np.float32))
        key = jax.random.PRNGKey(seed)
        for k in range(num_members - len(matrices)):
            A = draw_affine_matrix(jax.random.fold_in(key, k),
                                   scales=scales, degrees=degrees)
            matrices.append(np.asarray(A, np.float32))
        self.matrices = matrices

    def _coords(self, spatial):
        """[(forward coords, fwd oob, inverse coords, inv oob)] per member
        (identity short-circuits to None entries)."""
        import numpy as np

        from ..ops.augment import _affine_coords_oob

        out = []
        for A in self.matrices:
            if np.allclose(A, np.eye(3)):
                out.append((None, None, None, None))
                continue
            cf, of = _affine_coords_oob(jnp.asarray(A), spatial)
            ci, oi = _affine_coords_oob(jnp.asarray(np.linalg.inv(A)),
                                        spatial)
            out.append((cf, of, ci, oi))
        return out

    def _warp_in(self, x_cl, cf, of):
        import jax

        from ..ops.augment import trilinear_sample

        def one(v):
            return jnp.where(of[..., None], self.pad_value,
                             trilinear_sample(v, cf))

        return jax.vmap(one)(x_cl)

    def _warp_back(self, y, ci):
        import jax

        from ..ops.augment import trilinear_sample

        y_cl = jnp.moveaxis(y, 1, -1)
        y_back = jax.vmap(lambda v: trilinear_sample(v, ci))(y_cl)
        return jnp.moveaxis(y_back, -1, 1)

    def __call__(self, x):
        x = jnp.asarray(x)
        spatial = x.shape[2:]
        x_cl = jnp.moveaxis(x, 1, -1)
        coords = self._coords(spatial)
        ones = jnp.ones(spatial, bool)

        if not self.batched:
            preds, masks = [], []
            for cf, of, ci, oi in coords:
                if cf is None:
                    preds.append(self.model(x))
                    masks.append(ones)
                    continue
                y = self.model(jnp.moveaxis(self._warp_in(x_cl, cf, of),
                                            -1, 1))
                preds.append(self._warp_back(y, ci))
                masks.append(~oi)
            return apply_strategy_masked(preds, masks, self.strategy)

        n = x.shape[0]
        stacked = jnp.concatenate(
            [x if cf is None
             else jnp.moveaxis(self._warp_in(x_cl, cf, of), -1, 1)
             for cf, of, ci, oi in coords], axis=0)
        pad = 0
        if self.mesh is not None:
            total = stacked.shape[0]
            axis = ("data" if "data" in self.mesh.axis_names
                    else self.mesh.axis_names[0])
            pad = (-total) % self.mesh.shape[axis]
            if pad:
                wrap = jnp.take(stacked, jnp.arange(pad) % total, axis=0)
                stacked = jnp.concatenate([stacked, wrap], axis=0)
            stacked = _shard_batch(stacked, self.mesh)
        y_all = self.model(stacked)
        if pad:
            y_all = y_all[:-pad]
        preds, masks = [], []
        for i, (cf, of, ci, oi) in enumerate(coords):
            y = y_all[i * n:(i + 1) * n]
            if ci is None:
                preds.append(y)
                masks.append(ones)
            else:
                preds.append(self._warp_back(y, ci))
                masks.append(~oi)
        return apply_strategy_masked(preds, masks, self.strategy)


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
