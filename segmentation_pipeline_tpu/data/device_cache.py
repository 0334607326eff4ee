"""Device-resident dataset cache: remove the host link from the hot loop.

The reference re-collates and re-uploads every batch each iteration
(ref segmentation_trainer.py:165 -> utils/utils.py:75-85 ``.to(device)``).
On TPU the host link is routinely the bottleneck — a dmri_hippo batch is
~10 MB/iteration, which through a slow host link caps sustained throughput
well below the device-bound rate.  When the host pipeline is deterministic
(``pretransform_training_data``) the whole training set fits comfortably in
HBM (dmri_hippo: ~1 GB for 100 subjects), so it is uploaded ONCE and each
iteration's batch becomes an on-device index gather: steady-state
host->device traffic drops to a few int32 indices.  Pair with the trainer's
``device_augmentation`` so augmentations still vary every step.

Storage layout: X channels-last (S, W, H, D, C) in the compute dtype
(bf16 halves HBM under mixed precision); exactly-one-hot labels stored as
uint8 class ids and expanded back on device inside the gather program —
bit-identical to shipping the one-hot planes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class DeviceDataCache:
    def __init__(self, subjects: Sequence, x_dtype=None, mesh=None,
                 data_axis: str = "data", max_bytes: int = 8 * 2 ** 30):
        import jax
        import jax.numpy as jnp

        try:
            X = np.stack([np.asarray(s["X"].data) for s in subjects])
            y = np.stack([np.asarray(s["y"].data) for s in subjects])
        except ValueError as e:
            raise ValueError(
                "DeviceDataCache needs uniform subject shapes — add a "
                "CropOrPad/MinSizePad to the pipeline or disable "
                "device_cache") from e
        X = np.moveaxis(X, 1, -1).astype(np.float32)  # (S, W, H, D, C)
        if x_dtype is not None:
            X = X.astype(x_dtype)

        n_classes = int(y.shape[1])
        is_onehot = (1 < n_classes <= 255
                     and bool(np.all((y == 0) | (y == 1)))
                     and bool(np.all(y.sum(axis=1) == 1)))
        if is_onehot:
            y_store = np.argmax(y, axis=1).astype(np.uint8)  # (S, W, H, D)
        else:
            y_store = np.moveaxis(y, 1, -1).astype(np.float32)

        total = X.nbytes + y_store.nbytes
        if total > max_bytes:
            raise ValueError(
                f"Training set is {total / 2 ** 30:.1f} GiB — beyond the "
                f"device cache budget ({max_bytes / 2 ** 30:.1f} GiB). "
                f"Disable device_cache or raise max_bytes")
        self.nbytes = total
        self.n_subjects = int(X.shape[0])
        self.n_classes = n_classes
        self._is_onehot = is_onehot

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self._X = jax.device_put(jnp.asarray(X), replicated)
            self._y = jax.device_put(jnp.asarray(y_store), replicated)
            batch_sharding = NamedSharding(mesh, P(data_axis))
            out_shardings = {"X": batch_sharding, "y": batch_sharding}
        else:
            self._X = jnp.asarray(X)
            self._y = jnp.asarray(y_store)
            out_shardings = None

        cache_X, cache_y = self._X, self._y

        def gather(idx):
            xb = jnp.take(cache_X, idx, axis=0)
            yb = jnp.take(cache_y, idx, axis=0)
            if is_onehot:
                yb = jax.nn.one_hot(yb, n_classes, dtype=jnp.float32)
            return {"X": xb, "y": yb}

        if out_shardings is not None:
            self._gather = jax.jit(gather, out_shardings=out_shardings)
        else:
            self._gather = jax.jit(gather)

    def gather(self, indices):
        """indices: sequence of subject ids -> channels-last device batch
        {'X': (N, W, H, D, C) storage dtype, 'y': (N, W, H, D, C) f32}."""
        import jax.numpy as jnp

        return self._gather(jnp.asarray(np.asarray(indices, np.int32)))
