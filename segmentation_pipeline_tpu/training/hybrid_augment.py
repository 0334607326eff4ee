"""Per-batch host stage of the hybrid device-cache fast path.

The augmentation-ablation experiment (ref research/dmri_hippo/configs/
augmentation.py:41-50) inserts ReconstructMeanDWI
(ref transforms/reconstruct_mean_dwi.py:11-106) into the stochastic window.
It has no fused device counterpart — it resynthesizes the mean-DWI channel
from the full 4-D DWI series, which never reaches the device batch — so the
plain ``device_augmentation="auto"`` derivation refuses the pipeline and the
``dwi_reconstruction``/``combined`` modes used to fall back to the no-cache
host path (8-10 vol/s vs 26-31 sustained).

The hybrid split keeps the device-cache lever: the cache holds every channel
(built from the static draw at pretransform), and each batch this runtime

1. re-applies the peeled stochastic transforms to a scratch shallow copy of
   the pretransformed subject (shares the big full_dwi buffer — transforms
   rebind image data, never write in place, core/subject.py set_data);
2. re-applies the suffix intensity finishers to the regenerated images only
   (the cache already applied them to the static channels);
3. uploads just that channel block and splices it into the gathered cached X
   on device, before the derived fused device stages run.

Steady-state host->device traffic is the affected channels only (1 of 3 for
dmri_hippo) instead of the whole batch, and the host work per batch is one
mean over the DWI subset instead of the full transform pipeline.
"""
from __future__ import annotations

import copy
from typing import Optional, Sequence

import numpy as np

from ..core.subject import Image, Subject
from .auto_augment import HybridSpec


class HybridHostAugment:
    """Callable batch stage: ``apply(X_device, indices) -> X_device`` with
    the affected channels regenerated on host and spliced on device."""

    def __init__(self, subjects: Sequence[Subject], spec: HybridSpec,
                 x_dtype=None, mesh=None, data_axis: str = "data"):
        import jax
        import jax.numpy as jnp

        self.subjects = list(subjects)
        self.spec = spec
        self._np_dtype = np.dtype(x_dtype) if x_dtype is not None \
            else np.float32
        self._mesh = mesh
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._sharding = NamedSharding(mesh, P(data_axis))

        # the splice trusts the DECLARED ConcatenateImages.image_channels —
        # validate against the actual pretransformed data once, or a
        # mismatch would silently write the regenerated block into the
        # wrong channel span of every batch
        if self.subjects:
            probe = self.subjects[0]
            for name, (off, n) in spec.slots.items():
                actual = int(np.asarray(probe[name].data).shape[0])
                if actual != n:
                    raise ValueError(
                        f"hybrid channel slots: image '{name}' has {actual} "
                        f"channel(s) but the ConcatenateImages declaration "
                        f"says {n} — fix image_channels in the model-io "
                        f"concat")

        slots = [spec.slots[name] for name in spec.image_order]

        def splice(X, block):
            # block channels are packed in image_order; scatter each image's
            # span into its slot inside X
            src = 0
            for off, n in slots:
                X = X.at[..., off:off + n].set(
                    block[..., src:src + n].astype(X.dtype))
                src += n
            return X

        # donate X: the gathered batch is consumed here, so the splice can
        # write in place instead of allocating a second batch buffer
        self._splice = jax.jit(splice, donate_argnums=(0,))
        self._jnp = jnp

    # ---- host side -----------------------------------------------------
    def _scratch(self, subject: Subject) -> Subject:
        out = Subject()
        for k, v in subject.items():
            out[k] = copy.copy(v) if isinstance(v, Image) else v
        return out

    def regenerate(self, indices) -> np.ndarray:
        """(N, W, H, D, C_affected) host block in the cache storage dtype."""
        blocks = []
        for i in indices:
            s = self._scratch(self.subjects[int(i)])
            for t in self.spec.peeled:
                t(s, record=False)
            for t in self.spec.finishers:
                t(s, record=False)
            arrs = [np.asarray(s[name].data, dtype=np.float32)
                    for name in self.spec.image_order]
            blocks.append(np.concatenate(arrs, axis=0))  # (C_aff, W, H, D)
        block = np.stack(blocks)  # (N, C_aff, W, H, D)
        return np.moveaxis(block, 1, -1).astype(self._np_dtype)

    # ---- device side ---------------------------------------------------
    def apply(self, X_device, indices):
        import jax

        # ONE transfer: device_put the numpy block straight into its target
        # sharding (jnp.asarray first would commit it to the default device
        # and reshard with a second copy)
        host_block = self.regenerate(indices)
        if self._sharding is not None:
            block = jax.device_put(host_block, self._sharding)
        else:
            block = self._jnp.asarray(host_block)
        return self._splice(X_device, block)
