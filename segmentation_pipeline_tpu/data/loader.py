"""Data-loader factories: host-side async prefetch + patch queue.

TPU-native re-design of ref data_loader_factory.py:10-54 and the torchio
Queue/WeightedSampler machinery it wraps (SURVEY §2.3): batches are lists of
Subjects (identity collate, ref utils.py:15); loading/augmentation runs in a
host thread pool (numpy releases the GIL) that prefetches ahead of the device
— the double-buffering role of torch DataLoader workers.  Patch sampling
draws prob-map-weighted patch centers and applies a recorded Crop so the
history tape stays invertible (torchio samplers do the same via tio.Crop).
"""
from __future__ import annotations

import os
import queue as queue_mod
import random
from concurrent.futures.process import BrokenProcessPool
from abc import ABC, abstractmethod
from typing import Iterator, List, Sequence

import numpy as np

from ..core.subject import Subject
from ..transforms.base import get_rng
from ..transforms.spatial import Crop

# ---------------------------------------------------------------------------
# Multiprocess worker plumbing (the reference's num_workers use case,
# ref data_loader_factory.py:30,50: torch DataLoader worker processes run
# the CPU transform pipeline in parallel). Thread workers are fine when the
# transforms are numpy-heavy (GIL released); pure-Python/scipy transform
# pipelines need processes to scale on multicore hosts.
# ---------------------------------------------------------------------------

_WORKER_DATASET = None


def _init_worker(dataset, seed_base: int):
    """Worker initializer: receives the dataset once and reseeds the
    transform RNG per process (forked workers would otherwise spawn
    identical SeedSequence children and produce identical augmentations)."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    from ..transforms.base import seed_all

    seed_all((seed_base + os.getpid()) % (2 ** 32))


def _worker_fetch(i: int):
    return _WORKER_DATASET[i]


def _make_process_pool(dataset, num_workers: int):
    """Process pool for loader workers.

    Start method matters: plain ``fork`` from a parent whose JAX backend
    (and, on this rig, the TPU-tunnel gRPC client threads) is already
    initialized is documented-unsafe — forked children inherit mutexes held
    mid-operation and can deadlock.  ``forkserver`` is safe (the server is
    fork+exec'd clean before any worker exists and workers fork from IT, not
    from the JAX-initialized parent); ``spawn`` is the fully-fresh fallback.
    Both pickle the dataset once through the pool initializer, which was
    already the contract.  Workers pay a one-time package import.

    Both start methods re-import the launching script in the worker, so
    user entry-point scripts must guard their body with
    ``if __name__ == "__main__":`` — the standard torch-DataLoader-on-spawn
    rule (unguarded scripts get an actionable RuntimeError from the
    iterator instead of a bare BrokenProcessPool)."""
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor

    methods = mp.get_all_start_methods()
    method = "forkserver" if "forkserver" in methods else "spawn"
    seed_base = random.getrandbits(31)
    return ProcessPoolExecutor(max_workers=num_workers,
                               mp_context=mp.get_context(method),
                               initializer=_init_worker,
                               initargs=(dataset, seed_base))


class RandomSampler:
    """Shuffled index order per epoch (torch RandomSampler analog)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __iter__(self):
        ids = list(range(len(self.dataset)))
        random.shuffle(ids)
        return iter(ids)

    def __len__(self):
        return len(self.dataset)


class SequentialSampler:
    def __init__(self, dataset):
        self.dataset = dataset

    def __iter__(self):
        return iter(range(len(self.dataset)))

    def __len__(self):
        return len(self.dataset)


class _PrefetchIterator:
    """Iterates dataset items in sampler order with a worker pool prefetching
    ahead; preserves order.

    ``use_processes=False`` (default): a thread pool — zero-copy handoff,
    scales when the transforms are numpy-heavy (GIL released).
    ``use_processes=True``: a process pool (the torch num_workers model,
    ref data_loader_factory.py:30,50) — the dataset ships to each worker
    once via the pool initializer and items return pickled; scales
    pure-Python/scipy transform pipelines on multicore hosts. Workers
    reseed the transform RNG per process. Prefer lazy (non-preloaded)
    datasets with processes so the one-time dataset transfer stays small;
    workers must do host work only (never touch jax device state).
    """

    def __init__(self, dataset, order: List[int], num_workers: int,
                 prefetch: int = 4, use_processes: bool = False, pool=None,
                 on_pool_broken=None):
        self.dataset = dataset
        self.order = order
        self.num_workers = num_workers
        self.use_processes = use_processes
        self.pool = pool  # externally-owned persistent process pool
        # called when the externally-owned pool breaks (a worker died) so
        # the owner drops it and builds a fresh one next epoch instead of
        # resubmitting to a permanently-broken executor
        self.on_pool_broken = on_pool_broken
        self.prefetch = max(prefetch, num_workers * 2) if num_workers > 0 else 0

    def __iter__(self):
        if self.num_workers <= 0:
            for i in self.order:
                yield self.dataset[i]
            return

        owns_pool = False
        if not self.use_processes:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            owns_pool = True
            dataset = self.dataset
            submit = lambda i: pool.submit(lambda j=i: dataset[j])  # noqa: E731
        else:
            pool = self.pool
            if pool is None:
                pool = _make_process_pool(self.dataset, self.num_workers)
                owns_pool = True
            submit = lambda i: pool.submit(_worker_fetch, i)  # noqa: E731

        def pool_died(e):
            # invalidate the owner's cached pool (it is permanently broken)
            # and raise the actionable error — submit() on a broken executor
            # would otherwise raise a bare BrokenProcessPool forever after
            if self.on_pool_broken is not None:
                try:
                    self.on_pool_broken()
                except Exception:
                    pass
            raise RuntimeError(
                "A loader worker process died. With use_processes=True "
                "workers start via spawn/forkserver, which re-imports "
                "the launching script: entry-point scripts MUST guard "
                "their body with `if __name__ == '__main__':` (the "
                "same rule as torch DataLoader workers on spawn "
                "platforms). If the script is already guarded, the "
                "worker crashed hard (segfault/OOM) — rerun with "
                "PYTHONFAULTHANDLER=1 for a child traceback. The broken "
                "pool was discarded; the next epoch starts a fresh "
                "one.") from e

        try:
            futures = queue_mod.Queue()
            order_iter = iter(self.order)
            submitted = 0
            for _ in range(self.prefetch):
                try:
                    idx = next(order_iter)
                except StopIteration:
                    break
                try:
                    futures.put(submit(idx))
                except BrokenProcessPool as e:
                    pool_died(e)
                submitted += 1
            while submitted > 0:
                fut = futures.get()
                submitted -= 1
                try:
                    idx = next(order_iter)
                    try:
                        futures.put(submit(idx))
                    except BrokenProcessPool as e:
                        pool_died(e)
                    submitted += 1
                except StopIteration:
                    pass
                try:
                    yield fut.result()
                except BrokenProcessPool as e:
                    pool_died(e)
        finally:
            if owns_pool:
                pool.shutdown(wait=True)


class SubjectsLoader:
    """Minimal DataLoader: yields lists of Subjects of size batch_size."""

    def __init__(self, dataset, batch_size: int, sampler, num_workers: int = 0,
                 drop_last: bool = False, use_processes: bool = False,
                 pool=None, on_pool_broken=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.use_processes = use_processes
        # pool may be owned externally (a factory sharing one pool across
        # the loaders it creates, e.g. per validation sweep) — then this
        # loader never shuts it down, and pool breakage is reported to
        # on_pool_broken so the owner discards it too
        self._pool = pool
        self._owns_pool = pool is None
        self._on_pool_broken = on_pool_broken

    def _get_pool(self):
        """Persistent worker pool, reused across epochs (torch
        persistent_workers model) — worker startup with spawn/forkserver
        imports the package, too slow to pay every epoch."""
        if not (self.use_processes and self.num_workers > 0):
            return None
        if self._pool is None:
            self._pool = _make_process_pool(self.dataset, self.num_workers)
            self._owns_pool = True
        return self._pool

    def _discard_pool(self):
        """A worker died: drop the broken executor (reaped without waiting)
        so the next epoch builds a fresh pool instead of failing forever."""
        if self._pool is not None:
            try:
                self._pool.shutdown(wait=False)
            except Exception:
                pass
        self._pool = None
        self._owns_pool = True
        if self._on_pool_broken is not None:
            try:
                self._on_pool_broken()
            except Exception:
                pass

    def close(self):
        if self._pool is not None and self._owns_pool:
            self._pool.shutdown(wait=True)
        self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator[List[Subject]]:
        order = list(iter(self.sampler))
        items = _PrefetchIterator(self.dataset, order, self.num_workers,
                                  use_processes=self.use_processes,
                                  pool=self._get_pool(),
                                  on_pool_broken=self._discard_pool)
        batch = []
        for item in items:
            batch.append(item)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


# ---------------------------------------------------------------------------
# Patch samplers (torchio sampler semantics)
# ---------------------------------------------------------------------------

def _parse_patch_size(patch_size) -> np.ndarray:
    if isinstance(patch_size, int):
        return np.array([patch_size] * 3)
    return np.asarray(patch_size)


def extract_patch(subject: Subject, start: Sequence[int], patch_size) -> Subject:
    """Crop a patch out of a subject via the recorded Crop transform so the
    patch's history stays invertible; stamps 'location' = (w0,h0,d0,w1,h1,d1)
    like torchio's GridSampler patches."""
    import copy

    patch_size = _parse_patch_size(patch_size)
    spatial = np.array(subject.spatial_shape)
    start = np.asarray(start)
    fin = spatial - (start + patch_size)
    cropping = (int(start[0]), int(fin[0]), int(start[1]), int(fin[1]),
                int(start[2]), int(fin[2]))
    patch = copy.deepcopy(subject)
    Crop(cropping)(patch)
    patch["location"] = np.concatenate([start, start + patch_size]).astype(np.int64)
    return patch


class PatchSampler(ABC):
    def __init__(self, patch_size):
        self.patch_size = _parse_patch_size(patch_size)

    @abstractmethod
    def __call__(self, subject: Subject, num_patches: int) -> Iterator[Subject]:
        ...


class UniformSampler(PatchSampler):
    """Uniform random patch locations (tio.UniformSampler analog)."""

    def __call__(self, subject, num_patches):
        spatial = np.array(subject.spatial_shape)
        max_start = spatial - self.patch_size
        if (max_start < 0).any():
            raise RuntimeError(
                f"Patch size {tuple(self.patch_size)} exceeds subject shape {tuple(spatial)}")
        rng = get_rng()
        for _ in range(num_patches):
            start = [int(rng.integers(0, m + 1)) for m in max_start]
            yield extract_patch(subject, start, self.patch_size)


class WeightedSampler(PatchSampler):
    """Probability-map-weighted patch centers (tio.WeightedSampler,
    msseg2.py:148). Centers are drawn from the normalized probability map
    restricted to the valid-center region so the patch always fits."""

    def __init__(self, patch_size, probability_map: str):
        super().__init__(patch_size)
        self.probability_map = probability_map

    def _raw_prob(self, subject) -> np.ndarray:
        """Unnormalized center-probability volume; subclass hook."""
        return np.asarray(subject[self.probability_map].data)[0].astype(np.float64)

    def _valid_center_probs(self, subject) -> np.ndarray:
        prob = self._raw_prob(subject)
        spatial = np.array(prob.shape)
        if (spatial < self.patch_size).any():
            raise RuntimeError(
                f"Patch size {tuple(self.patch_size)} exceeds subject shape {tuple(spatial)}")
        # zero out probabilities whose patch would not fit (center-based;
        # for even patch sizes the torchio convention: start = center - size//2,
        # valid centers in [size//2, spatial - (size - size//2)] inclusive
        lo = self.patch_size // 2
        hi = spatial - (self.patch_size - self.patch_size // 2)
        masked = np.zeros_like(prob)
        sl = tuple(slice(int(l), int(h) + 1) for l, h in zip(lo, hi))
        masked[sl] = prob[sl]
        total = masked.sum()
        if total <= 0:
            # degenerate map: fall back to uniform over valid centers
            masked[sl] = 1.0
            total = masked.sum()
        return masked / total

    def __call__(self, subject, num_patches):
        probs = self._valid_center_probs(subject)
        flat = probs.ravel()
        rng = get_rng()
        idx = rng.choice(flat.shape[0], size=num_patches, p=flat)
        centers = np.stack(np.unravel_index(idx, probs.shape), axis=1)
        for center in centers:
            start = center - self.patch_size // 2
            yield extract_patch(subject, start, self.patch_size)


class LabelSampler(WeightedSampler):
    """Patch centers drawn from label-positive voxels (tio.LabelSampler
    analog): the probability map is the label mask itself."""

    def __init__(self, patch_size, label_name: str, label_probabilities=None):
        PatchSampler.__init__(self, patch_size)
        self.probability_map = label_name
        self.label_probabilities = label_probabilities

    def _raw_prob(self, subject):
        label = np.asarray(subject[self.probability_map].data)[0]
        if self.label_probabilities:
            prob = np.zeros(label.shape, dtype=np.float64)
            for value, weight in self.label_probabilities.items():
                prob[label == value] = weight
            return prob
        return (label > 0).astype(np.float64)


class PatchQueue:
    """tio.Queue semantics (data_loader_factory.py:45-51): a shuffled buffer
    of patches filled by worker threads pulling transformed subjects and
    sampling ``samples_per_volume`` patches each."""

    def __init__(self, dataset, max_length: int, samples_per_volume: int,
                 sampler: PatchSampler, num_workers: int = 0,
                 shuffle_subjects: bool = True, shuffle_patches: bool = True,
                 use_processes: bool = False, pool=None,
                 on_pool_broken=None):
        self.dataset = dataset
        self.max_length = max_length
        self.samples_per_volume = samples_per_volume
        self.sampler = sampler
        self.num_workers = num_workers
        self.shuffle_subjects = shuffle_subjects
        self.shuffle_patches = shuffle_patches
        self.use_processes = use_processes
        self._pool = pool
        self._owns_pool = pool is None
        self._on_pool_broken = on_pool_broken

    def __len__(self):
        return len(self.dataset) * self.samples_per_volume

    def _get_pool(self):
        if not (self.use_processes and self.num_workers > 0):
            return None
        if self._pool is None:
            self._pool = _make_process_pool(self.dataset, self.num_workers)
            self._owns_pool = True
        return self._pool

    def _discard_pool(self):
        if self._pool is not None:
            try:
                self._pool.shutdown(wait=False)
            except Exception:
                pass
        self._pool = None
        self._owns_pool = True
        if self._on_pool_broken is not None:
            try:
                self._on_pool_broken()
            except Exception:
                pass

    def close(self):
        if self._pool is not None and self._owns_pool:
            self._pool.shutdown(wait=True)
        self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _subject_iterator(self):
        order = list(range(len(self.dataset)))
        if self.shuffle_subjects:
            random.shuffle(order)
        return _PrefetchIterator(self.dataset, order, self.num_workers,
                                 use_processes=self.use_processes,
                                 pool=self._get_pool(),
                                 on_pool_broken=self._discard_pool)

    def __iter__(self) -> Iterator[Subject]:
        buffer: List[Subject] = []
        for subject in self._subject_iterator():
            for patch in self.sampler(subject, self.samples_per_volume):
                buffer.append(patch)
            if len(buffer) >= self.max_length:
                if self.shuffle_patches:
                    random.shuffle(buffer)
                while buffer:
                    yield buffer.pop()
        if self.shuffle_patches:
            random.shuffle(buffer)
        while buffer:
            yield buffer.pop()


class _QueueLoader:
    """Batches patches out of a PatchQueue."""

    def __init__(self, queue: PatchQueue, batch_size: int):
        self.queue = queue
        self.batch_size = batch_size

    def __iter__(self):
        batch = []
        for patch in self.queue:
            batch.append(patch)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    def __len__(self):
        return (len(self.queue) + self.batch_size - 1) // self.batch_size


# ---------------------------------------------------------------------------
# Factories (the configuration surface, ref data_loader_factory.py:10-54)
# ---------------------------------------------------------------------------

class DataLoaderFactory(ABC):
    @abstractmethod
    def get_data_loader(self, dataset, batch_size: int, num_workers: int):
        ...

    # ---- persistent process pools (shared across the loaders a factory
    # creates) -----------------------------------------------------------
    # A scheduled validation sweep builds a NEW loader each time; worker
    # startup (spawn/forkserver + dataset pickle) is far too slow to pay
    # per sweep, so the pool lives HERE, keyed by dataset identity, and is
    # handed to each loader non-owning. The pooled workers hold the dataset
    # as pickled at first use — safe for the trainer (set_cohort applies
    # the same filter every sweep); call close_pools() after mutating a
    # dataset in a way that changes indexing. Pools are process-local
    # state: they are dropped on pickling (factories travel inside Context
    # checkpoints).

    def _pool_for(self, dataset, num_workers: int):
        if not (getattr(self, "use_processes", False) and num_workers > 0):
            return None
        import weakref

        pools = self.__dict__.setdefault("_pools", {})
        key = id(dataset)
        entry = pools.get(key)
        if entry is not None:
            ref, pool = entry
            if ref() is dataset:  # guard against id() reuse after gc
                return pool
            pool.shutdown(wait=False)
        pool = _make_process_pool(dataset, num_workers)
        try:
            pools[key] = (weakref.ref(dataset), pool)
        except TypeError:  # non-weakrefable dataset: pool stays per-loader
            pool.shutdown(wait=False)
            return None
        return pool

    def _drop_pool(self, dataset):
        self.__dict__.get("_pools", {}).pop(id(dataset), None)

    def close_pools(self):
        for _, p in self.__dict__.get("_pools", {}).values():
            p.shutdown(wait=True)
        self.__dict__.pop("_pools", None)

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_pools", None)
        return state


class StandardDataLoader(DataLoaderFactory):
    def __init__(self, sampler=SequentialSampler, use_processes: bool = False):
        self.sampler = sampler
        # process workers (torch num_workers model) instead of threads:
        # scales pure-Python/scipy transform pipelines on multicore hosts
        self.use_processes = use_processes

    def get_data_loader(self, dataset, batch_size: int, num_workers: int = 0):
        return SubjectsLoader(dataset=dataset, batch_size=batch_size,
                              sampler=self.sampler(dataset),
                              num_workers=num_workers,
                              use_processes=self.use_processes,
                              pool=self._pool_for(dataset, num_workers),
                              on_pool_broken=lambda: self._drop_pool(dataset))


class PatchDataLoader(DataLoaderFactory):
    def __init__(self, max_length: int, samples_per_volume: int,
                 sampler: PatchSampler, use_processes: bool = False):
        self.max_length = max_length
        self.samples_per_volume = samples_per_volume
        self.sampler = sampler
        self.use_processes = use_processes

    def get_data_loader(self, dataset, batch_size: int, num_workers: int = 0):
        queue = PatchQueue(dataset, max_length=self.max_length,
                           samples_per_volume=self.samples_per_volume,
                           sampler=self.sampler, num_workers=num_workers,
                           use_processes=self.use_processes,
                           pool=self._pool_for(dataset, num_workers),
                           on_pool_broken=lambda: self._drop_pool(dataset))
        return _QueueLoader(queue, batch_size)
