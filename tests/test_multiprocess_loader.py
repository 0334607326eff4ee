"""Multiprocess loader workers (the torch num_workers model,
ref data_loader_factory.py:30,50): correctness, order preservation,
per-worker RNG, and (on multicore hosts) scaling."""
import os
import time

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.data.loader import _PrefetchIterator
from tests.test_trainer import build_dataset


def _folder(root, transform=None):
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap, label_values={"fg": 1}),
    ])
    transforms = {"default": transform} if transform is not None else None
    return sp.SubjectFolder(root=str(root), subject_path="subjects",
                            subject_loader=loader,
                            cohorts={"all": sp.RequireAttributes(["t1"])},
                            transforms=transforms)


class TestProcessWorkers:
    def test_order_and_content_match_serial(self, tmp_path):
        build_dataset(tmp_path, n=6)
        ds = _folder(tmp_path, sp.RescaleIntensity((-1, 1), (0.5, 99.5)))
        serial = [ds[i] for i in range(len(ds))]
        loaded = list(_PrefetchIterator(ds, list(range(len(ds))),
                                        num_workers=2, use_processes=True))
        assert [s["name"] for s in loaded] == [s["name"] for s in serial]
        for a, b in zip(loaded, serial):
            np.testing.assert_allclose(np.asarray(a["t1"].data),
                                       np.asarray(b["t1"].data), rtol=1e-6)
            # the deterministic transform ran in the worker
            assert a.history and type(a.history[0].transform).__name__ == \
                "RescaleIntensity"

    def test_worker_rng_differs_across_processes(self, tmp_path):
        build_dataset(tmp_path, n=1)
        ds = _folder(tmp_path, sp.RandomNoise(std=(0.5, 0.5)))
        # same subject fetched 4 times by 2 process workers: the noise draw
        # must differ (forked workers reseed; identical RNG would silently
        # halve augmentation diversity)
        items = list(_PrefetchIterator(ds, [0, 0, 0, 0], num_workers=2,
                                       use_processes=True))
        vols = [np.asarray(s["t1"].data) for s in items]
        diffs = [np.abs(vols[0] - v).max() for v in vols[1:]]
        assert max(diffs) > 1e-3

    def test_subjects_loader_process_batches(self, tmp_path):
        build_dataset(tmp_path, n=5)
        ds = _folder(tmp_path)
        factory = sp.StandardDataLoader(sampler=sp.SequentialSampler,
                                        use_processes=True)
        loader = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        batches = list(loader)
        assert [len(b) for b in batches] == [2, 2, 1]
        names = [s["name"] for b in batches for s in b]
        assert names == sorted(names)

    def test_patch_queue_process_workers(self, tmp_path):
        build_dataset(tmp_path, n=3)
        ds = _folder(tmp_path)
        factory = sp.PatchDataLoader(
            max_length=6, samples_per_volume=2,
            sampler=sp.UniformSampler((8, 8, 4)), use_processes=True)
        loader = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        patches = [p for b in loader for p in b]
        assert len(patches) == 6
        for p in patches:
            assert tuple(np.asarray(p["t1"].data).shape) == (1, 8, 8, 4)

    @pytest.mark.slow
    @pytest.mark.skipif((os.cpu_count() or 1) < 4,
                        reason="scaling needs a multicore host (this box: "
                               f"{os.cpu_count()} core(s)); correctness is "
                               "covered above")
    def test_processes_beat_single_thread_on_cpu_heavy_transform(self, tmp_path):
        class PyHeavy(sp.Transform):
            """Deliberately GIL-bound: pure-Python voxel loop."""

            def apply_transform(self, subject):
                data = np.asarray(subject["t1"].data)
                acc = 0.0
                for v in data.ravel()[:200_000]:
                    acc += float(v) * 1.0000001
                subject["acc"] = acc
                return subject

        build_dataset(tmp_path, n=8)
        ds = _folder(tmp_path, PyHeavy())
        order = list(range(len(ds)))

        t0 = time.time()
        list(_PrefetchIterator(ds, order, num_workers=0))
        serial = time.time() - t0

        t0 = time.time()
        list(_PrefetchIterator(ds, order, num_workers=4, use_processes=True))
        procs = time.time() - t0
        assert procs < serial * 0.7, (serial, procs)


class TestPoolLifecycle:
    def test_factory_shares_pool_across_loaders(self, tmp_path):
        """A scheduled sweep creates a new loader per call; the pool must
        persist on the FACTORY (keyed by dataset) so workers don't restart
        per sweep — and each loader must still iterate correctly."""
        build_dataset(tmp_path, n=4)
        ds = _folder(tmp_path)
        factory = sp.StandardDataLoader(sampler=sp.SequentialSampler,
                                        use_processes=True)
        l1 = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        l2 = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        assert l1._pool is l2._pool and l1._pool is not None
        assert not l1._owns_pool
        names1 = [s["name"] for b in l1 for s in b]
        names2 = [s["name"] for b in l2 for s in b]
        assert names1 == names2 and len(names1) == 4
        # non-owning loader close() must NOT kill the factory's pool
        l1.close()
        l3 = factory.get_data_loader(ds, batch_size=4, num_workers=2)
        assert l3._pool is l2._pool
        assert [s["name"] for b in l3 for s in b] == names1
        factory.close_pools()
        assert "_pools" not in factory.__dict__

    def test_factory_pickles_without_pools(self, tmp_path):
        import pickle

        build_dataset(tmp_path, n=2)
        ds = _folder(tmp_path)
        factory = sp.StandardDataLoader(sampler=sp.SequentialSampler,
                                        use_processes=True)
        factory.get_data_loader(ds, batch_size=1, num_workers=1)
        clone = pickle.loads(pickle.dumps(factory))
        assert "_pools" not in clone.__dict__
        factory.close_pools()

    def test_broken_pool_is_discarded_and_recovers(self, tmp_path):
        """After a worker dies the owner must drop the broken executor and
        the next epoch must succeed on a fresh pool (previously every
        subsequent epoch raised a bare BrokenProcessPool forever)."""
        import segmentation_pipeline_tpu.data.loader as L

        build_dataset(tmp_path, n=4)
        ds = _folder(tmp_path)
        factory = sp.StandardDataLoader(sampler=sp.SequentialSampler,
                                        use_processes=True)
        loader = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        pool = loader._pool
        # kill the pool's workers mid-flight: hard-exit inside a task
        fut = pool.submit(os._exit, 1)
        with pytest.raises(Exception):
            fut.result(timeout=30)
        with pytest.raises(RuntimeError, match="worker process died"):
            list(loader)
        # the factory dropped the broken pool; a new loader gets a fresh
        # one and iterates fine
        loader2 = factory.get_data_loader(ds, batch_size=2, num_workers=2)
        assert loader2._pool is not pool and loader2._pool is not None
        names = [s["name"] for b in loader2 for s in b]
        assert len(names) == 4
        factory.close_pools()
