"""Device-resident dataset cache (data/device_cache.py) + trainer integration.

The cache path must train identically to the per-iteration-upload path:
same sampler order (global python RNG), same batch contents, same PRNG key
stream -> matching losses.
"""
import json
import random

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.data.device_cache import DeviceDataCache
from segmentation_pipeline_tpu.loggers.file_logger import FileLogger
from tests.test_trainer import build_context, build_dataset


class TestDeviceDataCache:
    def _subjects(self, n=3, shape=(8, 6, 4), classes=2):
        rng = np.random.default_rng(0)
        subs = []
        for i in range(n):
            ids = rng.integers(0, classes, size=shape)
            onehot = np.eye(classes, dtype=np.float32)[ids]
            onehot = np.moveaxis(onehot, -1, 0)

            class Img:
                def __init__(self, data):
                    self.data = data

            subs.append({"X": Img(rng.normal(size=(3, *shape)).astype(np.float32)),
                         "y": Img(onehot)})
        return subs

    def test_gather_matches_host_collate(self):
        subs = self._subjects()
        cache = DeviceDataCache(subs)
        batch = cache.gather([2, 0])
        X = np.asarray(batch["X"])
        y = np.asarray(batch["y"])
        want_X = np.stack([np.moveaxis(subs[i]["X"].data, 0, -1) for i in (2, 0)])
        want_y = np.stack([np.moveaxis(subs[i]["y"].data, 0, -1) for i in (2, 0)])
        np.testing.assert_array_equal(X, want_X)
        np.testing.assert_array_equal(y, want_y)  # one-hot roundtrip exact

    def test_onehot_stored_as_uint8_ids(self):
        subs = self._subjects()
        cache = DeviceDataCache(subs)
        assert cache._is_onehot
        assert np.asarray(cache._y).dtype == np.uint8

    def test_soft_labels_stored_full(self):
        subs = self._subjects()
        subs[0]["y"].data = subs[0]["y"].data * 0.7  # not one-hot
        cache = DeviceDataCache(subs)
        assert not cache._is_onehot
        batch = cache.gather([0])
        np.testing.assert_allclose(
            np.asarray(batch["y"])[0],
            np.moveaxis(subs[0]["y"].data, 0, -1), rtol=1e-6)

    def test_expand_onehot_false_returns_ids(self):
        subs = self._subjects()
        cache = DeviceDataCache(subs, expand_onehot=False)
        batch = cache.gather([1, 2])
        y = np.asarray(batch["y"])
        assert y.dtype == np.uint8 and y.ndim == 4
        want = np.stack([np.argmax(subs[i]["y"].data, axis=0) for i in (1, 2)])
        np.testing.assert_array_equal(y, want)

    def test_bf16_storage(self):
        import jax.numpy as jnp

        cache = DeviceDataCache(self._subjects(), x_dtype=jnp.bfloat16)
        assert cache.gather([0])["X"].dtype == jnp.bfloat16

    def test_budget_guard(self):
        with pytest.raises(ValueError, match="cache budget"):
            DeviceDataCache(self._subjects(), max_bytes=10)

    def test_ragged_shapes_clear_error(self):
        subs = self._subjects()
        subs[1]["X"].data = subs[1]["X"].data[:, :-1]
        with pytest.raises(ValueError, match="uniform subject shapes"):
            DeviceDataCache(subs)


class TestTrainerDeviceCache:
    def test_cache_path_matches_standard_path(self, tmp_path):
        losses = {}
        for mode in ("standard", "cache"):
            root = tmp_path / f"ds-{mode}"
            logs = tmp_path / f"logs-{mode}"
            build_dataset(root)
            context = build_context(root, logs)
            if mode == "cache":
                context.update_component("trainer", device_cache=True)
            context.init_components()
            random.seed(1234)  # sampler shuffle order must match
            logger = FileLogger(str(logs))
            context.trainer.train(context, max_iterations=6, logger=logger,
                                  pretransform_training_data=True)
            metrics = [json.loads(l) for l in
                       open(logger.run_dir / "metrics.jsonl")]
            losses[mode] = [m["loss"] for m in metrics]
        np.testing.assert_allclose(losses["cache"], losses["standard"],
                                   rtol=1e-5)

    def test_cache_with_training_evaluators_and_device_aug(self, tmp_path):
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.update_component(
            "trainer", device_cache=True,
            device_augmentation={"affine_p": 0.5, "noise_p": 0.5})
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=11, logger=logger)
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 11
        assert all(np.isfinite(m["loss"]) for m in metrics)
        # scheduled training evaluator ran on materialized cached subjects
        assert any("training_segmentation_eval" in m for m in metrics)

    def test_cache_rejects_unknown_factory(self, tmp_path):
        class CustomFactory(sp.DataLoaderFactory):
            def get_data_loader(self, dataset, batch_size, num_workers=0):
                raise NotImplementedError

        root = tmp_path / "ds"
        build_dataset(root)
        context = build_context(root, tmp_path / "logs")
        context.update_component("trainer", device_cache=True,
                                 train_dataloader_factory=CustomFactory())
        context.init_components()
        with pytest.raises(ValueError, match="device_cache supports"):
            context.trainer.train(context, max_iterations=1)


class TestDevicePatchCache:
    def _patch_subjects(self, shapes=((24, 20, 16), (20, 18, 16)), classes=2):
        from segmentation_pipeline_tpu.core.subject import (LabelMap,
                                                           ScalarImage, Subject)

        rng = np.random.default_rng(0)
        subs = []
        for i, shape in enumerate(shapes):
            s = Subject(name=f"s{i}", folder="/tmp")
            s["X"] = ScalarImage(
                tensor=rng.normal(size=(2, *shape)).astype(np.float32))
            ids = np.zeros(shape, np.int64)
            ids[4:10, 4:10, 4:10] = 1
            onehot = np.moveaxis(np.eye(classes, dtype=np.float32)[ids], -1, 0)
            s["y"] = LabelMap(tensor=onehot, label_values={"fg": 1})
            prob = np.zeros((1, *shape), np.float32)
            prob[0, 6:12, 6:12, 6:10] = 1.0  # centers restricted here
            s["patch_probability"] = ScalarImage(tensor=prob)
            subs.append(s)
        return subs

    def _cache(self, subs, patch_size=(8, 8, 8)):
        from segmentation_pipeline_tpu.data.device_cache import DevicePatchCache

        sampler = sp.WeightedSampler(patch_size=patch_size,
                                     probability_map="patch_probability")
        return DevicePatchCache(subs, sampler=sampler), sampler

    def test_device_patches_match_host_extraction(self):
        import jax

        from segmentation_pipeline_tpu.data.loader import extract_patch

        subs = self._patch_subjects()
        cache, sampler = self._cache(subs)
        idx = [0, 1, 1, 0]
        batch, starts = cache.sample(idx, jax.random.PRNGKey(7))
        starts = np.asarray(starts)
        X = np.asarray(batch["X"])
        y = np.asarray(batch["y"])
        for k, i in enumerate(idx):
            host = extract_patch(subs[i], starts[k], (8, 8, 8))
            want_X = np.moveaxis(np.asarray(host["X"].data), 0, -1)
            want_y = np.moveaxis(np.asarray(host["y"].data), 0, -1)
            np.testing.assert_array_equal(X[k], want_X)
            np.testing.assert_array_equal(y[k], want_y)

    def test_expand_onehot_false_returns_id_patches(self):
        import jax

        from segmentation_pipeline_tpu.data.device_cache import DevicePatchCache

        subs = self._patch_subjects()
        sampler = sp.WeightedSampler(patch_size=(8, 8, 8),
                                     probability_map="patch_probability")
        ref, _ = self._cache(subs)
        ids_cache = DevicePatchCache(subs, sampler=sampler,
                                     expand_onehot=False)
        key = jax.random.PRNGKey(5)
        ref_batch, ref_starts = ref.sample([0, 1], key)
        id_batch, id_starts = ids_cache.sample([0, 1], key)
        np.testing.assert_array_equal(np.asarray(ref_starts),
                                      np.asarray(id_starts))
        y = np.asarray(id_batch["y"])
        assert y.dtype == np.uint8 and y.ndim == 4
        np.testing.assert_array_equal(
            y, np.argmax(np.asarray(ref_batch["y"]), -1))

    def test_centers_follow_probability_map(self):
        import jax

        subs = self._patch_subjects()
        cache, sampler = self._cache(subs)
        all_centers = []
        for t in range(20):
            _, starts = cache.sample([0] * 8, jax.random.PRNGKey(t))
            all_centers.append(np.asarray(starts) + np.array([4, 4, 4]))
        centers = np.concatenate(all_centers)
        # probability mass is 1 only inside [6,12)x[6,12)x[6,10)
        assert (centers[:, 0] >= 6).all() and (centers[:, 0] < 12).all()
        assert (centers[:, 1] >= 6).all() and (centers[:, 1] < 12).all()
        assert (centers[:, 2] >= 6).all() and (centers[:, 2] < 10).all()
        # and the draw actually varies
        assert len(np.unique(centers, axis=0)) > 10

    def test_padding_never_sampled(self):
        import jax

        subs = self._patch_subjects()  # ragged: second subject smaller
        cache, _ = self._cache(subs)
        _, starts = cache.sample([1] * 16, jax.random.PRNGKey(3))
        starts = np.asarray(starts)
        ends = starts + np.array([8, 8, 8])
        true_shape = np.array([20, 18, 16])
        assert (ends <= true_shape).all()

    def test_trainer_patch_cache_end_to_end(self, tmp_path):
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        # switch to patch training with a label-derived probability map
        transforms = {"default": sp.Compose([
            sp.RescaleIntensity((-1, 1), (0.5, 99.5)),
            sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                                 new_image_name="X"),
            sp.RenameProperty(old_name="seg", new_name="y"),
            sp.ImageFromLabels(new_image_name="patch_probability",
                               label_weights=[("y", "fg", 100)]),
            sp.CustomOneHot(include=["y"]),
        ])}
        context.update_component("dataset", transforms=transforms)
        context.update_component(
            "trainer", device_cache=True,
            train_dataloader_factory=sp.PatchDataLoader(
                max_length=16, samples_per_volume=4,
                sampler=sp.WeightedSampler(
                    patch_size=(8, 8, 8),
                    probability_map="patch_probability")))
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=11, logger=logger)
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 11
        assert all(np.isfinite(m["loss"]) for m in metrics)
        # training evaluator ran on host patches recreated from device starts
        evald = [m for m in metrics if "training_segmentation_eval" in m]
        assert evald


class TestPatchBatchDegrade:
    def test_patch_predict_halves_batch_on_resource_exhaustion(
            self, tmp_path, monkeypatch):
        """A window program too big for the device/compiler degrades to a
        smaller patch batch instead of crashing (weak item r1-#7)."""
        import segmentation_pipeline_tpu.prediction as prediction_mod
        from segmentation_pipeline_tpu.core.subject import ScalarImage, Subject

        real = prediction_mod.sliding_window_inference
        calls = []

        def flaky(volume, model_fn, patch_size, patch_overlap, patch_batch,
                  **kw):
            calls.append(patch_batch)
            if patch_batch > 2:
                import jax

                # the degrade loop only engages on the runtime's own error
                # type, not on arbitrary exceptions mentioning memory
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED: Attempting to allocate 21.37G")
            return real(volume, model_fn, patch_size=patch_size,
                        patch_overlap=patch_overlap, patch_batch=patch_batch,
                        **kw)

        monkeypatch.setattr(prediction_mod, "sliding_window_inference", flaky)

        model = sp.SegModel(sp.NestedResUNet(input_channels=1,
                                             output_channels=2, filters=4))
        rng = np.random.default_rng(0)
        s = Subject(name="s0", folder="/tmp")
        s["X"] = ScalarImage(tensor=rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
        pred = sp.PatchPredict(image_names=["X"], patch_size=(8, 8, 8),
                               patch_overlap=2, patch_batch_size=8)
        out, batch = pred.predict(model, [s])
        assert calls == [8, 4, 2]  # halved until it fit
        assert batch["y_pred"].shape == (1, 2, 16, 16, 8)
        assert pred._effective_patch_batch == 2  # remembered

        # second subject starts straight at the working batch size
        calls.clear()
        s2 = Subject(name="s1", folder="/tmp")
        s2["X"] = ScalarImage(tensor=rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
        pred.predict(model, [s2])
        assert calls == [2]

    def test_non_resource_errors_still_raise(self, tmp_path, monkeypatch):
        import segmentation_pipeline_tpu.prediction as prediction_mod
        from segmentation_pipeline_tpu.core.subject import ScalarImage, Subject

        def broken(*a, **kw):
            raise RuntimeError("shape mismatch: genuine bug")

        monkeypatch.setattr(prediction_mod, "sliding_window_inference", broken)
        model = sp.SegModel(sp.NestedResUNet(input_channels=1,
                                             output_channels=2, filters=4))
        s = Subject(name="s0", folder="/tmp")
        s["X"] = ScalarImage(tensor=np.zeros((1, 16, 16, 8), np.float32))
        pred = sp.PatchPredict(image_names=["X"], patch_size=(8, 8, 8),
                               patch_batch_size=8)
        with pytest.raises(RuntimeError, match="genuine bug"):
            pred.predict(model, [s])

    def test_memory_wording_in_foreign_errors_still_raises(self, monkeypatch):
        """A non-runtime exception whose text merely mentions memory (host
        MemoryError, tunnel error quoting a device log) must raise, not
        enter the halving loop."""
        import segmentation_pipeline_tpu.prediction as prediction_mod
        from segmentation_pipeline_tpu.core.subject import ScalarImage, Subject

        def host_oom(*a, **kw):
            raise RuntimeError("np.stack failed: out of memory on host")

        monkeypatch.setattr(prediction_mod, "sliding_window_inference",
                            host_oom)
        model = sp.SegModel(sp.NestedResUNet(input_channels=1,
                                             output_channels=2, filters=4))
        s = Subject(name="s0", folder="/tmp")
        s["X"] = ScalarImage(tensor=np.zeros((1, 16, 16, 8), np.float32))
        pred = sp.PatchPredict(image_names=["X"], patch_size=(8, 8, 8),
                               patch_batch_size=8)
        with pytest.raises(RuntimeError, match="on host"):
            pred.predict(model, [s])


class TestFullBatchesAcrossEpochTails:
    def test_gather_always_full_batch(self, tmp_path, monkeypatch):
        """3 training subjects at batch 2: the epoch tail must CARRY into
        the next epoch's permutation, never shrink the gather — a tail
        batch would crash the data-axis sharding on a mesh and recompile
        the step on one device."""
        from segmentation_pipeline_tpu.data import device_cache as dc

        sizes = []
        orig = dc.DeviceDataCache.gather

        def spy(self, idx):
            sizes.append(len(list(idx)))
            return orig(self, idx)

        monkeypatch.setattr(dc.DeviceDataCache, "gather", spy)
        root = tmp_path / "ds"
        build_dataset(root, n=7)  # folds 0,1,...: 3 training subjects
        context = build_context(root, tmp_path / "logs")
        context.update_component("trainer", device_cache=True)
        context.init_components()
        context.trainer.train(context, max_iterations=7,
                              logger=sp.NonLogger(),
                              pretransform_training_data=True)
        assert len(sizes) >= 7 and all(s == 2 for s in sizes), sizes


class TestTransformSurvivesPreload:
    """Round-5 regression (severe, silent): set_all_subjects' cohort-view
    refresh re-derived self.transform from the transforms dict, so the
    trainer's device_augmentation='auto' swap onto the deterministic
    remainder was CLOBBERED and the device cache was pretransformed with
    the DECLARED STOCHASTIC pipeline — one frozen random draw baked into
    HBM with the fused device stages re-augmenting on top."""

    def _folder(self, tmp_path):
        build_dataset(tmp_path / "ds")
        loader = sp.ComposeLoaders([
            sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                           image_constructor=sp.ScalarImage),
            sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                           image_constructor=sp.LabelMap,
                           label_values={"fg": 1}),
            sp.AttributeLoader(glob_pattern="attributes.*"),
        ])
        declared = sp.Compose([
            sp.RandomFlip(axes=(0, 1, 2)),
            sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                                 new_image_name="X"),
        ])
        return sp.SubjectFolder(
            root=str(tmp_path / "ds"), subject_path="subjects",
            subject_loader=loader, cohorts={},
            transforms={"default": declared})

    def test_manual_transform_survives_preload(self, tmp_path):
        folder = self._folder(tmp_path)
        manual = sp.Compose([
            sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                                 new_image_name="X")])
        folder.set_transform(manual)
        folder.preload_subjects()
        assert folder.transform is manual, \
            "preload clobbered the manually installed transform"
        folder.preload_and_transform_subjects()
        for s in folder.subjects:
            names = [type(r.transform).__name__ for r in s.history]
            assert names == ["ConcatenateImages"], names

    def test_explicit_set_cohort_still_switches_transform(self, tmp_path):
        folder = self._folder(tmp_path)
        manual = sp.Compose([sp.ReplaceNan()])
        folder.set_transform(manual)
        folder.set_cohort("all")
        assert folder.transform is not manual  # explicit switches win

    def test_auto_cache_pretransform_is_deterministic(self, tmp_path):
        """End to end: auto + device_cache must bake ONLY the deterministic
        remainder into the cache — no stochastic record on any cached
        subject's history tape."""
        from tests.test_trainer_extras import TestAutoAugReentry

        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        ctx = TestAutoAugReentry()._aug_context(root, logs)
        ctx.init_components()
        ctx.trainer.train(ctx, max_iterations=1,
                          logger=FileLogger(str(logs)))
        ds = ctx.trainer._cache_dataset
        assert ds._pretransformed
        stochastic = {"Flip", "RandomFlip", "RandomNoise"}
        for s in ds.subjects:
            names = {type(r.transform).__name__ for r in s.history}
            assert not (names & stochastic), \
                f"stochastic draw frozen into the device cache: {names}"
