"""Loader, sliding-window, predictor, evaluator, post-processing tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.data.loader import (
    PatchDataLoader,
    PatchQueue,
    RandomSampler,
    SequentialSampler,
    StandardDataLoader,
    UniformSampler,
    WeightedSampler,
)
from segmentation_pipeline_tpu.evaluators import (
    InstanceSegmentationEvaluator,
    LabeledTensor,
    LabelMapEvaluator,
    SegmentationEvaluator,
    msseg_detection_test,
)
from segmentation_pipeline_tpu.ops.sliding_window import (
    grid_locations,
    sliding_window_inference,
)
from segmentation_pipeline_tpu.post_processing import (
    keep_components,
    remove_holes,
    remove_small_components,
)
from segmentation_pipeline_tpu.prediction import (
    PatchPredict,
    StandardPredict,
    add_evaluation_labels,
    reverse_split_and_flip,
    split_and_flip,
)
from tests.conftest import make_subject


class _ListDataset:
    def __init__(self, subjects):
        self.subjects = subjects

    def __len__(self):
        return len(self.subjects)

    def __getitem__(self, i):
        import copy

        return copy.deepcopy(self.subjects[i])


class TestLoaders:
    def test_standard_loader_batches(self):
        ds = _ListDataset([make_subject(seed=i, name=f"s{i}") for i in range(5)])
        loader = StandardDataLoader(sampler=SequentialSampler).get_data_loader(ds, 2)
        batches = list(loader)
        assert [len(b) for b in batches] == [2, 2, 1]
        assert batches[0][0]["name"] == "s0"

    def test_standard_loader_workers(self):
        ds = _ListDataset([make_subject(seed=i, name=f"s{i}") for i in range(6)])
        loader = StandardDataLoader(sampler=SequentialSampler).get_data_loader(
            ds, 2, num_workers=3)
        names = [s["name"] for b in loader for s in b]
        assert names == [f"s{i}" for i in range(6)]  # order preserved

    def test_uniform_patch_sampler(self):
        s = make_subject(spatial_shape=(20, 20, 20))
        patches = list(UniformSampler(8)(s, 3))
        assert len(patches) == 3
        for p in patches:
            assert p["img"].spatial_shape == (8, 8, 8)
            assert len(p.history) == 1  # the recorded Crop
            assert "location" in p

    def test_weighted_sampler_respects_probability(self):
        s = make_subject(spatial_shape=(24, 24, 24))
        prob = np.zeros((1, 24, 24, 24), np.float32)
        prob[0, 12, 12, 12] = 1.0  # all mass at one voxel
        s["patch_probability"] = ScalarImage(tensor=prob, affine=np.eye(4))
        patches = list(WeightedSampler(8, "patch_probability")(s, 4))
        for p in patches:
            loc = p["location"]
            # center 12 with patch 8 -> start 8
            assert tuple(loc[:3]) == (8, 8, 8)

    def test_patch_queue_and_factory(self):
        subjects = [make_subject(seed=i, name=f"s{i}", spatial_shape=(16, 16, 16))
                    for i in range(3)]
        ds = _ListDataset(subjects)
        factory = PatchDataLoader(max_length=10, samples_per_volume=2,
                                  sampler=UniformSampler(8))
        loader = factory.get_data_loader(ds, batch_size=4)
        batches = list(loader)
        total = sum(len(b) for b in batches)
        assert total == 6
        assert all(p["img"].spatial_shape == (8, 8, 8) for b in batches for p in b)


class TestSlidingWindow:
    def test_grid_locations_cover(self):
        locs = grid_locations((20, 16, 8), (8, 8, 8), (4, 4, 0))
        locs = np.asarray(locs)
        assert locs.min() == 0
        assert (locs[:, 0].max(), locs[:, 1].max(), locs[:, 2].max()) == (12, 8, 0)

    def test_identity_model_aggregation_exact(self):
        """Aggregating identity-model patches must reproduce the volume."""
        rng = np.random.default_rng(0)
        vol = rng.normal(size=(2, 20, 16, 8)).astype(np.float32)

        def model_fn(p):
            return p

        out = sliding_window_inference(vol, model_fn, patch_size=8,
                                       patch_overlap=4, patch_batch=4)
        np.testing.assert_allclose(np.asarray(out), vol, atol=1e-5)

    def test_hann_mode_identity(self):
        rng = np.random.default_rng(1)
        vol = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        out = sliding_window_inference(vol, lambda p: p, patch_size=8,
                                       patch_overlap=4, patch_batch=2, mode="hann")
        np.testing.assert_allclose(np.asarray(out), vol, atol=1e-4)


class TestPredictors:
    def _model(self):
        """Fake 'model': threshold channel 0 into 2-class probs."""

        def model(x):
            x = jnp.asarray(x)
            fg = (x[:, 0:1] > 0).astype(jnp.float32)
            return jnp.concatenate([1 - fg, fg], axis=1)

        return model

    def test_split_and_flip_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 8, 6, 4)))
        y = reverse_split_and_flip(split_and_flip(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_standard_predict(self):
        subjects = [make_subject(seed=i, name=f"s{i}") for i in range(2)]
        for s in subjects:
            s["X"] = s["img"]
        out_subjects, batch = StandardPredict(image_names=["X"]).predict(
            self._model(), subjects, label_attributes={"label_values": {"fg": 1}})
        assert "y_pred" in out_subjects[0]
        assert out_subjects[0]["y_pred"].data.shape[0] == 2
        assert batch["y_pred"].shape == (2, 2, 24, 20, 16)
        assert out_subjects[0]["y_pred"]["label_values"] == {"fg": 1}

    def test_patch_predict_matches_standard_for_identityish_model(self):
        s = make_subject(spatial_shape=(16, 16, 16), name="s0")
        s["X"] = s["img"]
        model = self._model()
        std_subjects, _ = StandardPredict(image_names=["X"]).predict(model, [s])
        std_pred = np.asarray(std_subjects[0]["y_pred"].data)

        s2 = make_subject(spatial_shape=(16, 16, 16), name="s0")
        s2["X"] = s2["img"]
        patch_subjects, _ = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=4).predict(model, [s2])
        patch_pred = np.asarray(patch_subjects[0]["y_pred"].data)
        # voxelwise model -> sliding window must agree exactly
        np.testing.assert_allclose(patch_pred, std_pred, atol=1e-5)

    def test_add_evaluation_labels(self):
        from segmentation_pipeline_tpu.transforms import (
            Compose,
            CropOrPad,
            CustomOneHot,
            RenameProperty,
        )

        import copy

        s = make_subject(spatial_shape=(20, 20, 12), label_values={"fg": 1}, name="s0")
        s["X"] = copy.deepcopy(s["img"])  # aliasing would double-apply transforms
        Compose([
            CropOrPad((16, 16, 8), mask_name="seg"),
            RenameProperty("seg", "y"),
            CustomOneHot(include=["y"]),
        ])(s)
        model = self._model()
        subjects, _ = StandardPredict(image_names=["X"]).predict(
            model, [s], label_attributes={"label_values": {"fg": 1}})
        add_evaluation_labels(subjects)
        s = subjects[0]
        assert "y_pred_eval" in s and "y_eval" in s
        # eval labels are 1-channel int maps in cropped space
        assert s["y_pred_eval"].data.shape == (1, 16, 16, 8)
        assert s["y_eval"].data.shape == (1, 16, 16, 8)
        # y survived one-hot round trip exactly
        assert set(np.unique(np.asarray(s["y_eval"].data))) <= {0, 1}


class TestEvaluators:
    def _subject_with_pred(self, name="s0", shift=0):
        s = make_subject(name=name, label_values={"fg": 1})
        pred = np.roll(np.asarray(s["seg"].data), shift, axis=1)
        s["y_eval"] = s["seg"]
        s["y_pred_eval"] = LabelMap(tensor=pred, affine=np.eye(4),
                                    label_values={"fg": 1})
        return s

    def test_segmentation_evaluator_perfect(self):
        out = SegmentationEvaluator("y_pred_eval", "y_eval")([self._subject_with_pred()])
        summary = out["summary_stats"]
        assert summary["mean", "fg", "dice"] == 1.0
        df = out["subject_stats"]
        assert df.loc[0, "dice"] == 1.0

    def test_segmentation_evaluator_shifted(self):
        out = SegmentationEvaluator("y_pred_eval", "y_eval")(
            [self._subject_with_pred(shift=2)])
        dice = out["summary_stats"]["mean", "fg", "dice"]
        assert 0 < dice < 1

    def test_scoring_function_indexing(self):
        """The ['mean', :, 'dice'] pattern from main_config.py:175."""
        out = SegmentationEvaluator("y_pred_eval", "y_eval")(
            [self._subject_with_pred(), self._subject_with_pred("s1", shift=1)])
        dice_per_label = out["summary_stats"]["mean", :, "dice"]
        assert dice_per_label.shape == (1,)
        assert 0 < dice_per_label.mean() <= 1

    def test_label_map_evaluator_curves(self):
        s = self._subject_with_pred()
        s["age"] = 25
        volume = float((np.asarray(s["y_pred_eval"].data) == 1).sum())
        ev = LabelMapEvaluator("y_pred_eval",
                               curve_params={"fg": np.array([0.0, 0.0, volume + 10])},
                               curve_attribute="age",
                               stats_to_output=("volume", "error", "percent_diff"))
        out = ev([s])
        assert out["summary_stats"]["mean", "fg", "error"] == -10.0

    def test_instance_evaluator(self):
        shape = (1, 24, 24, 24)
        target = np.zeros(shape, np.int32)
        target[0, 2:6, 2:6, 2:6] = 1      # lesion A
        target[0, 15:20, 15:20, 15:20] = 1  # lesion B
        pred = np.zeros(shape, np.int32)
        pred[0, 2:6, 2:6, 2:6] = 1        # detects A exactly
        # B missed; plus a false positive
        pred[0, 10:12, 2:4, 2:4] = 1
        s = Subject({
            "name": "s0",
            "y_eval": LabelMap(tensor=target, label_values={"lesion": 1}),
            "y_pred_eval": LabelMap(tensor=pred, label_values={"lesion": 1}),
        })
        out = InstanceSegmentationEvaluator("y_pred_eval", "y_eval")([s])
        df = out["subject_stats"]
        assert df.loc[0, "target_components"] == 2
        assert df.loc[0, "predicted_components"] == 2
        assert df.loc[0, "target_detections"] == 1
        assert df.loc[0, "detection_recall"] == 0.5

    def test_msseg_detection_test(self):
        # one target (100 vox): pred 1 overlaps 80 (precision 1.0)
        hist = np.array([[1000, 0], [20, 80]], dtype=np.float64)
        assert msseg_detection_test(hist).tolist() == [True]
        # insufficient recall
        hist = np.array([[1000, 0], [95, 5]], dtype=np.float64)
        assert msseg_detection_test(hist).tolist() == [False]

    def test_labeled_tensor_nan_handling(self):
        lt = LabeledTensor(["subject", "stat"], [["a", "b", "c"], ["dice"]])
        lt["a", "dice"] = 1.0
        lt["b", "dice"] = float("nan")
        lt["c", "dice"] = 0.5
        summary = lt.compute_summary_stats(["mean", "min"])
        assert summary["mean", "dice"] == 0.75  # nan dropped


class TestPostProcessing:
    def test_keep_components(self):
        img = np.zeros((20, 20, 20), np.int32)
        img[2:8, 2:8, 2:8] = 1        # large
        img[12:18, 12:18, 12:18] = 1  # large
        img[10, 2, 2] = 1             # tiny
        out, removed_comps, removed_elems = keep_components(img, 2)
        assert removed_comps == 1
        assert removed_elems >= 1
        # tiny voxel got filled by dilation of survivors or removed
        labels_out = np.unique(out)
        assert set(labels_out) <= {0, 1}

    def test_remove_holes(self):
        img = np.ones((10, 10, 10), np.int32)
        img[4:6, 4:6, 4:6] = 0  # 8-voxel hole
        out, total = remove_holes(img, hole_size=27)
        assert total == 8
        assert (out > 0).all()

    def test_remove_small_components(self):
        img = np.zeros((16, 16, 16), np.int32)
        img[2:10, 2:10, 2:10] = 1
        img[13, 13, 13] = 1  # 1-voxel speck
        out, _ = remove_small_components(img, component_size=3)
        assert out[13, 13, 13] == 0
        assert out[5, 5, 5] == 1


class TestEnsembles:
    def test_ensemble_flips_voxelwise_model_invariant(self):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleFlips

        def model(x):
            fg = (jnp.asarray(x)[:, 0:1] > 0).astype(jnp.float32)
            return jnp.concatenate([1 - fg, fg], axis=1)

        x = np.random.default_rng(0).normal(size=(1, 1, 8, 8, 8)).astype(np.float32)
        direct = np.asarray(model(x))
        tta = np.asarray(EnsembleFlips(model, "mean")(x))
        np.testing.assert_allclose(tta, direct, atol=1e-6)

    def test_majority_vote(self):
        from segmentation_pipeline_tpu.models.ensemble import apply_strategy

        a = jnp.asarray(np.array([[[0.9], [0.1]]]))  # class 0
        b = jnp.asarray(np.array([[[0.2], [0.8]]]))  # class 1
        c = jnp.asarray(np.array([[[0.3], [0.7]]]))  # class 1
        out = np.asarray(apply_strategy([a, b, c], "majority"))
        assert out[0, 1, 0] == 1.0


class TestShapeBucketing:
    def test_bucketed_patch_predict_matches_unbucketed(self):
        """shape_bucket pads to shared compiled shapes; outputs unchanged."""

        def model(x):
            x = jnp.asarray(x)
            fg = (x[:, 0:1] > 0).astype(jnp.float32)
            return jnp.concatenate([1 - fg, fg], axis=1)

        for shape in [(17, 14, 10), (19, 18, 12)]:
            s1 = make_subject(spatial_shape=shape, name="s")
            s1["X"] = s1["img"]
            s2 = make_subject(spatial_shape=shape, name="s")
            s2["X"] = s2["img"]
            plain, _ = PatchPredict(image_names=["X"], patch_size=8,
                                    patch_overlap=4, patch_batch_size=2
                                    ).predict(model, [s1])
            bucketed, _ = PatchPredict(image_names=["X"], patch_size=8,
                                       patch_overlap=4, patch_batch_size=2,
                                       shape_bucket=16).predict(model, [s2])
            a = np.asarray(plain[0]["y_pred"].data)
            b = np.asarray(bucketed[0]["y_pred"].data)
            assert a.shape == b.shape == (2, *shape)
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestPatchPredictSegModelPath:
    def test_weight_updates_are_fresh_and_program_is_cached(self):
        """Regression: PatchPredict's SegModel fast path passes variables as a
        traced argument — updated weights must show up in the next predict()
        without retracing the fused sliding-window program."""
        import jax
        from segmentation_pipeline_tpu.models import NestedResUNet
        from segmentation_pipeline_tpu.training.model import SegModel

        module = NestedResUNet(input_channels=1, output_channels=2, filters=4)
        model = SegModel(module)
        s = make_subject(spatial_shape=(16, 16, 16), name="s0")
        s["X"] = s["img"]
        predictor = PatchPredict(image_names=["X"], patch_size=8,
                                 patch_overlap=4, patch_batch_size=4)

        out1, _ = predictor.predict(model, [s])
        pred1 = np.asarray(out1[0]["y_pred"].data)

        # mutate the weights: predictions must change (no baked-in constants)
        model.update_variables(jax.tree_util.tree_map(
            lambda p: p * 2.0 + 0.1, model.params))
        s2 = make_subject(spatial_shape=(16, 16, 16), name="s0")
        s2["X"] = s2["img"]
        out2, _ = predictor.predict(model, [s2])
        pred2 = np.asarray(out2[0]["y_pred"].data)
        assert not np.allclose(pred1, pred2), "stale weights in cached program"

        # fresh predictor instance, same module: must agree with out2 exactly
        out3, _ = PatchPredict(image_names=["X"], patch_size=8,
                               patch_overlap=4, patch_batch_size=4
                               ).predict(model, [s2])
        np.testing.assert_allclose(np.asarray(out3[0]["y_pred"].data), pred2,
                                   atol=1e-6)

        # the static model_fn is cached per module -> one shared fn object
        fn_a = PatchPredict._fn_for_module(module)
        fn_b = PatchPredict._fn_for_module(module)
        assert fn_a is fn_b


import segmentation_pipeline_tpu as sp


class TestPredictionReviewFixes:
    """Round-5 prediction.py review fixes."""

    def test_round1_era_checkpoint_state_resumes(self):
        """Predictors unpickled from states missing EVERY post-release
        attribute must still predict (predictors ride inside every
        checkpoint)."""
        state = {"image_names": ["X"], "sagittal_split": False}
        old = sp.StandardPredict.__new__(sp.StandardPredict)
        old.__dict__.update(state)  # simulates a round-1 pickle payload
        assert old.device_argmax is False
        assert old.refine_image is None
        assert old.cache_inputs is None
        assert old._confusion_plan is None

        pp = sp.PatchPredict.__new__(sp.PatchPredict)
        pp.__setstate__({"image_names": ["X"], "patch_batch_size": 2,
                         "patch_size": 8, "patch_overlap": 4,
                         "padding_mode": 0, "overlap_mode": "average"})
        assert pp.device_argmax is False
        assert pp.shape_bucket == 0
        assert pp.mesh is None
        assert pp.volume_sharded is False
        assert pp.device_postprocess is None

    def test_ragged_cohort_returns_list_y_pred(self):
        """Subjects with different spatial shapes in ONE PatchPredict call:
        per-subject predictions attach normally and batch['y_pred'] is a
        list (no rectangular stack exists) instead of a crash."""
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        subjects = []
        for i, shape in enumerate([(16, 16, 8), (12, 20, 8)]):
            s = Subject(name=f"r{i}")
            s["X"] = ScalarImage(
                tensor=rng.normal(size=(1, *shape)).astype(np.float32),
                affine=np.eye(4))
            subjects.append(s)

        pred = sp.PatchPredict(image_names=["X"], patch_size=8,
                               patch_overlap=4, patch_batch_size=2)

        from segmentation_pipeline_tpu.training.model import SegModel
        import flax.linen as nn

        class Twice(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return jnp.concatenate([x, -x], axis=-1)

        model = SegModel(Twice())
        model.ensure_initialized(np.zeros((1, 1, 8, 8, 8), np.float32))
        out_subjects, batch = pred.predict(model, subjects)
        assert isinstance(batch["y_pred"], list)
        assert len(batch["y_pred"]) == 2
        shapes = [p.shape for p in batch["y_pred"]]
        assert shapes == [(2, 16, 16, 8), (2, 12, 20, 8)]
        for subj in out_subjects:
            assert "y_pred" in subj

    def test_lazybatch_get_propagates_materialize_errors(self):
        from segmentation_pipeline_tpu.prediction import _LazyBatch

        s = Subject(name="incomplete")  # has NO image 'X'
        batch = _LazyBatch([s], ["X"], cache=False)
        assert "X" in batch
        with pytest.raises(KeyError):
            batch.get("X")  # present key failing to materialize must raise
        assert batch.get("nope", 42) == 42  # absent key -> default
