"""On-device confusion reduction (VERDICT r2 #4): the validation sweep's
per-class counts computed on device and fetched as (L+1)^2 scalars, proven
exactly equal to the host native-histogram path — including the dmri-style
spatially-MASKED label inversions — with the self-validating probe falling
back to the host path whenever the device reduction cannot represent the
pipeline."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.evaluators.segmentation_evaluator import (
    DEVICE_CONFUSION_KEY,
    confusion_stats,
    stats_from_joint,
)
from segmentation_pipeline_tpu.ops.confusion import (
    bucketed_joint_from_channel_ids,
    bucketize_values,
    joint_histogram_device,
    value_lut,
)
from segmentation_pipeline_tpu.training.device_confusion import (
    DeviceConfusionManager,
    eligible_sweep,
)


class TestJointHistogramDevice:
    def test_matches_native_histogram(self):
        from segmentation_pipeline_tpu.native import confusion_joint_hist_native

        rng = np.random.default_rng(3)
        target = rng.integers(0, 7, size=(19, 23, 11)).astype(np.int32)
        pred = rng.integers(0, 7, size=(19, 23, 11)).astype(np.int32)
        label_values = {"a": 1, "b": 3, "c": 6}
        L = len(label_values)
        lut = value_lut(label_values, vmax=6)
        host = confusion_joint_hist_native(target, pred, lut, L)
        dev = np.asarray(joint_histogram_device(
            jnp.asarray(bucketize_values(target, lut, L + 1)),
            jnp.asarray(bucketize_values(pred, lut, L + 1)), L + 1))
        np.testing.assert_array_equal(host, dev)
        assert dev.sum() == target.size

    def test_channel_map_forms_agree(self):
        """The (C,) LUT form and the full-shape (C, W, H, D) map form must
        produce the same joint when the map is position-independent."""
        rng = np.random.default_rng(5)
        C, shape = 4, (9, 8, 7)
        target = rng.integers(0, 3, size=shape)
        ids = rng.integers(0, C, size=shape).astype(np.uint8)
        lut = np.array([2, 0, 1, 2], np.int32)  # channel -> bucket
        full = np.broadcast_to(lut[:, None, None, None], (C, *shape)).copy()
        a = np.asarray(bucketed_joint_from_channel_ids(
            jnp.asarray(target), jnp.asarray(ids), jnp.asarray(lut), 3))
        b = np.asarray(bucketed_joint_from_channel_ids(
            jnp.asarray(target), jnp.asarray(ids), jnp.asarray(full), 3))
        np.testing.assert_array_equal(a, b)

    def test_stats_from_joint_matches_confusion_stats(self):
        rng = np.random.default_rng(8)
        label_values = {"x": 1, "y": 2}
        pred = rng.integers(0, 3, size=(1, 10, 10, 5))
        target = rng.integers(0, 3, size=(1, 10, 10, 5))
        host = confusion_stats(pred, target, label_values)
        L = len(label_values)
        lut = value_lut(label_values, vmax=2)
        joint = np.asarray(joint_histogram_device(
            jnp.asarray(bucketize_values(target, lut, L + 1)),
            jnp.asarray(bucketize_values(pred, lut, L + 1)), L + 1))
        via_joint = stats_from_joint(joint, list(label_values.keys()))
        for stat in ("TP", "FP", "TN", "FN", "dice", "precision", "recall"):
            for name in label_values:
                assert host[stat][name] == pytest.approx(
                    via_joint[stat][name], nan_ok=True)


def _write_dataset(root, n=6):
    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / "subjects" / f"s{i}"
        d.mkdir(parents=True)
        img = rng.normal(scale=0.3, size=(1, 16, 16, 8)).astype(np.float32)
        seg = np.zeros((1, 16, 16, 8), np.int16)
        seg[:, 2:7, 4:12, 2:6] = 1    # left blob -> label 1
        seg[:, 9:14, 4:12, 2:6] = 2   # right blob -> label 2
        img[seg.astype(bool)] += 2.0
        sp.write_nifti(d / "t1.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        (d / "attributes.json").write_text(json.dumps({"fold": i % 2}))


def _build_context(root, device_confusion, extra_label_transform=None):
    """dmri-style pipeline: the right-hemisphere label collapses to the left
    id under a MASKED remap (spatially-varying inverse — the hard case for
    the device reduction's channel maps)."""
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap,
                       label_values={"left_fg": 1, "right_fg": 2}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    steps = [
        sp.CustomRemapLabels(remapping=[("right_fg", 2, 1)],
                             masking_method="Right", include=["seg"]),
        sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                             new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ]
    if extra_label_transform is not None:
        steps.insert(1, extra_label_transform)
    ctx = sp.Context(name="dev-conf", variables={"P": str(root)})
    ctx.add_component("dataset", sp.SubjectFolder, root="$P",
                      subject_path="subjects", subject_loader=loader,
                      cohorts={"training": sp.RequireAttributes(["t1"]),
                               "validation": sp.RequireAttributes({"fold": 1})},
                      transforms={"default": sp.Compose(steps)})
    ctx.add_component("model", sp.NestedResUNet, input_channels=1,
                      output_channels=2, filters=4)
    ctx.add_component("optimizer", sp.Adam, lr=3e-3)
    ctx.add_component("criterion", sp.HybridLogisticDiceLoss)
    ctx.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=4, save_rate=100, scoring_interval=100,
        scoring_function=None,
        one_time_evaluators=[], training_evaluators=[],
        validation_evaluators=[sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="seg", cohorts=["validation"], interval=2)],
        max_iterations_with_no_improvement=100,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(image_names=["X"],
                                                device_argmax=True),
        train_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_confusion=device_confusion)
    ctx.init_components()
    return ctx


class _CaptureLogger:
    def __init__(self):
        self.records = []

    def setup(self, context):
        pass

    def save_context(self, context, folder, iteration):
        pass

    def log(self, d):
        self.records.append(d)


def _sweep_stats(records):
    out = {}
    for r in records:
        if "seg" in r:
            df = r["seg"]["validation"]["subject_stats"]
            out[r["iteration"]] = df.set_index("subject").to_dict()
    return out


class TestTrainerDeviceConfusion:
    def test_device_path_matches_host_path_exactly(self, tmp_path, capfd):
        """Same seeds, device_confusion on vs off: every per-subject stat of
        every sweep must be EXACTLY equal — iteration 2 is the probe sweep
        (both paths ran), iterations 4+ are served purely by device counts
        through the masked-remap (spatially-varying) inversion."""
        on_dir, off_dir = tmp_path / "on", tmp_path / "off"
        _write_dataset(on_dir)
        _write_dataset(off_dir)

        sp.seed_all(99)
        ctx_on = _build_context(on_dir, device_confusion=None)
        log_on = _CaptureLogger()
        ctx_on.trainer.train(ctx_on, max_iterations=6, logger=log_on)

        sp.seed_all(99)
        ctx_off = _build_context(off_dir, device_confusion=False)
        log_off = _CaptureLogger()
        ctx_off.trainer.train(ctx_off, max_iterations=6, logger=log_off)

        stats_on = _sweep_stats(log_on.records)
        stats_off = _sweep_stats(log_off.records)
        # max_iterations=6 runs iterations 0..5: iteration 0 is the probe
        # sweep (both paths), 2 and 4 are served by device counts
        assert sorted(stats_on) == sorted(stats_off) == [0, 2, 4]
        for it in stats_on:
            for col, by_subject in stats_off[it].items():
                for name, v in by_subject.items():
                    got = stats_on[it][col][name]
                    assert got == pytest.approx(v, nan_ok=True), \
                        (it, col, name, got, v)
        out = capfd.readouterr().out
        assert "device confusion validated" in out

    def test_data_dependent_inverse_falls_back_to_host(self, tmp_path, capfd):
        """An inversion the per-channel probe CANNOT represent — a spatial
        ROLL, where each voxel's output depends on a NEIGHBOR's value, not a
        per-voxel (value, position) map — must fail the probe sweep's exact
        comparison and permanently disable the device path; results stay
        correct via the host chain.  (The probe's constant one-hot volumes
        are roll-invariant, so the channel maps claim identity while the
        host chain genuinely shifts the prediction.)"""
        from segmentation_pipeline_tpu.transforms.label import LabelTransform

        class RollLabels(LabelTransform):
            """Forward: identity. Inverse: roll the volume one voxel along
            W — output at voxel v depends on the data at v-1."""

            def apply_transform(self, subject):
                return None

            def is_invertible(self):
                return True

            def inverse(self, args=None):
                outer = self

                class _Inv(LabelTransform):
                    def apply_transform(self, _self_subject):
                        for image in outer.get_images(_self_subject):
                            data = np.asarray(image.data)
                            if data.shape[0] != 1:
                                continue  # pre-argmax one-hot: skip
                            image.set_data(np.roll(data, 1, axis=1))
                        return None

                inv = _Inv()
                inv.include = getattr(outer, "include", None)
                inv.exclude = getattr(outer, "exclude", None)
                return inv

        probe_dir, host_dir = tmp_path / "probe", tmp_path / "host"
        _write_dataset(probe_dir)
        _write_dataset(host_dir)
        sp.seed_all(7)
        ctx = _build_context(
            probe_dir, device_confusion=None,
            extra_label_transform=RollLabels(include=["seg"]))
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=4, logger=logger)
        out = capfd.readouterr().out
        assert ("device confusion mismatch" in out
                or "device confusion probe failed" in out)
        assert "device confusion validated" not in out
        # sweeps after the probe (iteration 0) still produce stats (host
        # path); max_iterations=4 runs iterations 0..3 -> sweep at 2
        assert any("seg" in r for r in logger.records
                   if r.get("iteration") == 2)

        # THE PROBE SWEEP'S OWN metrics must come from the host chain too:
        # a failed probe strips the already-attached device entries before
        # the evaluators run, so iteration 0 equals a host-only run exactly
        sp.seed_all(7)
        ctx_host = _build_context(
            host_dir, device_confusion=False,
            extra_label_transform=RollLabels(include=["seg"]))
        log_host = _CaptureLogger()
        ctx_host.trainer.train(ctx_host, max_iterations=4, logger=log_host)
        stats_probe = _sweep_stats(logger.records)
        stats_host = _sweep_stats(log_host.records)
        assert sorted(stats_probe) == sorted(stats_host)
        for it in stats_host:
            for col, by_subject in stats_host[it].items():
                for name, v in by_subject.items():
                    got = stats_probe[it][col][name]
                    assert got == pytest.approx(v, nan_ok=True), \
                        (it, col, name, got, v)


class TestPredictorPlanHooks:
    def test_standard_predict_skip_fetch(self, tmp_path):
        """Once validated ('on'), an eligible sweep attaches NO prediction
        image — only the per-subject device counts — and the evaluator fast
        path serves identical stats from them."""
        _write_dataset(tmp_path)
        sp.seed_all(1)
        ctx = _build_context(tmp_path, device_confusion=None)
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=2, logger=logger)  # probe at 2

        dataset = ctx.dataset.get_cohort_dataset("validation")
        subjects = [dataset[i] for i in range(len(dataset))]
        mgr = DeviceConfusionManager(
            {"label_values": {"left_fg": 1, "right_fg": 2}})
        mgr.state = "on"
        predictor = sp.StandardPredict(image_names=["X"], device_argmax=True)
        predictor._confusion_plan = mgr
        out_subjects, batch = predictor.predict(
            ctx.model, subjects,
            label_attributes={"label_values": {"left_fg": 1, "right_fg": 2}})
        for s in out_subjects:
            assert "y_pred" not in s
            assert (("y_pred_eval", "y_eval")
                    in s[DEVICE_CONFUSION_KEY])
            joint = s[DEVICE_CONFUSION_KEY][("y_pred_eval", "y_eval")]["joint"]
            assert joint.sum() == 16 * 16 * 8

        # the evaluator consumes the entries without any eval images
        ev = sp.SegmentationEvaluator("y_pred_eval", "y_eval")
        result = ev(out_subjects)
        assert not result["subject_stats"]["dice"].isna().all()

    def test_eligibility_gate(self):
        seg = sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="seg", cohorts=["validation"], interval=1)
        other = sp.ScheduledEvaluation(
            evaluator=sp.LabelMapEvaluator("y_eval"),
            log_name="lab", cohorts=["validation"], interval=1)
        argmax_pred = sp.StandardPredict(image_names=["X"],
                                         device_argmax=True)
        plain_pred = sp.StandardPredict(image_names=["X"])
        assert eligible_sweep([seg], argmax_pred)
        assert not eligible_sweep([seg, other], argmax_pred)
        assert not eligible_sweep([seg], plain_pred)
        assert not eligible_sweep([], argmax_pred)
