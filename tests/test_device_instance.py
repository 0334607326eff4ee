"""On-device instance-overlap reduction (VERDICT r3 #6): the validation
sweep's lesion-detection histogram computed on device (CC labeling +
fixed-capacity compaction + joint bincount, ops/instance.py) and fetched as
(K+1)^2 scalars, proven exactly equal to the host chain
(ref evaluators/instance_segmentation_evaluator.py:95-106) by the
self-validating probe — with component-budget overflows deferring to the
host path instead of mis-counting."""
import json

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.evaluators.instance_segmentation_evaluator import (
    DEVICE_INSTANCE_KEY,
    connected_components,
    overlap_histogram,
)
from segmentation_pipeline_tpu.ops.instance import (
    compact_labels_device,
    component_count,
    instance_hist_from_channel_ids,
    overlap_histogram_device,
)
from segmentation_pipeline_tpu.training.device_confusion import (
    DeviceConfusionManager,
    eligible_sweep,
    sweep_spec,
)


def _blob_masks(rng, shape=(24, 20, 16), n_t=(1, 8), n_p=(1, 8)):
    t = np.zeros(shape, bool)
    p = np.zeros(shape, bool)
    for _ in range(rng.integers(*n_t)):
        c = [rng.integers(2, s - 4) for s in shape]
        r = int(rng.integers(1, 4))
        t[c[0] - r:c[0] + r, c[1] - r:c[1] + r, c[2] - r:c[2] + r] = True
    for _ in range(rng.integers(*n_p)):
        c = [rng.integers(2, s - 4) for s in shape]
        r = int(rng.integers(1, 4))
        p[c[0] - r:c[0] + r, c[1] - r:c[1] + r, c[2] - r:c[2] + r] = True
    return t, p


class TestOverlapHistogramDevice:
    @pytest.mark.parametrize("connectivity", [1, 2, 3])
    def test_matches_host_chain_exactly(self, connectivity):
        """Component counts, numbering ORDER, and every histogram entry must
        match the host CC + bincount chain (the probe relies on it)."""
        rng = np.random.default_rng(0)
        for _ in range(4):
            t, p = _blob_masks(rng)
            tc, N = connected_components(t, connectivity)
            pc, M = connected_components(p, connectivity)
            host = overlap_histogram(tc, pc, N, M)
            hist, tu, pu = overlap_histogram_device(
                t, p, capacity=31, connectivity=connectivity)
            n_t, ov_t = component_count(tu)
            n_p, ov_p = component_count(pu)
            assert not ov_t and not ov_p
            assert (n_t, n_p) == (N, M)
            dev = np.asarray(hist)
            np.testing.assert_array_equal(dev[:N + 1, :M + 1], host)
            assert dev[N + 1:].sum() == 0 and dev[:, M + 1:].sum() == 0

    def test_empty_and_full_masks(self):
        for t, p in [(np.zeros((8, 8, 8), bool), np.zeros((8, 8, 8), bool)),
                     (np.ones((8, 8, 8), bool), np.zeros((8, 8, 8), bool)),
                     (np.ones((8, 8, 8), bool), np.ones((8, 8, 8), bool))]:
            tc, N = connected_components(t, 2)
            pc, M = connected_components(p, 2)
            host = overlap_histogram(tc, pc, N, M)
            hist, tu, pu = overlap_histogram_device(t, p, capacity=7,
                                                    connectivity=2)
            assert (component_count(tu)[0], component_count(pu)[0]) == (N, M)
            np.testing.assert_array_equal(
                np.asarray(hist)[:N + 1, :M + 1], host)

    def test_overflow_is_flagged(self):
        """More components than the budget must be detectable host-side —
        jnp.unique truncates silently, so the full unique vector is the
        signal."""
        t = np.zeros((12, 12, 12), bool)
        for c in [(0, 0, 0), (0, 0, 4), (0, 4, 0), (4, 0, 0), (4, 4, 4),
                  (8, 8, 8), (0, 8, 0), (8, 0, 8)]:
            t[c] = True
        _, tu, _ = overlap_histogram_device(t, t, capacity=4, connectivity=2)
        _, overflowed = component_count(tu)
        assert overflowed

    def test_compact_labels_orders_by_first_occurrence(self):
        """Bucket order must equal the host's 1..N first-occurrence
        numbering (ascending min flat index) so histogram MATRICES compare
        exactly, not just their marginals."""
        import jax.numpy as jnp

        lab = np.zeros((4, 4, 4), np.int32)
        lab[3, 3, 3] = 64  # component whose min flat index is largest
        lab[0, 0, 1] = 2
        lab[2, 0, 0] = 33
        idx, uniq = compact_labels_device(jnp.asarray(lab), capacity=7)
        uniq = np.asarray(uniq)
        assert uniq[0] == 0 and list(uniq[1:4]) == [2, 33, 64]
        assert np.asarray(idx)[0, 0, 1] == 1
        assert np.asarray(idx)[2, 0, 0] == 2
        assert np.asarray(idx)[3, 3, 3] == 3

    def test_channel_ids_form(self):
        """The argmax-channel-ids + per-channel-foreground-map form must
        equal masking on host first."""
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        shape = (16, 12, 10)
        ids = rng.integers(0, 3, size=shape).astype(np.uint8)
        # channel 0 -> background, 1/2 -> foreground everywhere
        fg_maps = np.stack([np.zeros(shape, bool), np.ones(shape, bool),
                            np.ones(shape, bool)])
        t, _ = _blob_masks(rng, shape)
        host_pred = np.take_along_axis(fg_maps, ids[None].astype(np.int64),
                                       axis=0)[0]
        tc, N = connected_components(t, 2)
        pc, M = connected_components(host_pred, 2)
        host = overlap_histogram(tc, pc, N, M)
        hist, tu, pu = instance_hist_from_channel_ids(
            jnp.asarray(t), jnp.asarray(ids), jnp.asarray(fg_maps),
            capacity=31, connectivity=2)
        assert (component_count(tu)[0], component_count(pu)[0]) == (N, M)
        np.testing.assert_array_equal(np.asarray(hist)[:N + 1, :M + 1], host)


def _write_lesion_dataset(root, n=6):
    """msseg2-style binary lesion volumes: several small blobs per subject."""
    rng = np.random.default_rng(7)
    for i in range(n):
        d = root / "subjects" / f"s{i}"
        d.mkdir(parents=True)
        img = rng.normal(scale=0.3, size=(1, 16, 16, 8)).astype(np.float32)
        seg = np.zeros((1, 16, 16, 8), np.int16)
        for _ in range(int(rng.integers(1, 4))):
            c = [rng.integers(2, s - 3) for s in (16, 16, 8)]
            r = int(rng.integers(1, 3))
            seg[0, c[0] - r:c[0] + r, c[1] - r:c[1] + r, c[2] - r:c[2] + r] = 1
        img[seg.astype(bool)] += 2.0
        sp.write_nifti(d / "t1.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        (d / "attributes.json").write_text(json.dumps({"fold": i % 2}))


def _build_context(root, device_confusion, with_seg_evaluator=False):
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap,
                       label_values={"lesion": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    steps = [
        sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                             new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ]
    evaluators = [sp.ScheduledEvaluation(
        evaluator=sp.InstanceSegmentationEvaluator("y_pred_eval", "y_eval"),
        log_name="inst", cohorts=["validation"], interval=2)]
    if with_seg_evaluator:
        evaluators.append(sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="seg", cohorts=["validation"], interval=2))
    ctx = sp.Context(name="dev-inst", variables={"P": str(root)})
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
        validation_evaluators=evaluators,
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


def _sweep_stats(records, key):
    out = {}
    for r in records:
        if key in r:
            df = r[key]["validation"]["subject_stats"]
            out[r["iteration"]] = df.set_index("subject").to_dict()
    return out


def _assert_same_stats(a, b):
    assert sorted(a) == sorted(b)
    for it in a:
        for col, by_subject in b[it].items():
            for name, v in by_subject.items():
                got = a[it][col][name]
                assert got == pytest.approx(v, nan_ok=True), \
                    (it, col, name, got, v)


class TestTrainerDeviceInstance:
    def test_device_path_matches_host_path_exactly(self, tmp_path, capfd):
        """Same seeds, device_confusion on vs off, instance-only sweep:
        every per-subject lesion stat of every sweep must be EXACTLY equal
        — iteration 0 is the probe sweep (both paths), 2/4 are served by
        the device overlap histogram."""
        on_dir, off_dir = tmp_path / "on", tmp_path / "off"
        _write_lesion_dataset(on_dir)
        _write_lesion_dataset(off_dir)

        sp.seed_all(11)
        ctx_on = _build_context(on_dir, device_confusion=None)
        log_on = _CaptureLogger()
        ctx_on.trainer.train(ctx_on, max_iterations=6, logger=log_on)

        sp.seed_all(11)
        ctx_off = _build_context(off_dir, device_confusion=False)
        log_off = _CaptureLogger()
        ctx_off.trainer.train(ctx_off, max_iterations=6, logger=log_off)

        _assert_same_stats(_sweep_stats(log_on.records, "inst"),
                           _sweep_stats(log_off.records, "inst"))
        out = capfd.readouterr().out
        assert "device instance validated" in out

    def test_mixed_sweep_serves_both_evaluators(self, tmp_path, capfd):
        """Instance + Segmentation evaluators in ONE sweep: both served on
        device, both exactly equal to the host path."""
        on_dir, off_dir = tmp_path / "on", tmp_path / "off"
        _write_lesion_dataset(on_dir)
        _write_lesion_dataset(off_dir)

        sp.seed_all(12)
        ctx_on = _build_context(on_dir, device_confusion=None,
                                with_seg_evaluator=True)
        log_on = _CaptureLogger()
        ctx_on.trainer.train(ctx_on, max_iterations=6, logger=log_on)

        sp.seed_all(12)
        ctx_off = _build_context(off_dir, device_confusion=False,
                                 with_seg_evaluator=True)
        log_off = _CaptureLogger()
        ctx_off.trainer.train(ctx_off, max_iterations=6, logger=log_off)

        for key in ("inst", "seg"):
            _assert_same_stats(_sweep_stats(log_on.records, key),
                               _sweep_stats(log_off.records, key))
        out = capfd.readouterr().out
        assert "device confusion+instance validated" in out

    def test_validated_sweep_attaches_no_prediction(self, tmp_path, capfd):
        """Once validated ('on'), an eligible sweep fetches no ids volume:
        subjects carry only the device entries, and the evaluator fast path
        serves metrics from them."""
        _write_lesion_dataset(tmp_path)
        sp.seed_all(13)
        ctx = _build_context(tmp_path, device_confusion=None)
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=2, logger=logger)  # probe at 0
        out = capfd.readouterr().out
        assert "device instance validated" in out

        dataset = ctx.dataset.get_cohort_dataset("validation")
        subjects = [dataset[i] for i in range(len(dataset))]
        mgr = DeviceConfusionManager({"label_values": {"lesion": 1}})
        mgr.state = "on"
        # the state machine demotes "on" back to "probe" for any reduction
        # kind the probe never validated (device_confusion.py guard) — mark
        # the instance kind validated the way a completed probe would
        mgr._validated = {("instance", 2)}
        mgr.configure_sweep({"confusion": False, "instance_connectivity": 2})
        predictor = sp.StandardPredict(image_names=["X"], device_argmax=True)
        predictor._confusion_plan = mgr
        out_subjects, _ = predictor.predict(
            ctx.model, subjects,
            label_attributes={"label_values": {"lesion": 1}})
        for s in out_subjects:
            assert "y_pred" not in s
            assert (("y_pred_eval", "y_eval", 2) in s[DEVICE_INSTANCE_KEY])
        ev = sp.InstanceSegmentationEvaluator("y_pred_eval", "y_eval")
        result = ev(out_subjects)
        assert not result["subject_stats"]["dice"].isna().all()

    def test_overflow_defers_probe_and_late_fetches(self, tmp_path, capfd,
                                                    monkeypatch):
        """A component budget too small for the data must NOT mis-count:
        the probe defers (stays 'probe'), metrics still come from the host
        chain, and nothing switches on."""
        monkeypatch.setattr(DeviceConfusionManager, "instance_capacity", 1)
        on_dir, off_dir = tmp_path / "on", tmp_path / "off"
        _write_lesion_dataset(on_dir)
        _write_lesion_dataset(off_dir)

        sp.seed_all(14)
        ctx_on = _build_context(on_dir, device_confusion=None)
        log_on = _CaptureLogger()
        ctx_on.trainer.train(ctx_on, max_iterations=6, logger=log_on)

        sp.seed_all(14)
        ctx_off = _build_context(off_dir, device_confusion=False)
        log_off = _CaptureLogger()
        ctx_off.trainer.train(ctx_off, max_iterations=6, logger=log_off)

        _assert_same_stats(_sweep_stats(log_on.records, "inst"),
                           _sweep_stats(log_off.records, "inst"))
        out = capfd.readouterr().out
        assert "device instance validated" not in out

    def test_eligibility(self):
        inst = sp.ScheduledEvaluation(
            evaluator=sp.InstanceSegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="inst", cohorts=["validation"], interval=1)
        inst_c3 = sp.ScheduledEvaluation(
            evaluator=sp.InstanceSegmentationEvaluator("y_pred_eval", "y_eval",
                                                       connectivity=3),
            log_name="inst3", cohorts=["validation"], interval=1)
        seg = sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="seg", cohorts=["validation"], interval=1)
        argmax_pred = sp.StandardPredict(image_names=["X"], device_argmax=True)
        assert sweep_spec([inst], argmax_pred) == {
            "confusion": False, "instance_connectivity": 2}
        assert sweep_spec([inst, seg], argmax_pred) == {
            "confusion": True, "instance_connectivity": 2}
        assert sweep_spec([seg], argmax_pred) == {
            "confusion": True, "instance_connectivity": None}
        # conflicting connectivities: one CC pass can't serve both
        assert sweep_spec([inst, inst_c3], argmax_pred) is None
        assert not eligible_sweep([inst], sp.StandardPredict(image_names=["X"]))

    def test_unvalidated_kind_demotes_to_probe(self):
        """A sweep needing a reduction the probe never proved (reachable on
        resume: intervals 250/500 resumed at iteration 750 probe-validate
        confusion only; the iteration-1000 sweep adds instance) must re-enter
        probe state rather than run the new reduction with skip_fetch."""
        from segmentation_pipeline_tpu.training.device_confusion import (
            DeviceConfusionManager,
        )

        mgr = DeviceConfusionManager()
        # probe sweep validated confusion only
        mgr._needs_confusion, mgr._instance_conn = True, None
        mgr._validated = {"confusion"}
        mgr.state = "on"

        # confusion-only sweeps stay validated
        mgr.configure_sweep({"confusion": True, "instance_connectivity": None})
        assert mgr.state == "on" and mgr.skip_fetch

        # a sweep adding the instance reduction demotes to probe
        mgr.configure_sweep({"confusion": True, "instance_connectivity": 2})
        assert mgr.state == "probe" and not mgr.skip_fetch

        # after that probe validates, the union is remembered
        mgr._validated |= mgr._needed_kinds()
        mgr.state = "on"
        mgr.configure_sweep({"confusion": False, "instance_connectivity": 2})
        assert mgr.state == "on"
        # a DIFFERENT connectivity is a different (unproven) reduction
        mgr.configure_sweep({"confusion": False, "instance_connectivity": 1})
        assert mgr.state == "probe"
