"""End-to-end training loop test: synthetic dataset -> context -> trainer ->
scheduled evals -> checkpoint -> reload (SURVEY §4 overfit-one-volume test)."""
import json
import os

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.loggers import FileLogger


def build_dataset(root, n=4, shape=(16, 16, 8)):
    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        W, H, D = shape
        # signal: a bright box whose location defines the label
        img = rng.normal(scale=0.3, size=(1, W, H, D)).astype(np.float32)
        seg = np.zeros((1, W, H, D), np.int16)
        seg[:, 4:12, 4:12, 2:6] = 1
        img[seg.astype(bool)] += 2.0
        sp.write_nifti(d / "t1.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 2}, f)


def build_context(root, logs_dir):
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap, label_values={"fg": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    cohorts = {
        "all": sp.RequireAttributes(["t1"]),
        "training": sp.ForbidAttributes({"fold": 0}),
        "validation": sp.RequireAttributes({"fold": 0}),
    }
    transforms = {"default": sp.Compose([
        sp.RescaleIntensity((-1, 1), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                             new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ])}

    context = sp.Context(name="e2e-test", variables={"DATASET_PATH": str(root)})
    context.add_component("dataset", sp.SubjectFolder, root="$DATASET_PATH",
                          subject_path="subjects", subject_loader=loader,
                          cohorts=cohorts, transforms=transforms)
    context.add_component("model", sp.NestedResUNet, input_channels=1,
                          output_channels=2, filters=4)
    context.add_component("optimizer", sp.Adam, lr=3e-3)
    context.add_component("criterion", sp.HybridLogisticDiceLoss)

    validation_evaluators = [
        sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="segmentation_eval", cohorts=["validation"], interval=10),
    ]
    training_evaluators = [
        sp.ScheduledEvaluation(
            evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
            log_name="training_segmentation_eval", interval=10),
    ]

    def scoring_function(evaluation_dict):
        seg_eval = evaluation_dict["segmentation_eval"]["validation"]["summary_stats"]
        return float(seg_eval["mean", :, "dice"].mean())

    context.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=2, save_rate=10, scoring_interval=10,
        scoring_function=scoring_function, one_time_evaluators=[],
        training_evaluators=training_evaluators,
        validation_evaluators=validation_evaluators,
        max_iterations_with_no_improvement=100,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(image_names=["X"]),
        train_dataloader_factory=sp.StandardDataLoader(sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler))
    return context


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    logs = tmp_path_factory.mktemp("logs")
    build_dataset(root)
    context = build_context(root, logs)
    context.init_components()
    logger = FileLogger(str(logs))
    context.trainer.train(context, max_iterations=21, logger=logger)
    return root, logs, context, logger


class TestTrainerEndToEnd:
    def test_loss_decreases(self, trained):
        _, logs, _, logger = trained
        metrics = [json.loads(line) for line in
                   open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 21
        first = np.mean([m["loss"] for m in metrics[:3]])
        last = np.mean([m["loss"] for m in metrics[-3:]])
        assert last < first

    def test_scheduled_evaluations_ran(self, trained):
        _, _, _, logger = trained
        metrics = [json.loads(line) for line in open(logger.run_dir / "metrics.jsonl")]
        with_eval = [m for m in metrics if "segmentation_eval" in m]
        assert len(with_eval) == 3  # iterations 0, 10, 20
        assert "model_score" in metrics[0]
        dice0 = metrics[0]["model_score"]
        dice20 = metrics[20]["model_score"]
        assert dice20 >= dice0

    def test_training_evaluators_ran(self, trained):
        _, _, _, logger = trained
        metrics = [json.loads(line) for line in open(logger.run_dir / "metrics.jsonl")]
        assert "training_segmentation_eval" in metrics[0]

    def test_timer_logged(self, trained):
        _, _, _, logger = trained
        metrics = [json.loads(line) for line in open(logger.run_dir / "metrics.jsonl")]
        assert "train_step" in metrics[0]["timer"]
        assert "data_loading" in metrics[0]["timer"]

    def test_checkpoints_saved(self, trained):
        _, _, _, logger = trained
        ckpts = list((logger.run_dir / "checkpoints").glob("*.ckpt"))
        assert len(ckpts) >= 3  # iters 0, 10, 20 + final
        assert (logger.run_dir / "best_checkpoints").exists()

    def test_checkpoint_roundtrip(self, trained):
        root, logs, context, logger = trained
        ckpts = sorted((logger.run_dir / "checkpoints").glob("*.ckpt"))
        restored = sp.Context(file_path=str(ckpts[-1]),
                              variables={"DATASET_PATH": str(root)})
        restored.keep_components(("model", "dataset", "trainer"))
        restored.init_components()
        assert restored.trainer.iteration == context.trainer.iteration
        # restored model predicts identically to the live one
        x = np.random.default_rng(0).normal(size=(1, 1, 16, 16, 8)).astype(np.float32)
        y_live = np.asarray(context.model(x))
        y_restored = np.asarray(restored.model(x))
        np.testing.assert_allclose(y_restored, y_live, atol=1e-6)

    def test_model_actually_learned(self, trained):
        """Overfit check: dice on the training cohort should be high."""
        root, _, context, _ = trained
        ds = context.dataset.get_cohort_dataset("training")
        subjects = [ds[i] for i in range(len(ds))]
        subjects, _ = sp.StandardPredict(image_names=["X"]).predict(
            context.model, subjects, label_attributes={"label_values": {"fg": 1}})
        sp.add_evaluation_labels(subjects)
        out = sp.SegmentationEvaluator("y_pred_eval", "y_eval")(subjects)
        dice = out["summary_stats"]["mean", "fg", "dice"]
        assert dice > 0.85, dice
