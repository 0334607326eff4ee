"""Trainer resume, device augmentation, and cascade config tests."""
import json

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.loggers import FileLogger

from tests.test_trainer import build_context, build_dataset


class TestResume:
    def test_resume_continues_iteration_and_state(self, tmp_path):
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=5, logger=logger)
        assert context.trainer.iteration == 5

        ckpts = sorted((logger.run_dir / "checkpoints").glob("*.ckpt"))
        restored = sp.Context(file_path=str(ckpts[-1]),
                              variables={"DATASET_PATH": str(root)})
        restored.init_components()
        assert restored.trainer.iteration == 5
        # optimizer state came back too (Adam moments are non-zero)
        opt_state = restored.trainer._restored_opt_state
        assert opt_state is not None
        leaves = [l for l in __import__("jax").tree_util.tree_leaves(opt_state)
                  if hasattr(l, "shape") and getattr(l, "size", 0) > 1]
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

        # continue training: loop resumes at iteration 4 and proceeds
        logger2 = FileLogger(str(logs))
        restored.trainer.train(restored, max_iterations=3, logger=logger2)
        assert restored.trainer.iteration == 5 + 3  # 3 more iterations


class TestDeviceAugmentation:
    def test_trainer_with_device_augmentation(self, tmp_path):
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        # enable the fused device augmentation with a light config
        context.update_component(
            "trainer",
            device_augmentation={"affine_p": 0.5, "elastic_p": 0.0,
                                 "bias_p": 0.3, "noise_p": 0.5})
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=4, logger=logger)
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 4
        assert all(np.isfinite(m["loss"]) for m in metrics)


class TestNoScoringFunction:
    def test_scoring_function_none_trains_without_scoring(self, tmp_path):
        """scoring_function=None disables scoring/best-checkpoints/early
        stop instead of crashing (the reference TypeErrors,
        ref segmentation_trainer.py:250-251)."""
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.update_component(
            "trainer", scoring_function=None,
            max_iterations_with_no_improvement=1)  # must not early-stop
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=4, logger=logger)
        assert context.trainer.iteration == 4
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 4
        assert all("model_score" not in m for m in metrics)
        assert not (logger.run_dir / "best_checkpoints").exists()


class TestCascadeConfig:
    def test_cascade_context_builds_and_steps(self, tmp_path):
        """Cascade experiment: prior predictions + StochasticMatrix C^2 head."""
        from research.dmri_hippo.configs import cascade
        from tests.test_research_configs import CROP

        # reuse the synthetic hippo dataset builder
        import tests.test_research_configs as rc

        class _F:
            def __init__(self, p):
                self._p = p

            def mktemp(self, name):
                d = self._p / name
                d.mkdir(exist_ok=True)
                return d

        root = rc.hippo_root.__wrapped__(_F(tmp_path))
        # prior predictions: reuse ground truth as 'standard' prior
        preds = tmp_path / "preds"
        for sub in (root / "subjects").iterdir():
            if not (sub / "whole_roi.nii.gz").exists():
                continue
            d = preds / "subjects" / sub.name
            d.mkdir(parents=True)
            data, affine = sp.read_nifti(sub / "whole_roi.nii.gz")
            sp.write_nifti(d / "standard.nii.gz", data, affine)

        context = cascade.get_context(
            variables={"DATASET_PATH": str(root), "PREDICTIONS_PATH": str(preds)},
            prior_label_name="standard", fold=0, predict_hbt=False,
            crop_shape=CROP, filters=4)
        context.init_components()

        ds = context.dataset.get_cohort_dataset("training")
        s = ds[0]
        assert "y_prior" in s
        assert s["y_prior"].data.shape[0] == 2  # one-hot prior

        # model outputs C^2 = 4 channels through the StochasticMatrix head
        import jax.numpy as jnp

        x = np.zeros((1, 3, *CROP), np.float32)
        y = np.asarray(context.model(x))
        assert y.shape[1] == 4
        # each CxC transition matrix is column-stochastic
        mat = y.reshape(1, 2, 2, *CROP)
        np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-5)


class TestTrainerStops:
    def test_wall_clock_budget_stops_early(self, tmp_path):
        """max_training_time with the save-buffer semantics stops the loop
        (ref segmentation_trainer.py:110-115,270-275)."""
        import time

        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.init_components()
        logger = FileLogger(str(logs))
        t0 = time.time()
        # 10s budget -> save buffer 1s -> ~9s of training, far fewer than 10^4 iters
        context.trainer.train(context, max_iterations=10_000,
                              max_training_time=10, logger=logger)
        assert time.time() - t0 < 120
        assert context.trainer.iteration < 10_000
        # checkpoint-at-exit happened
        assert list((logger.run_dir / "checkpoints").glob("*.ckpt"))

    def test_early_stopping_on_no_improvement(self, tmp_path):
        root = tmp_path / "ds"
        logs = tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        # score never improves -> stop after max_iterations_with_no_improvement
        context.update_component("trainer", scoring_function=lambda d: 0.0,
                                 max_iterations_with_no_improvement=3,
                                 scoring_interval=1, save_rate=10 ** 9)
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=10_000, logger=logger)
        # first score (iteration 0) sets the max; no improvement after
        assert context.trainer.iteration <= 5


class TestGradientAccumulation:
    def test_accumulate_steps_defers_updates(self):
        """Adam/SGD(accumulate_steps=k) average grads over k micro-batches
        and apply one update (optax.MultiSteps under the torch-style config
        surface) — beyond-HBM effective batch sizes."""
        import jax
        import jax.numpy as jnp

        import segmentation_pipeline_tpu as sp
        from segmentation_pipeline_tpu.training.train_step import (
            create_train_state,
            make_train_step,
        )

        module = sp.NestedResUNet(input_channels=1, output_channels=2,
                                  filters=4)
        model = sp.SegModel(module)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(2, 1, 16, 16, 8)).astype(np.float32)
        lab = (rng.random((2, 16, 16, 8)) < 0.3).astype(np.float32)
        y = np.stack([1 - lab, lab], 1)
        model.ensure_initialized(X)
        opt = sp.Adam(lr=1e-3, accumulate_steps=2)
        state = create_train_state(model, opt, {"X": X})
        step = make_train_step(module, sp.HybridLogisticDiceLoss(), opt)
        batch = {"X": jnp.moveaxis(jnp.asarray(X), 1, -1),
                 "y": jnp.moveaxis(jnp.asarray(y), 1, -1)}
        p0 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.params))
        state, _, _ = step(state, batch, jax.random.PRNGKey(0))
        p1 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.params))
        assert all(np.array_equal(a, b) for a, b in zip(p0, p1)), \
            "update applied before k micro-steps"
        state, _, _ = step(state, batch, jax.random.PRNGKey(1))
        p2 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.params))
        assert any(not np.array_equal(a, b) for a, b in zip(p0, p2)), \
            "no update after k micro-steps"


class TestDeferredMetricFetch:
    """defer_metric_fetch overlaps the loss round trip with the next step:
    every iteration must still be logged once, in order, with values
    IDENTICAL to the synchronous path (the RNG stream is untouched)."""

    class _Capture:
        def __init__(self):
            self.records = []

        def setup(self, context):
            pass

        def save_context(self, *a, **k):
            pass

        def log(self, d):
            self.records.append(dict(d))

        def close(self):
            pass

    def _run(self, tmp_path, name, defer):
        root = tmp_path / f"ds-{name}"
        logs = tmp_path / f"logs-{name}"
        logs.mkdir()
        build_dataset(root)
        context = build_context(root, logs)
        context.update_component("trainer", defer_metric_fetch=defer)
        context.init_components()
        logger = self._Capture()
        context.trainer.train(context, max_iterations=13, logger=logger)
        return logger.records

    def test_identical_to_synchronous(self, tmp_path):
        sync = self._run(tmp_path, "sync", defer=False)
        deferred = self._run(tmp_path, "defer", defer=True)
        assert [r["iteration"] for r in sync] == list(range(13))
        assert [r["iteration"] for r in deferred] == list(range(13))
        for a, b in zip(sync, deferred):
            # two IDENTICAL synchronous runs already differ at ~1e-7 (XLA
            # CPU reduction nondeterminism) and the training trajectory
            # amplifies that noise geometrically (observed: 1.2e-4 relative
            # by iteration 12), so exact equality is not the bar — matching
            # trajectories is
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-3,
                                       err_msg=str(a["iteration"]))
        # busy iterations (scoring/save/evaluators at 0 and 10) keep their
        # synchronous extras
        for r in (sync[0], deferred[0], sync[10], deferred[10]):
            assert "segmentation_eval" in r and "model_score" in r


class TestAutoAugReentry:
    """Round-5 guards: in-process train() re-entry must not silently lose
    the auto-derived device augmentation (the dataset already carries the
    deterministic remainder), and stale optimizer state must not survive a
    structural change (ADVICE r4)."""

    def _aug_context(self, root, logs):
        context = build_context(root, logs)
        defn = context.get_component_definition("dataset")
        transforms = defn["params"]["transforms"]
        aug = sp.Compose([sp.RandomFlip(axes=(0, 1, 2)),
                          sp.RandomNoise(std=0.05, p=0.5)])
        transforms["training"] = sp.Compose(
            [aug] + list(transforms["default"].transforms))
        context.update_component("trainer", device_cache=True,
                                 device_augmentation="auto")
        return context

    def test_reentry_keeps_auto_augmentation(self, tmp_path):
        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = self._aug_context(root, logs)
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=2, logger=logger)
        cfg1 = context.trainer.resolved_device_augmentation
        assert cfg1 is not None and cfg1["noise_p"] == 0.5

        context.trainer.train(context, max_iterations=2, logger=logger)
        assert context.trainer.resolved_device_augmentation == cfg1, \
            "auto augmentation silently lost on in-process re-entry"
        assert context.trainer.iteration == 4

    def test_optimizer_swap_reinitializes_opt_state(self, tmp_path, capsys):
        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=2, logger=logger)
        state1 = context.trainer._train_state
        assert state1 is not None

        # swap the optimizer component in place (different state structure:
        # Adam -> SGD+momentum); the stale Adam moments must NOT be reused
        from segmentation_pipeline_tpu.training.optimizers import SGD

        context.optimizer = SGD(lr=1e-3, momentum=0.9)
        context.trainer.train(context, max_iterations=2, logger=logger)
        out = capsys.readouterr().out
        assert "reinitializing optimizer state" in out
        assert context.trainer.iteration == 4

    def test_same_optimizer_reuses_opt_state(self, tmp_path, capsys):
        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.init_components()
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=2, logger=logger)
        context.trainer.train(context, max_iterations=2, logger=logger)
        out = capsys.readouterr().out
        assert "reinitializing optimizer state" not in out
        assert context.trainer.iteration == 4


class TestSignalAndGuardFixes:
    """Round-5 trainer-review fixes: EXIT event reset on entry, signal
    handlers restored on exit, spatial_axis+device_augmentation refusal,
    empty cohorts still produce their log key."""

    def test_stale_exit_event_does_not_poison_next_run(self, tmp_path):
        import signal as _signal

        from segmentation_pipeline_tpu.training import trainer as tr

        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        context.init_components()
        prev = _signal.getsignal(_signal.SIGINT)
        tr.EXIT.set()  # a previous signal-stopped run left the event set
        logger = FileLogger(str(logs))
        context.trainer.train(context, max_iterations=3, logger=logger)
        assert context.trainer.iteration == 3, \
            "stale EXIT event stopped the run after one iteration"
        # the clean-exit handler was uninstalled on the way out
        assert _signal.getsignal(_signal.SIGINT) is prev

    def test_spatial_axis_with_device_augmentation_refused(self, tmp_path):
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        mesh = make_mesh(n_devices=2, axis_names=("spatial",), shape=(2,))
        context.update_component("trainer", mesh=mesh,
                                 spatial_axis="spatial",
                                 device_augmentation={})
        context.init_components()
        with pytest.raises(ValueError, match="spatial_axis"):
            context.trainer.train(context, max_iterations=1,
                                  logger=FileLogger(str(logs)))

    def test_empty_cohort_still_emits_log_key(self, tmp_path):
        """A scheduled cohort matching ZERO validation subjects must still
        produce log_dict[log_name][cohort] (reference semantics, ref
        segmentation_trainer.py:229-233) so scoring functions can index
        it."""
        root, logs = tmp_path / "ds", tmp_path / "logs"
        build_dataset(root)
        context = build_context(root, logs)
        defn = context.get_component_definition("dataset")
        defn["params"]["cohorts"]["nobody"] = sp.RequireAttributes(
            {"fold": 99})
        context.update_component(
            "trainer",
            validation_evaluators=[sp.ScheduledEvaluation(
                evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
                log_name="seg", cohorts=["nobody"], interval=2)],
            scoring_interval=10 ** 6, scoring_function=None)
        context.init_components()

        class Cap:
            records = []

            def setup(self, c):
                pass

            def save_context(self, *a):
                pass

            def log(self, d):
                Cap.records.append(d)

        Cap.records = []
        context.trainer.train(context, max_iterations=3, logger=Cap())
        swept = [r for r in Cap.records if "seg" in r]
        assert swept, "no sweep record"
        for r in swept:
            assert "nobody" in r["seg"]
            assert len(r["seg"]["nobody"]["subject_stats"]) == 0
