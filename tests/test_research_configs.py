"""Integration tests for the research experiment configs: build a synthetic
dmri_hippo-shaped dataset, train a few iterations through the real config,
run the inference CLI path, then the offline evaluation path."""
import json
from pathlib import Path

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.loggers import FileLogger

from research.dmri_hippo import evaluate as hippo_evaluate
from research.dmri_hippo import hippo_inference
from research.dmri_hippo.configs import augmentation as aug_config
from research.dmri_hippo.configs import main_config
from research.msseg2 import msseg2 as msseg2_config

CROP = (32, 24, 8)


@pytest.fixture(scope="module")
def hippo_root(tmp_path_factory):
    """Synthetic dmri_hippo dataset: 5 subjects, 3 modalities, L/R labels."""
    root = tmp_path_factory.mktemp("hippo")
    rng = np.random.default_rng(0)
    names = [f"cbbrain_{i:03d}" for i in range(4)] + ["ab300_001"]
    affine = np.eye(4)
    W, H, D = 36, 28, 10

    union = np.zeros((1, W, H, D), np.int16)
    union[:, 8:28, 8:20, 2:8] = 1
    (root / "atlas").mkdir()
    sp.write_nifti(root / "atlas" / "whole_roi_union.nii.gz", union, affine)

    for i, name in enumerate(names):
        d = root / "subjects" / name
        d.mkdir(parents=True)
        seg = np.zeros((1, W, H, D), np.int16)
        seg[:, 10:16, 10:16, 3:7] = 1   # left
        seg[:, 20:26, 10:16, 3:7] = 2   # right
        base = rng.normal(scale=0.3, size=(1, W, H, D)).astype(np.float32)
        base[seg > 0] += 2.0
        for mod in ("mean_dwi", "md", "fa"):
            sp.write_nifti(d / f"{mod}.nii.gz",
                           base + rng.normal(scale=0.05, size=base.shape
                                             ).astype(np.float32), affine)
        # full 4-D DWI series + gradient table for the dwi ablation modes
        # (the reference keeps these loaders commented out of the base
        # config, ref main_config.py:35-36; configs/augmentation.py enables
        # them for dwi_reconstruction/combined)
        full = np.repeat(base, 8, axis=0) + rng.normal(
            scale=0.1, size=(8, W, H, D)).astype(np.float32)
        sp.write_nifti(d / "full_dwi.nii.gz", full, affine)
        grad = np.concatenate([rng.normal(size=(8, 3)),
                               np.full((8, 1), 400.0)], 1)
        np.savetxt(d / "full_dwi_grad.b", grad)
        if not name.startswith("ab300"):
            sp.write_nifti(d / "whole_roi.nii.gz", seg, affine)
        with open(d / "attributes.json", "w") as f:
            json.dump({"age": 20 + i, "gender": "M" if i % 2 else "F",
                       "protocol": "ab300" if name.startswith("ab300") else "cbbrain",
                       "rescan_id": "None", "pathologies": "None"}, f)

    (root / "attributes").mkdir()
    with open(root / "attributes" / "cross_validation_split.json", "w") as f:
        json.dump({f"cbbrain_{i:03d}": {"fold": i % 2} for i in range(4)}, f)
    with open(root / "attributes" / "ab300_validation_subjects.json", "w") as f:
        json.dump({"ab300_001": {"ab300_validation": True}}, f)
    with open(root / "attributes" / "cbbrain_test_subjects.json", "w") as f:
        json.dump({"cbbrain_003": {"cbbrain_test": True}}, f)
    return root


@pytest.fixture(scope="module")
def trained_hippo(hippo_root, tmp_path_factory):
    logs = tmp_path_factory.mktemp("hippo_logs")
    context = main_config.get_context(
        variables={"DATASET_PATH": str(hippo_root)}, fold=0,
        crop_shape=CROP, filters=4, training_batch_size=2)
    context.init_components()
    logger = FileLogger(str(logs))
    context.trainer.train(context, max_iterations=6, logger=logger)
    return context, logger


class TestDmriHippoConfig:
    def test_cohorts(self, hippo_root):
        context = main_config.get_context(
            variables={"DATASET_PATH": str(hippo_root)}, fold=0, crop_shape=CROP,
            filters=4)
        context.init_components()
        ds = context.dataset
        assert len(ds) == 5
        ds.set_cohort("training")
        assert len(ds) == 2  # folds != 0
        ds.set_cohort("cbbrain_validation")
        assert len(ds) == 2
        ds.set_cohort("ab300_validation")
        assert len(ds) == 1

    def test_transform_pipeline_output(self, hippo_root):
        context = main_config.get_context(
            variables={"DATASET_PATH": str(hippo_root)}, fold=0, crop_shape=CROP,
            filters=4)
        context.init_components()
        s = context.dataset.get_cohort_dataset("training")[0]
        assert s["X"].data.shape == (3, *CROP)
        assert s["y"].data.shape == (2, *CROP)  # one-hot of L+R merged to 1
        # L/R remap collapsed right_whole=2 into 1 under the Right mask
        assert s["y"]["label_values"]["right_whole"] == 1

    def test_training_runs(self, trained_hippo):
        context, logger = trained_hippo
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 6
        assert all(np.isfinite(m["loss"]) for m in metrics)
        assert "model_score" in metrics[0]
        # the contour image evaluator produced a montage png at iteration 0
        images = list((logger.run_dir / "images").glob("*.png"))
        assert images

    def test_hippo_inference_cli(self, trained_hippo, hippo_root, tmp_path_factory):
        _, logger = trained_hippo
        out = tmp_path_factory.mktemp("preds")
        hippo_inference.main(
            ensemble_path=logger.run_dir / "checkpoints",
            dataset_path=str(hippo_root),
            run_name="testrun",
            out_folder=str(out),
            cohort="cbbrain_validation",
            batch_size=2,
        )
        pred_files = list(out.glob("subjects/*/dmri-hippo.nii.gz"))
        assert len(pred_files) == 2
        data, _ = sp.read_nifti(pred_files[0])
        assert data.shape == (1, 36, 28, 10)  # original grid restored
        assert set(np.unique(data)) <= {0, 1, 2}
        assert (out / "testrun.json").exists()

    def test_hippo_inference_affine_tta(self, trained_hippo, hippo_root,
                                        tmp_path_factory):
        """--ensemble-affines wraps the model in affine-TTA (invertible-warp
        members, masked majority) and the CLI still restores the original
        grid with hard labels."""
        _, logger = trained_hippo
        out = tmp_path_factory.mktemp("preds_affine")
        hippo_inference.main(
            ensemble_path=logger.run_dir / "checkpoints",
            dataset_path=str(hippo_root), run_name="affinetta",
            out_folder=str(out), cohort="cbbrain_validation", batch_size=2,
            ensemble_affines=3, bf16=True)
        pred_files = list(out.glob("subjects/*/dmri-hippo.nii.gz"))
        assert len(pred_files) == 2
        data, _ = sp.read_nifti(pred_files[0])
        assert data.shape == (1, 36, 28, 10)
        assert set(np.unique(data)) <= {0, 1, 2}
        settings = json.loads((out / "affinetta.json").read_text())
        assert settings["ensemble_affines"] == 3

    def test_evaluate_cli(self, trained_hippo, hippo_root, tmp_path_factory):
        _, logger = trained_hippo
        out = tmp_path_factory.mktemp("preds2")
        hippo_inference.main(
            ensemble_path=logger.run_dir / "checkpoints",
            dataset_path=str(hippo_root), run_name="testrun",
            out_folder=str(out), cohort="cbbrain_validation", batch_size=2)
        results = hippo_evaluate.main(
            ground_truth_path=str(hippo_root), predictions_path=str(out),
            cohort_mode="validation")
        assert "testrun" in results
        assert "segmentation_eval/cbbrain_validation" in results["testrun"]

    def test_augmentation_modes(self, hippo_root):
        for mode, expected_len in [("no_augmentation", 2), ("standard", 3),
                                   ("combined", 3)]:
            context = aug_config.get_context(
                variables={"DATASET_PATH": str(hippo_root)},
                augmentation_mode=mode, fold=0, crop_shape=CROP, filters=4)
            training = context.get_component_definition(
                "dataset")["params"]["transforms"]["training"]
            assert len(training.transforms) == expected_len


class TestTpuFastPath:
    """tpu_fast_path=True (VERDICT r3 #2 done criterion): the research
    configs run device_cache=True + device_augmentation='auto' with no
    hand-written dict — the declared pipelines (ref main_config.py:86-100,
    ref msseg2.py:44-57) derive onto the fused device augmentation."""

    def test_dmri_fast_path_trains(self, hippo_root, tmp_path, capsys):
        context = main_config.get_context(
            variables={"DATASET_PATH": str(hippo_root)}, fold=0,
            crop_shape=CROP, filters=4, training_batch_size=2,
            tpu_fast_path=True)
        context.init_components()
        assert context.trainer.device_cache is True
        assert context.trainer.device_augmentation == "auto"
        logger = FileLogger(str(tmp_path))
        context.trainer.train(context, max_iterations=3, logger=logger)
        out = capsys.readouterr().out
        # the derived config carries the reference augmentation strength
        assert "device_augmentation='auto'" in out
        assert "elastic(p=0.5)" in out
        assert "blur(p=0.2)" in out
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 3
        assert all(np.isfinite(m["loss"]) for m in metrics)

    def test_msseg2_fast_path_trains(self, tmp_path, capsys):
        rng = np.random.default_rng(3)
        data = tmp_path / "data"
        for i in range(2):
            d = data / f"sub{i}"
            d.mkdir(parents=True)
            img = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
            seg = np.zeros((1, 24, 24, 24), np.int16)
            seg[:, 8:14, 8:14, 8:14] = 1
            mask = np.ones_like(seg)
            sp.write_nifti(d / "flair_time01.nii.gz", img, np.eye(4))
            sp.write_nifti(d / "flair_time02.nii.gz", img + 0.1, np.eye(4))
            sp.write_nifti(d / "brain_mask.nii.gz", mask, np.eye(4))
            sp.write_nifti(d / "ground_truth.nii.gz", seg, np.eye(4))
        context = msseg2_config.get_context(
            variables={"DATASET_PATH": str(data)}, fold=0,
            patch_size=16, filters=(4, 4, 8), tpu_fast_path=True)
        context.init_components()
        logger = FileLogger(str(tmp_path / "logs"))
        context.trainer.train(context, max_iterations=3, logger=logger)
        out = capsys.readouterr().out
        assert "device_augmentation='auto'" in out
        # the msseg2 spatial OneOf (ref msseg2.py:47-50) derived through
        assert "oneof(p=0.75, affine_w=0.80)" in out
        assert "permute(p=1.0)" in out
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 3
        assert all(np.isfinite(m["loss"]) for m in metrics)

    def test_augmentation_ablation_fast_path_all_modes(self, hippo_root,
                                                       tmp_path, capsys):
        """VERDICT r4 #4 done criterion: all 4 ablation modes (ref
        configs/augmentation.py:41-50) train WITH the fast path.  The dwi
        modes resolve through the hybrid derivation — static channels stay
        device-cached, mean_dwi regenerates on host per batch."""
        expectations = {
            "no_augmentation": lambda out: "declares no stochastic" in out,
            "standard": lambda out: "elastic(p=0.5)" in out
            and "host stage" not in out,
            "dwi_reconstruction": lambda out:
                "per-batch host stage HybridSpec" in out
                and "(all device stages off)" in out,
            "combined": lambda out: "per-batch host stage HybridSpec" in out
            and "elastic(p=0.5)" in out,
        }
        for mode, check in expectations.items():
            context = aug_config.get_context(
                variables={"DATASET_PATH": str(hippo_root)},
                augmentation_mode=mode, fold=0, crop_shape=CROP, filters=4,
                training_batch_size=2, tpu_fast_path=True)
            context.init_components()
            logger = FileLogger(str(tmp_path / mode))
            context.trainer.train(context, max_iterations=2, logger=logger)
            out = capsys.readouterr().out
            assert check(out), (mode, out[-800:])
            metrics = [json.loads(l)
                       for l in open(logger.run_dir / "metrics.jsonl")]
            assert len(metrics) == 2
            assert all(np.isfinite(m["loss"]) for m in metrics), mode
            if mode in ("dwi_reconstruction", "combined"):
                spec = context.trainer._resolved_hybrid_spec
                assert spec is not None and spec.image_order == ["mean_dwi"]

    def test_bf16_plumbs_through_configs_and_clis(self, hippo_root):
        """--bf16 / compute_dtype reach the trainer from every research
        config surface (the +19-20% lever, PARITY.md 'bfloat16')."""
        context = main_config.get_context(
            variables={"DATASET_PATH": str(hippo_root)}, fold=0,
            crop_shape=CROP, filters=4, compute_dtype="bfloat16")
        assert context.get_component_definition("trainer")["params"][
            "compute_dtype"] == "bfloat16"
        context2 = msseg2_config.get_context(
            variables={"DATASET_PATH": "/nonexistent"}, fold=0,
            patch_size=16, filters=(4, 4, 8), compute_dtype="bfloat16")
        assert context2.get_component_definition("trainer")["params"][
            "compute_dtype"] == "bfloat16"

        from research.dmri_hippo import run as dmri_run

        args = dmri_run.build_parser().parse_args(["main", "/d", "/l", "--bf16"])
        assert args.bf16 is True


class TestMsseg2Config:
    def test_context_builds_and_samples(self, tmp_path):
        rng = np.random.default_rng(1)
        for i in range(2):
            d = tmp_path / f"sub{i}"
            d.mkdir()
            img = rng.normal(size=(1, 24, 24, 24)).astype(np.float32)
            seg = np.zeros((1, 24, 24, 24), np.int16)
            seg[:, 8:14, 8:14, 8:14] = 1
            mask = np.ones_like(seg)
            sp.write_nifti(d / "flair_time01.nii.gz", img, np.eye(4))
            sp.write_nifti(d / "flair_time02.nii.gz", img + 0.1, np.eye(4))
            sp.write_nifti(d / "brain_mask.nii.gz", mask, np.eye(4))
            sp.write_nifti(d / "ground_truth.nii.gz", seg, np.eye(4))

        context = msseg2_config.get_context(
            variables={"DATASET_PATH": str(tmp_path)}, fold=0,
            patch_size=16, filters=(4, 4, 8))
        context.init_components()
        ds = context.dataset.get_cohort_dataset("training")
        loader = context.trainer.train_dataloader_factory.get_data_loader(
            dataset=ds, batch_size=2)
        batch = next(iter(loader))
        assert batch[0]["X"].data.shape[0] == 2  # two timepoints concat
        assert batch[0]["X"].spatial_shape == (16, 16, 16)
        assert "location" in batch[0]


class TestMsInferenceCompetitionCLI:
    """research/msseg2/competition/ms_inference.inference: the competition
    chain (predict -> invert history -> hole fill + small-component removal
    -> resample to original grid -> save), and the fused --device-postprocess
    path which must produce byte-identical masks when the history is
    intensity-only and fall back to the host cleanup when it is not."""

    class _MiniDataset:
        """SubjectFolder access semantics: deepcopy then transform."""

        def __init__(self, subjects, transform):
            self.subjects = subjects
            self.transform = transform

        def __len__(self):
            return len(self.subjects)

        def __getitem__(self, i):
            import copy

            return self.transform(copy.deepcopy(self.subjects[i]))

    @staticmethod
    def _model(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        fg = (x[:, 1:2] > x[:, 0:1] + 0.2).astype(jnp.float32)
        return jnp.concatenate([1 - fg, fg], axis=1)

    def _subject(self):
        # fg mask with an interior hole (filled by remove_holes(64)) and a
        # 2-voxel island (dropped by remove_small_components(3)); two
        # timepoints so the real config's ConcatenateImages stage applies
        mask = np.zeros((24, 24, 24), np.float32)
        mask[4:16, 4:16, 4:16] = 1.0
        mask[8:10, 8:10, 8:10] = 0.0            # 8-voxel hole
        mask[20, 20, 20] = mask[20, 20, 21] = 1.0  # small island
        s = sp.Subject(name="sub01", folder="/tmp")
        base = np.full((1, 24, 24, 24), 0.1, np.float32)
        s["t1"] = sp.ScalarImage(tensor=base, affine=np.eye(4))
        s["t2"] = sp.ScalarImage(tensor=base + 4.0 * mask[None],
                                 affine=np.eye(4))
        s["ground_truth"] = sp.LabelMap(tensor=mask[None].astype(np.int32),
                                        affine=np.eye(4),
                                        label_values={"lesion": 1})
        return s, mask

    def _stage_model_io(self):
        """The msseg2 config's model-I/O staging (msseg2.py stage_model_io),
        minus the geometry stage — every record is on the fused-safe
        whitelist."""
        from segmentation_pipeline_tpu.transforms import (
            Compose,
            ConcatenateImages,
            CustomOneHot,
            RenameProperty,
            RescaleIntensity,
        )

        return Compose([
            RescaleIntensity((-1.0, 1.0), (0.05, 99.5)),
            ConcatenateImages(image_names=["t1", "t2"], image_channels=[1, 1],
                              new_image_name="X"),
            RenameProperty(old_name="ground_truth", new_name="y"),
            CustomOneHot(include="y"),
        ])

    def _run(self, tmp_path, transform, device_postprocess, tag):
        from research.msseg2.competition.ms_inference import inference

        subject, _ = self._subject()
        ds = self._MiniDataset([subject], transform)
        out = tmp_path / tag
        inference(ds, self._model, str(out), "seg.nii.gz",
                  device_argmax=True, device_postprocess=device_postprocess)
        data, _ = sp.read_nifti(out / "sub01" / "seg.nii.gz")
        return np.asarray(data)[0]

    def test_fused_matches_host_on_model_io_history(self, tmp_path, capsys):
        transform = self._stage_model_io()
        host = self._run(tmp_path, transform, False, "host")
        fused = self._run(tmp_path, transform, True, "fused")
        printed = capsys.readouterr().out
        assert "Cleanup ran fused on device" in printed
        _, mask = self._subject()
        expected = mask.copy()
        expected[8:10, 8:10, 8:10] = 1.0  # hole filled
        expected[20, 20, 20] = expected[20, 20, 21] = 0.0  # island removed
        np.testing.assert_array_equal(host, expected)
        np.testing.assert_array_equal(fused, host)

    def test_spatial_history_falls_back_to_host(self, tmp_path, capsys):
        """Any geometry record (here CropOrPad, standing in for the real
        pipeline's TargetResample/CropToMask/MinSizePad) must force the
        host cleanup: crops/pads/resamples do not commute with
        remove_holes (see _fused_cleanup_is_exact)."""
        from segmentation_pipeline_tpu.transforms import Compose, CropOrPad

        transform = Compose([CropOrPad((20, 20, 20)), self._stage_model_io()])
        host = self._run(tmp_path, transform, False, "host")
        fused = self._run(tmp_path, transform, True, "fused")
        printed = capsys.readouterr().out
        assert "falling back to the host cleanup" in printed
        assert "Cleanup ran fused" not in printed
        np.testing.assert_array_equal(fused, host)
