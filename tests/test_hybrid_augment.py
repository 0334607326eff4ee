"""Hybrid device-cache fast path (VERDICT r4 #4): host-only stochastic
channel resynthesis (ReconstructMeanDWI, ref transforms/
reconstruct_mean_dwi.py:11-106) peeled off the stochastic window into a
per-batch host stage, with the static channels device-cached and the
regenerated channel spliced into the gathered batch
(training/auto_augment.derive_hybrid_augmentation +
training/hybrid_augment.HybridHostAugment).

The acceptance pipelines are the augmentation-ablation experiment's
dwi_reconstruction/combined modes (ref configs/augmentation.py:41-50).
"""
import copy
import json
import os
import sys

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.ops.augment import DMRI_REFERENCE_CONFIG
from segmentation_pipeline_tpu.training.auto_augment import (
    AugmentationDerivationError,
    contains_random,
    derive_hybrid_augmentation,
)
from segmentation_pipeline_tpu.training.hybrid_augment import HybridHostAugment

# repo root (for the research.* config imports), not a hardcoded path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dwi_block():
    return sp.ReconstructMeanDWI(num_dwis=(1, 7), num_directions=(1, 3),
                                 directionality=(4, 10))


def _standard_block():
    noise = sp.RandomNoise(std=0.035, p=0.3)
    blur = sp.RandomBlur((0, 1), p=0.2)
    return sp.Compose([
        sp.RandomFlip(axes=(0, 1, 2)),
        sp.RandomBiasField(p=0.5),
        sp.RescaleIntensity((0, 1), (0.01, 99.9)),
        sp.RandomGamma(p=0.8),
        sp.RescaleIntensity((-1, 1)),
        sp.OneOf([sp.Compose([blur, noise]), sp.Compose([noise, blur])]),
    ], exclude=["full_dwi"])


def _model_io(image_names=("mean_dwi", "md")):
    # NOTE: like the reference (ref main_config.py:161), the model-io
    # rescale has NO exclude — the hybrid derivation itself must keep the
    # resynthesis input (full_dwi) pristine through the pretransform
    return sp.Compose([
        sp.RescaleIntensity((-1.0, 1.0), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=list(image_names),
                             image_channels=[1] * len(image_names),
                             new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ])


class TestHybridDerivation:
    def test_combined_mode_derives_reference_config_plus_spec(self):
        """The real combined-mode ablation pipeline (dwi recon + the full
        standard block from ref main_config.py:86-100) derives to the
        reference-strength device config with a mean_dwi hybrid spec."""
        from research.dmri_hippo.configs.augmentation import (
            _dwi_block as real_dwi, _standard_block as real_std)
        from research.dmri_hippo.configs.main_config import build_transforms

        tr = build_transforms((96, 88, 24), False)["training"]
        tr.transforms[1] = sp.Compose([real_dwi(), real_std()])
        host, cfg, spec = derive_hybrid_augmentation(tr)
        for key, want in DMRI_REFERENCE_CONFIG.items():
            assert cfg[key] == want, (key, cfg[key], want)
        assert spec is not None
        assert spec.image_order == ["mean_dwi"]
        assert spec.slots == {"mean_dwi": (0, 1)}
        assert [type(t).__name__ for t in spec.peeled] == ["ReconstructMeanDWI"]
        # model-io rescale re-applied to the regenerated channel only
        assert [(type(t).__name__, t.include) for t in spec.finishers] == \
            [("RescaleIntensity", ["mean_dwi"])]
        assert not contains_random(host)

    def test_dwi_only_mode_peels_everything(self):
        from research.dmri_hippo.configs.augmentation import (
            _dwi_block as real_dwi)
        from research.dmri_hippo.configs.main_config import build_transforms

        tr = build_transforms((96, 88, 24), False)["training"]
        tr.transforms[1] = real_dwi()
        host, cfg, spec = derive_hybrid_augmentation(tr)
        assert cfg is None and spec is not None
        assert not contains_random(host)

    def test_plain_pipelines_pass_through(self):
        t = sp.Compose([sp.RandomNoise(std=0.1, p=0.5), _model_io(["md"])])
        host, cfg, spec = derive_hybrid_augmentation(t)
        assert spec is None and cfg["noise_p"] == 0.5

    def test_resynthesis_mid_window_refused(self):
        """A resynthesis transform NOT at the window front cannot be peeled
        (device stages before it cannot run on host) — the plain derivation
        refuses it with the pointer at the hybrid option."""
        t = sp.Compose([sp.RandomFlip(axes=(0, 1, 2)), _dwi_block(),
                        _model_io()])
        with pytest.raises(AugmentationDerivationError,
                           match="no fused device-augmentation counterpart"):
            derive_hybrid_augmentation(t)

    def test_output_not_feeding_x_refused(self):
        t = sp.Compose([_dwi_block(), sp.RandomFlip(axes=(0, 1, 2)),
                        _model_io(["md"])])
        with pytest.raises(AugmentationDerivationError,
                           match="never feed the collated X"):
            derive_hybrid_augmentation(t)

    def test_output_feeding_y_refused(self):
        """The regenerated image must not feed the label: it both sits in
        the concat (so the X-feed check passes) and renames to y."""
        with pytest.raises(AugmentationDerivationError, match="label y"):
            derive_hybrid_augmentation(sp.Compose([
                sp.ReconstructMeanDWI(mean_dwi_image_name="seg"),
                sp.RandomFlip(axes=(0, 1, 2)),
                sp.Compose([
                    sp.ConcatenateImages(image_names=["md", "seg"],
                                         image_channels=[1, 1],
                                         new_image_name="X"),
                    sp.RenameProperty(old_name="seg", new_name="y"),
                ]),
            ]))

    def test_deterministic_step_between_peel_and_window_refused(self):
        t = sp.Compose([_dwi_block(), sp.RescaleIntensity((0, 1)),
                        sp.RandomFlip(axes=(0, 1, 2)), _model_io()])
        with pytest.raises(AugmentationDerivationError,
                           match="pretransform time"):
            derive_hybrid_augmentation(t)


def _write_dwi_dataset(root, n=4, shape=(16, 16, 8), n_grad=12):
    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / "subjects" / f"s{i}"
        d.mkdir(parents=True)
        full = rng.normal(size=(n_grad, *shape)).astype(np.float32) + 2.0
        seg = np.zeros((1, *shape), np.int16)
        seg[:, 4:12, 4:12, 2:6] = 1
        sp.write_nifti(d / "full_dwi.nii.gz", full, np.eye(4))
        sp.write_nifti(d / "mean_dwi.nii.gz", full.mean(0, keepdims=True),
                       np.eye(4))
        sp.write_nifti(d / "md.nii.gz",
                       rng.normal(size=(1, *shape)).astype(np.float32),
                       np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        grad = np.concatenate([rng.normal(size=(n_grad, 3)),
                               np.full((n_grad, 1), 400.0)], 1)
        np.savetxt(d / "full_dwi_grad.b", grad)
        (d / "attributes.json").write_text(json.dumps({"fold": i % 2}))


def _loader():
    return sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="full_dwi.*", image_name="full_dwi",
                       image_constructor=sp.ScalarImage),
        sp.TensorLoader(glob_pattern="full_dwi_grad.b", tensor_name="grad",
                        belongs_to="full_dwi"),
        sp.ImageLoader(glob_pattern="mean_dwi.*", image_name="mean_dwi",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="md.*", image_name="md",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap,
                       label_values={"fg": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])


def _build_context(root, device_cache=True, mode="combined"):
    middle = (sp.Compose([_dwi_block(), _standard_block()])
              if mode == "combined" else _dwi_block())
    transforms = {"default": _model_io(),
                  "training": sp.Compose([middle, _model_io()])}
    ctx = sp.Context(name="hybrid-test", variables={"P": str(root)})
    ctx.add_component("dataset", sp.SubjectFolder, root="$P",
                      subject_path="subjects", subject_loader=_loader(),
                      cohorts={"training": sp.RequireAttributes(["full_dwi"]),
                               "validation":
                                   sp.RequireAttributes({"fold": 1})},
                      transforms=transforms)
    ctx.add_component("model", sp.NestedResUNet, input_channels=2,
                      output_channels=2, filters=4)
    ctx.add_component("optimizer", sp.Adam, lr=3e-3)
    ctx.add_component("criterion", sp.HybridLogisticDiceLoss)
    ctx.add_component(
        "trainer", sp.SegmentationTrainer, training_batch_size=4,
        save_rate=10 ** 6, scoring_interval=10 ** 6, scoring_function=None,
        one_time_evaluators=[], training_evaluators=[],
        validation_evaluators=[],
        max_iterations_with_no_improvement=10 ** 6,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(image_names=["X"]),
        train_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_cache=device_cache, device_augmentation="auto")
    ctx.init_components()
    return ctx


class _CaptureLogger:
    def __init__(self):
        self.records = []

    def setup(self, context):
        pass

    def save_context(self, *a):
        pass

    def log(self, d):
        self.records.append(d)


class TestHybridRuntime:
    def test_trainer_runs_combined_mode_with_device_cache(self, tmp_path):
        _write_dwi_dataset(tmp_path)
        sp.seed_all(3)
        ctx = _build_context(tmp_path, device_cache=True)
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=3, logger=logger)
        spec = ctx.trainer._resolved_hybrid_spec
        assert spec is not None and spec.image_order == ["mean_dwi"]
        losses = [r["loss"] for r in logger.records if "loss" in r]
        assert len(losses) == 3 and all(np.isfinite(v) for v in losses)

    def test_trainer_runs_dwi_only_mode(self, tmp_path):
        """Window fully peeled: no device stages, splice still per-batch."""
        _write_dwi_dataset(tmp_path)
        sp.seed_all(4)
        ctx = _build_context(tmp_path, device_cache=True, mode="dwi")
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=2, logger=logger)
        assert ctx.trainer.resolved_device_augmentation is None
        assert ctx.trainer._resolved_hybrid_spec is not None
        losses = [r["loss"] for r in logger.records if "loss" in r]
        assert len(losses) == 2 and all(np.isfinite(v) for v in losses)

    def test_no_cache_falls_back_to_inline_host_stage(self, tmp_path):
        """device_cache=False: the peeled stage runs inline in the host
        pipeline (prefix + peeled + suffix), window still on device."""
        _write_dwi_dataset(tmp_path)
        sp.seed_all(5)
        ctx = _build_context(tmp_path, device_cache=False)
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=2, logger=logger)
        assert ctx.trainer._resolved_hybrid_spec is None
        assert ctx.trainer.resolved_device_augmentation is not None
        # the dataset was swapped onto prefix + peeled + suffix: the dwi
        # resynthesis runs inline on host, the window on device
        host = ctx.trainer._auto_aug_host_transform
        assert any(isinstance(t, sp.ReconstructMeanDWI)
                   for t in host.transforms)
        losses = [r["loss"] for r in logger.records if "loss" in r]
        assert len(losses) == 2 and all(np.isfinite(v) for v in losses)

    def test_regeneration_varies_and_splice_is_exact(self, tmp_path):
        import jax.numpy as jnp

        _write_dwi_dataset(tmp_path)
        sp.seed_all(6)
        ctx = _build_context(tmp_path, device_cache=True)
        ctx.trainer.train(ctx, max_iterations=1, logger=_CaptureLogger())
        rt = ctx.trainer._hybrid_rt
        b1 = rt.regenerate([0, 1])
        b2 = rt.regenerate([0, 1])
        assert b1.shape == (2, 16, 16, 8, 1)
        assert not np.allclose(b1, b2), "resynthesis frozen across batches"

        X = jnp.full((2, 16, 16, 8, 2), 7.0, jnp.float32)
        out = np.asarray(rt.apply(X, [0, 1]))
        assert np.all(out[..., 1] == 7.0), "static channel touched"
        assert not np.all(out[..., 0] == 7.0), "stochastic channel not spliced"

    def test_host_stage_matches_declared_semantics_exactly(self, tmp_path):
        """Seeded peeled+finishers on the runtime's scratch copy equal a
        manual application to a deepcopy of the pretransformed subject —
        the shallow-copy sharing never leaks into the cached subjects."""
        _write_dwi_dataset(tmp_path)
        sp.seed_all(7)
        ctx = _build_context(tmp_path, device_cache=True)
        ctx.trainer.train(ctx, max_iterations=1, logger=_CaptureLogger())
        spec = ctx.trainer._resolved_hybrid_spec
        rt = ctx.trainer._hybrid_rt
        subjects = rt.subjects

        before = np.asarray(subjects[0]["mean_dwi"].data).copy()
        sp.seed_all(42)
        blk = rt.regenerate([0])[0, ..., 0]
        sp.seed_all(42)
        s = copy.deepcopy(subjects[0])
        for t in spec.peeled:
            t(s, record=False)
        for t in spec.finishers:
            t(s, record=False)
        np.testing.assert_allclose(blk, np.asarray(s["mean_dwi"].data)[0],
                                   rtol=1e-6)
        # the cached subject's static channel is untouched by regeneration
        np.testing.assert_array_equal(
            np.asarray(subjects[0]["mean_dwi"].data), before)

    def test_resynthesis_input_stays_pristine_through_pretransform(
            self, tmp_path):
        """CODE-REVIEW r5 fix: the real model-io rescale (no exclude, ref
        main_config.py:161) percentile-CLIPS whatever it touches — the
        cacheable pretransform must leave full_dwi pristine so every
        per-batch resynthesis reads the data the declared order would
        (mean-of-clipped != the declared clip-after-mean)."""
        _write_dwi_dataset(tmp_path)
        raw = {}
        for i in range(4):
            data, _ = sp.read_nifti(
                tmp_path / "subjects" / f"s{i}" / "full_dwi.nii.gz")
            raw[f"s{i}"] = data
        sp.seed_all(21)
        ctx = _build_context(tmp_path, device_cache=True)
        ctx.trainer.train(ctx, max_iterations=1, logger=_CaptureLogger())
        # the runtime holds the PRETRANSFORMED subjects the per-batch stage
        # reads (get_cohort_dataset returns a fresh raw view — useless here)
        subjects = ctx.trainer._hybrid_rt.subjects
        assert subjects and all("X" in s for s in subjects)
        checked = 0
        for s in subjects:
            np.testing.assert_allclose(
                np.asarray(s["full_dwi"].data), raw[s["name"]], rtol=1e-6,
                err_msg="full_dwi was modified by the cacheable pretransform")
            checked += 1
        assert checked >= 2
        # ...while the STATIC channels did get the suffix rescale baked
        # (md's X channel clipped+rescaled to [-1, 1])
        md = np.asarray(subjects[0]["md"].data)
        assert md.min() >= -1 - 1e-5 and md.max() <= 1 + 1e-5

    def test_post_concat_rescale_refused(self):
        """CODE-REVIEW r5 fix: an X-level intensity step after the concat
        is baked into the static channels but unreproducible on the
        regenerated block — refuse instead of training on inconsistently
        scaled channels."""
        t = sp.Compose([
            _dwi_block(),
            sp.RandomFlip(axes=(0, 1, 2)),
            sp.Compose([
                sp.ConcatenateImages(image_names=["mean_dwi", "md"],
                                     image_channels=[1, 1],
                                     new_image_name="X"),
                sp.RescaleIntensity((-1, 1)),
                sp.RenameProperty(old_name="seg", new_name="y"),
            ]),
        ])
        with pytest.raises(AugmentationDerivationError,
                           match="AFTER the"):
            derive_hybrid_augmentation(t)

    def test_channel_slot_mismatch_raises(self, tmp_path):
        """CODE-REVIEW r5 fix: declared image_channels that disagree with
        the actual data must fail loudly at cache build, not silently
        splice into the wrong span."""
        _write_dwi_dataset(tmp_path, n=2)
        sp.seed_all(22)
        ctx = _build_context(tmp_path, device_cache=True)
        ctx.trainer.train(ctx, max_iterations=1, logger=_CaptureLogger())
        spec = ctx.trainer._resolved_hybrid_spec
        subjects = ctx.trainer._hybrid_rt.subjects
        import copy as _copy

        bad_spec = _copy.copy(spec)
        bad_spec.slots = {"mean_dwi": (0, 2)}  # lies about the channel count
        with pytest.raises(ValueError, match="channel"):
            HybridHostAugment(subjects, bad_spec)

    def test_patch_loader_with_hybrid_refused(self, tmp_path):
        _write_dwi_dataset(tmp_path)
        ctx = _build_context(tmp_path, device_cache=True)
        ctx.trainer.train_dataloader_factory = sp.PatchDataLoader(
            max_length=8, samples_per_volume=2,
            sampler=sp.UniformSampler((8, 8, 8)))
        with pytest.raises(ValueError, match="PatchDataLoader"):
            ctx.trainer.train(ctx, max_iterations=1,
                              logger=_CaptureLogger())


class TestHybridOnMesh:
    def test_hybrid_trainer_runs_on_8_device_mesh(self, tmp_path):
        """The hybrid splice composes with the DP mesh: the channel block is
        device_put batch-sharded over the data axis and spliced into the
        sharded cached batch (learning from VERDICT r4 — new flagships must
        be mesh-exercised, not single-device-proven)."""
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        _write_dwi_dataset(tmp_path, n=8)
        sp.seed_all(9)
        mesh = make_mesh(n_devices=8, axis_names=("data", "model"),
                         shape=(8, 1))
        middle = sp.Compose([_dwi_block(), _standard_block()])
        transforms = {"default": _model_io(),
                      "training": sp.Compose([middle, _model_io()])}
        ctx = sp.Context(name="hybrid-mesh", variables={"P": str(tmp_path)})
        ctx.add_component("dataset", sp.SubjectFolder, root="$P",
                          subject_path="subjects", subject_loader=_loader(),
                          cohorts={"training":
                                   sp.RequireAttributes(["full_dwi"]),
                                   "validation":
                                   sp.RequireAttributes({"fold": 1})},
                          transforms=transforms)
        ctx.add_component("model", sp.NestedResUNet, input_channels=2,
                          output_channels=2, filters=4)
        ctx.add_component("optimizer", sp.Adam, lr=3e-3)
        ctx.add_component("criterion", sp.HybridLogisticDiceLoss)
        ctx.add_component(
            "trainer", sp.SegmentationTrainer, training_batch_size=8,
            save_rate=10 ** 6, scoring_interval=10 ** 6,
            scoring_function=None, one_time_evaluators=[],
            training_evaluators=[], validation_evaluators=[],
            max_iterations_with_no_improvement=10 ** 6,
            train_predictor=sp.StandardPredict(image_names=["X", "y"]),
            validation_predictor=sp.StandardPredict(image_names=["X"]),
            train_dataloader_factory=sp.StandardDataLoader(
                sampler=sp.RandomSampler),
            validation_dataloader_factory=sp.StandardDataLoader(
                sampler=sp.SequentialSampler),
            mesh=mesh, device_cache=True, device_augmentation="auto")
        ctx.init_components()
        logger = _CaptureLogger()
        ctx.trainer.train(ctx, max_iterations=3, logger=logger)
        spec = ctx.trainer._resolved_hybrid_spec
        assert spec is not None and spec.image_order == ["mean_dwi"]
        losses = [r["loss"] for r in logger.records if "loss" in r]
        assert len(losses) == 3 and all(np.isfinite(v) for v in losses)
