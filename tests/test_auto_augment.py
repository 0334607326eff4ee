"""device_augmentation="auto": deriving the fused device config from the
declared transform pipeline (training/auto_augment.py), and the frozen-
augmentation guard on the device-cache pretransform (VERDICT r3 #1-2).

The two research configs' declared augmentation blocks
(ref main_config.py:86-100, ref msseg2.py:44-57) are the acceptance
criterion: every stochastic transform they declare must map onto a fused
device stage, reproducing DMRI_REFERENCE_CONFIG / MSSEG2_REFERENCE_CONFIG.
"""
import json
import os
import sys

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.ops.augment import (
    DMRI_REFERENCE_CONFIG,
    MSSEG2_REFERENCE_CONFIG,
    augment_batch,
)
from segmentation_pipeline_tpu.training.auto_augment import (
    AugmentationDerivationError,
    contains_random,
    derive_device_augmentation,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dmri_training_pipeline():
    from research.dmri_hippo.configs.main_config import build_transforms

    return build_transforms((96, 88, 24), False)["training"]


def msseg2_training_pipeline():
    from research.msseg2.msseg2 import build_pipelines

    return build_pipelines(96)["training"]


class TestContainsRandom:
    def test_flags_random_transforms_and_oneof(self):
        assert contains_random(sp.RandomNoise(std=0.1))
        assert contains_random(sp.Compose([sp.ReplaceNan(), sp.RandomFlip()]))
        assert contains_random(sp.OneOf([sp.ReplaceNan()]))

    def test_flags_probabilistic_gates_on_deterministic_transforms(self):
        assert contains_random(sp.RescaleIntensity((0, 1), p=0.5))

    def test_deterministic_pipeline_clean(self):
        assert not contains_random(sp.Compose([
            sp.ReplaceNan(), sp.RescaleIntensity((0, 1)),
            sp.CustomOneHot(include=["y"])]))
        assert not contains_random(None)


class TestDerivation:
    def test_dmri_research_config_derives_to_reference_strength(self):
        """Every stochastic transform in the dmri training pipeline
        (ref main_config.py:86-100) has a device counterpart, with the
        published reference-strength config as the result."""
        host, cfg = derive_device_augmentation(dmri_training_pipeline(),
                                               spacing=(1.0, 1.0, 1.0))
        for key, want in DMRI_REFERENCE_CONFIG.items():
            assert cfg[key] == want, (key, cfg[key], want)
        assert not contains_random(host)

    def test_msseg2_research_config_derives_to_reference_strength(self):
        host, cfg = derive_device_augmentation(msseg2_training_pipeline(),
                                               spacing=(1.0, 1.0, 1.0))
        for key, want in MSSEG2_REFERENCE_CONFIG.items():
            assert cfg[key] == want, (key, cfg[key], want)
        assert not contains_random(host)
        # the deterministic remainder keeps its structure: geometry
        # normalization + model-io staging + the patch-probability map
        names = [type(t).__name__ for t in host.transforms]
        assert names == ["Compose", "Compose", "ImageFromLabels"]

    def test_derived_configs_run_through_augment_batch(self):
        import jax
        import jax.numpy as jnp

        _, dmri = derive_device_augmentation(dmri_training_pipeline())
        _, mss = derive_device_augmentation(msseg2_training_pipeline())
        X = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 12, 12, 12, 2)).astype(np.float32))
        ids = jnp.asarray(np.random.default_rng(1).integers(
            0, 2, size=(2, 12, 12, 12)).astype(np.uint8))
        for cfg in (dmri, mss):
            X2, y2 = augment_batch(jax.random.PRNGKey(0), X, ids, config=cfg)
            assert X2.shape == X.shape and y2.shape == ids.shape

    def test_spacing_converts_mm_parameters(self):
        _, cfg = derive_device_augmentation(dmri_training_pipeline(),
                                            spacing=(2.0, 1.0, 0.5))
        assert cfg["blur_spacing"] == (2.0, 1.0, 0.5)
        assert cfg["elastic_max_displacement"] == (7.5 / 2.0, 7.5, 7.5 / 0.5)

    def test_no_randomness_returns_none(self):
        t = sp.Compose([sp.RescaleIntensity((0, 1)),
                        sp.CustomOneHot(include=["y"])])
        host, cfg = derive_device_augmentation(t)
        assert cfg is None and host is t

    def test_unmappable_random_transform_raises(self):
        t = sp.Compose([sp.ReconstructMeanDWI()])
        with pytest.raises(AugmentationDerivationError, match="ReconstructMeanDWI"):
            derive_device_augmentation(t)

    def test_out_of_order_stage_raises(self):
        t = sp.Compose([sp.RandomGamma(p=0.5), sp.RandomBiasField(p=0.5)])
        with pytest.raises(AugmentationDerivationError, match="out of order"):
            derive_device_augmentation(t)

    def test_noncommuting_suffix_raises(self):
        t = sp.Compose([sp.RandomFlip(axes=(0, 1, 2)),
                        sp.CropOrPad((8, 8, 8))])
        with pytest.raises(AugmentationDerivationError, match="CropOrPad"):
            derive_device_augmentation(t)

    def test_exclude_of_batch_source_refused_through_nested_suffix(self):
        """ADVICE r4 (medium): the model-io Concatenate that builds X is
        wrapped in a deterministic Compose in both reference configs (ref
        main_config.py:158-165) — the source trace must recurse into it so
        a window restriction on an image feeding X is still refused."""
        t = sp.Compose([
            sp.RandomNoise(std=0.1, p=0.5, exclude=["a"]),
            sp.Compose([  # deterministic model-io block kept whole
                sp.ConcatenateImages(image_names=["a", "b"],
                                     image_channels=[1, 1],
                                     new_image_name="X"),
                sp.RenameProperty(old_name="seg", new_name="y"),
            ]),
        ])
        with pytest.raises(AugmentationDerivationError,
                           match="excludes \\['a'\\]"):
            derive_device_augmentation(t)

    def test_exclude_of_unbatched_image_derives_through_nested_suffix(self):
        """Restrictions on images the device batch never sees (the
        reference's exclude=['full_dwi'], ref main_config.py:86-100) must
        still derive when the suffix is Compose-nested."""
        t = sp.Compose([
            sp.RandomNoise(std=0.1, p=0.5, exclude=["full_dwi"]),
            sp.Compose([
                sp.ConcatenateImages(image_names=["a", "b"],
                                     image_channels=[1, 1],
                                     new_image_name="X"),
                sp.RenameProperty(old_name="seg", new_name="y"),
            ]),
        ])
        _, cfg = derive_device_augmentation(t)
        assert cfg is not None and cfg["noise_p"] == 0.5

    def test_rename_chain_through_nested_suffix_traced(self):
        """A nested Rename feeding y must pull its old_name into the
        traced sources."""
        t = sp.Compose([
            sp.RandomFlip(axes=(0, 1, 2), exclude=["seg"]),
            sp.Compose([
                sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                                     new_image_name="X"),
                sp.RenameProperty(old_name="seg", new_name="y"),
            ]),
        ])
        with pytest.raises(AugmentationDerivationError,
                           match="excludes \\['seg'\\]"):
            derive_device_augmentation(t)

    def test_noise_then_blur_order(self):
        t = sp.Compose([sp.RandomNoise(std=0.1, p=0.5),
                        sp.RandomBlur((0, 1), p=0.5)])
        _, cfg = derive_device_augmentation(t)
        assert cfg["blur_noise_order"] == "noise_blur"
        assert cfg["noise_p"] == 0.5 and cfg["blur_p"] == 0.5


def build_dataset(root, n=4, shape=(16, 16, 8)):
    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        W, H, D = shape
        img = rng.normal(scale=0.3, size=(1, W, H, D)).astype(np.float32)
        seg = np.zeros((1, W, H, D), np.int16)
        seg[:, 4:12, 4:12, 2:6] = 1
        img[seg.astype(bool)] += 2.0
        sp.write_nifti(d / "t1.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 2}, f)


def build_context(root, device_cache, device_augmentation):
    loader = sp.ComposeLoaders([
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap, label_values={"fg": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ])
    cohorts = {"training": sp.ForbidAttributes({"fold": 0}),
               "validation": sp.RequireAttributes({"fold": 0})}
    # dmri-shaped declarative pipeline: deterministic prefix, stochastic
    # augmentation block, deterministic model-io suffix
    preprocessing = sp.Compose([sp.ReplaceNan()])
    augmentation = sp.Compose([
        sp.RandomFlip(axes=(0, 1, 2)),
        sp.RandomBiasField(p=0.5),
        sp.RescaleIntensity((0, 1), (0.01, 99.9)),
        sp.RandomGamma(p=0.5),
        sp.RescaleIntensity((-1, 1)),
        sp.RandomBlur((0, 0.6), p=0.5),
        sp.RandomNoise(std=0.05, p=0.5),
    ])
    model_io = sp.Compose([
        sp.RescaleIntensity((-1, 1), (0.5, 99.5)),
        sp.ConcatenateImages(image_names=["t1"], image_channels=[1],
                             new_image_name="X"),
        sp.RenameProperty(old_name="seg", new_name="y"),
        sp.CustomOneHot(include=["y"]),
    ])
    transforms = {
        "default": sp.Compose([preprocessing, model_io]),
        "training": sp.Compose([preprocessing, augmentation, model_io]),
    }

    context = sp.Context(name="auto-aug-test",
                         variables={"DATASET_PATH": str(root)})
    context.add_component("dataset", sp.SubjectFolder, root="$DATASET_PATH",
                          subject_path="subjects", subject_loader=loader,
                          cohorts=cohorts, transforms=transforms)
    context.add_component("model", sp.NestedResUNet, input_channels=1,
                          output_channels=2, filters=4)
    context.add_component("optimizer", sp.Adam, lr=3e-3)
    context.add_component("criterion", sp.HybridLogisticDiceLoss)
    context.add_component(
        "trainer", sp.SegmentationTrainer,
        training_batch_size=2, save_rate=10 ** 6, scoring_interval=10 ** 6,
        scoring_function=None, one_time_evaluators=[],
        training_evaluators=[], validation_evaluators=[],
        max_iterations_with_no_improvement=10 ** 6,
        train_predictor=sp.StandardPredict(image_names=["X", "y"]),
        validation_predictor=sp.StandardPredict(image_names=["X"]),
        train_dataloader_factory=sp.StandardDataLoader(sampler=sp.RandomSampler),
        validation_dataloader_factory=sp.StandardDataLoader(
            sampler=sp.SequentialSampler),
        device_cache=device_cache, device_augmentation=device_augmentation)
    return context


class TestTrainerIntegration:
    def test_device_cache_with_random_pipeline_raises(self, tmp_path):
        """The frozen-augmentation hazard (VERDICT r3 #2): device_cache must
        REFUSE to bake one random draw into HBM."""
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=True,
                                device_augmentation=None)
        context.init_components()
        with pytest.raises(ValueError, match="FREEZE"):
            context.trainer.train(context, max_iterations=1)

    def test_device_cache_with_hand_config_and_random_pipeline_raises(
            self, tmp_path):
        """A hand-written device config does NOT excuse a still-random host
        pipeline: the augs would both freeze AND double-apply."""
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=True,
                                device_augmentation={"noise_p": 0.5})
        context.init_components()
        with pytest.raises(ValueError, match="FREEZE"):
            context.trainer.train(context, max_iterations=1)

    def test_auto_with_device_cache_trains(self, tmp_path):
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=True,
                                device_augmentation="auto")
        context.init_components()
        logs = []

        class L:
            def setup(self, c): pass
            def save_context(self, c, f, i): pass
            def log(self, d): logs.append(d)
            def close(self): pass

        context.trainer.train(context, max_iterations=4, logger=L())
        assert len(logs) == 4
        assert all(np.isfinite(rec["loss"]) for rec in logs)
        # the cohort transform was swapped onto the deterministic remainder
        training = context.dataset.get_cohort_dataset("training")
        # (the trainer mutated ITS cohort dataset copy, not the parent —
        # verify via a fresh derivation instead)
        host, cfg = derive_device_augmentation(training.transform)
        assert cfg is not None  # original declaration still intact
        assert cfg["blur_p"] == 0.5 and cfg["blur_noise_order"] == "blur_noise"

    def test_auto_without_device_cache_trains(self, tmp_path):
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=False,
                                device_augmentation="auto")
        context.init_components()
        losses = []

        class L:
            def setup(self, c): pass
            def save_context(self, c, f, i): pass
            def log(self, d): losses.append(d["loss"])
            def close(self): pass

        context.trainer.train(context, max_iterations=3, logger=L())
        assert len(losses) == 3 and np.isfinite(losses).all()

    def test_auto_with_deterministic_pipeline_disables_device_aug(
            self, tmp_path, capsys):
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=True,
                                device_augmentation="auto")
        # strip the augmentation: use the deterministic default pipeline
        context.init_components()
        context.dataset.transforms["training"] = \
            context.dataset.transforms["default"]

        class L:
            def setup(self, c): pass
            def save_context(self, c, f, i): pass
            def log(self, d): pass
            def close(self): pass

        context.trainer.train(context, max_iterations=2, logger=L())
        assert "device augmentation disabled" in capsys.readouterr().out

    def test_pretransform_with_random_pipeline_warns(self, tmp_path):
        build_dataset(tmp_path)
        context = build_context(tmp_path, device_cache=False,
                                device_augmentation=None)
        context.init_components()

        class L:
            def setup(self, c): pass
            def save_context(self, c, f, i): pass
            def log(self, d): pass
            def close(self): pass

        with pytest.warns(UserWarning, match="freezes the"):
            context.trainer.train(context, max_iterations=1, logger=L(),
                                  pretransform_training_data=True)

    def test_invalid_string_rejected_at_construction(self):
        with pytest.raises(ValueError, match="auto"):
            sp.SegmentationTrainer(
                training_batch_size=1, save_rate=1, scoring_interval=1,
                scoring_function=None, one_time_evaluators=[],
                training_evaluators=[], validation_evaluators=[],
                max_iterations_with_no_improvement=1,
                train_predictor=None, validation_predictor=None,
                train_dataloader_factory=None,
                validation_dataloader_factory=None,
                device_augmentation="automatic")
