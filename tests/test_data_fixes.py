"""Regression tests for the data/evaluator findings of the framework-wide
review: cohort-preserving pretransform, row-oriented attribute CSVs,
whitespace-robust tensor files, and empty-label-safe fingerprints.
"""
import json

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp


def _build_dataset(root, n=4, with_csv=False, missing_label_for=None):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        d = root / "subjects" / f"sub-{i:02d}"
        d.mkdir(parents=True)
        img = rng.normal(size=(1, 12, 12, 8)).astype(np.float32)
        seg = np.zeros((1, 12, 12, 8), np.int16)
        if missing_label_for is None or i != missing_label_for:
            seg[:, 3:9, 3:9, 2:6] = 1
        sp.write_nifti(d / "t1.nii.gz", img, np.eye(4))
        sp.write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"fold": i % 2}, f)
        rows.append((f"sub-{i:02d}", 20 + i, "F" if i % 2 else "M"))
    if with_csv:
        shared = root / "participants.csv"
        with open(shared, "w") as f:
            f.write("name,age,sex\n")
            for name, age, sex in rows:
                f.write(f"{name},{age},{sex}\n")
    return root


def _loader(with_csv=False, csv_root=None):
    loaders = [
        sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                       image_constructor=sp.ScalarImage),
        sp.ImageLoader(glob_pattern="seg.*", image_name="seg",
                       image_constructor=sp.LabelMap, label_values={"fg": 1}),
        sp.AttributeLoader(glob_pattern="attributes.*"),
    ]
    if with_csv:
        loaders.append(sp.AttributeLoader(
            glob_pattern=str(csv_root / "participants.csv"),
            multi_subject=True, uniform=True))
    return sp.ComposeLoaders(loaders)


def _cohorts():
    return {
        "all": sp.RequireAttributes(["t1"]),
        "training": sp.ForbidAttributes({"fold": 0}),
        "validation": sp.RequireAttributes({"fold": 0}),
    }


class TestPretransformKeepsCohorts:
    def test_cohort_switch_after_pretransform(self, tmp_path):
        _build_dataset(tmp_path)
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=_loader(), cohorts=_cohorts(),
                              transforms={"default": sp.RescaleIntensity((0, 1))})
        ds.set_cohort("training")
        n_train = len(ds)
        ds.preload_and_transform_subjects()
        assert len(ds) == n_train
        ds.set_cohort("validation")
        assert len(ds) == 4 - n_train, \
            "pretransform must not discard non-cohort subjects"
        ds.set_cohort("all")
        assert len(ds) == 4


class TestAttributeCsv:
    def test_multi_subject_csv_attaches_by_name(self, tmp_path):
        _build_dataset(tmp_path, with_csv=True)
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=_loader(True, tmp_path),
                              cohorts=_cohorts())
        s = ds.all_subjects[0]
        assert s["age"] == 20
        assert s["sex"] == "M"
        assert ds.all_subjects[3]["age"] == 23

    def test_single_subject_csv_scalar_attributes(self, tmp_path):
        d = tmp_path / "subjects" / "s0"
        d.mkdir(parents=True)
        sp.write_nifti(d / "t1.nii.gz", np.zeros((1, 4, 4, 4), np.float32),
                       np.eye(4))
        with open(d / "info.csv", "w") as f:
            f.write("name,age\ns0,31\n")
        loader = sp.ComposeLoaders([
            sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                           image_constructor=sp.ScalarImage),
            sp.AttributeLoader(glob_pattern="info.csv"),
        ])
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=loader,
                              cohorts={"all": sp.RequireAttributes(["t1"])})
        assert ds.all_subjects[0]["age"] == 31  # scalar, not {row: value}


class TestTensorLoaderWhitespace:
    def test_repeated_spaces_and_tabs(self, tmp_path):
        d = tmp_path / "subjects" / "s0"
        d.mkdir(parents=True)
        sp.write_nifti(d / "t1.nii.gz", np.zeros((1, 4, 4, 4), np.float32),
                       np.eye(4))
        with open(d / "grads.txt", "w") as f:
            f.write("1.0  0.0\t0.5 \n0.0   1.0\t 0.25 \n")
        loader = sp.ComposeLoaders([
            sp.ImageLoader(glob_pattern="t1.*", image_name="t1",
                           image_constructor=sp.ScalarImage),
            sp.TensorLoader(glob_pattern="grads.txt", tensor_name="grads"),
        ])
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=loader,
                              cohorts={"all": sp.RequireAttributes(["t1"])})
        grads = np.asarray(ds.all_subjects[0]["grads"])
        np.testing.assert_allclose(grads, [[1.0, 0.0, 0.5], [0.0, 1.0, 0.25]])


class TestFingerprintRobustness:
    def test_subject_missing_label_does_not_crash(self, tmp_path):
        _build_dataset(tmp_path, missing_label_for=1)
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=_loader(), cohorts=_cohorts())
        subject_fps, summary = sp.get_dataset_fingerprint(ds)
        assert len(subject_fps) == 4
        # the empty-label subject has no 'fg' box; the others do
        assert "fg" not in subject_fps["sub-01"]["label_bounds"]["seg"]
        assert "fg" in subject_fps["sub-00"]["label_bounds"]["seg"]
        # summary still aggregates the three real boxes
        assert "fg" in summary["label_bounds"]["seg"]

    def test_fingerprint_does_not_pin_dataset_in_ram(self, tmp_path):
        _build_dataset(tmp_path)
        ds = sp.SubjectFolder(root=str(tmp_path), subject_path="subjects",
                              subject_loader=_loader(), cohorts=_cohorts())
        sp.get_dataset_fingerprint(ds)
        for s in ds.all_subjects:
            assert not s["t1"].loaded, \
                "fingerprinting must not load the pristine stored subjects"


class TestSamplerHookRefactor:
    def test_label_sampler_fit_check(self):
        from tests.conftest import make_subject

        s = make_subject(spatial_shape=(8, 8, 8))
        sampler = sp.LabelSampler(patch_size=16, label_name="seg")
        with pytest.raises(RuntimeError, match="exceeds"):
            list(sampler(s, 1))

    def test_label_sampler_centers_on_labels(self):
        from tests.conftest import make_subject

        s = make_subject(spatial_shape=(16, 16, 16))
        sampler = sp.LabelSampler(patch_size=4, label_name="seg")
        for patch in sampler(s, 8):
            seg = np.asarray(patch["seg"].data)
            assert seg.any(), "patch center must be a label voxel"
