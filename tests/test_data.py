"""Data layer tests: loaders, filters, SubjectFolder, fingerprint."""
import json

import numpy as np
import pytest

from segmentation_pipeline_tpu.core.nifti import write_nifti
from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage
from segmentation_pipeline_tpu.data import (
    AnyFilter,
    AttributeLoader,
    ComposeFilters,
    ComposeLoaders,
    ForbidAttributes,
    ImageLoader,
    NegateFilter,
    RandomFoldFilter,
    RandomSelectFilter,
    RequireAttributes,
    SubjectFolder,
    get_dataset_fingerprint,
)
from segmentation_pipeline_tpu.transforms import Compose, RescaleIntensity


@pytest.fixture
def dataset_root(tmp_path):
    """Synthetic subject-folder dataset with 6 subjects."""
    root = tmp_path / "ds"
    subj_dir = root / "subjects"
    rng = np.random.default_rng(0)
    for i in range(6):
        d = subj_dir / f"sub-{i:03d}"
        d.mkdir(parents=True)
        img = rng.normal(size=(1, 12, 10, 8)).astype(np.float32)
        write_nifti(d / "t1.nii.gz", img, np.eye(4))
        seg = np.zeros((1, 12, 10, 8), dtype=np.int16)
        seg[:, 3:9, 2:8, 2:6] = 1
        write_nifti(d / "seg.nii.gz", seg, np.eye(4))
        with open(d / "attributes.json", "w") as f:
            json.dump({"age": 20 + i, "site": "A" if i < 3 else "B"}, f)
    # multi-subject attribute file at the root
    (root / "attributes").mkdir()
    with open(root / "attributes" / "split.json", "w") as f:
        json.dump({f"sub-{i:03d}": {"test": i >= 4} for i in range(6)}, f)
    return root


@pytest.fixture
def loader():
    return ComposeLoaders([
        ImageLoader(glob_pattern="t1.*", image_name="t1", image_constructor=ScalarImage),
        ImageLoader(glob_pattern="seg.*", image_name="seg", image_constructor=LabelMap,
                    label_values={"fg": 1}),
        AttributeLoader(glob_pattern="attributes.*"),
        AttributeLoader(glob_pattern="../../attributes/split.json",
                        multi_subject=True, uniform=True),
    ])


class TestSubjectFolder:
    def test_loading(self, dataset_root, loader):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        assert len(ds) == 6
        s = ds[0]
        assert s["name"] == "sub-000"
        assert s["age"] == 20
        assert s["t1"].data.shape == (1, 12, 10, 8)
        assert s["seg"]["label_values"] == {"fg": 1}
        assert s["test"] is False

    def test_cohorts_and_transforms(self, dataset_root, loader):
        cohorts = {
            "all": RequireAttributes(["t1"]),
            "training": ForbidAttributes({"test": True}),
            "test": RequireAttributes({"test": True}),
            "siteA": RequireAttributes({"site": "A"}),
        }
        transforms = {
            "default": Compose([]),
            "training": Compose([RescaleIntensity((0, 1))]),
        }
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader, cohorts=cohorts, transforms=transforms)
        ds.set_cohort("test")
        assert len(ds) == 2
        ds.set_cohort("training")
        assert len(ds) == 4
        s = ds[0]
        assert np.asarray(s["t1"].data).max() <= 1.0
        assert len(s.history) == 1

    def test_get_cohort_dataset(self, dataset_root, loader):
        cohorts = {"training": ForbidAttributes({"test": True})}
        transforms = {"default": Compose([]),
                      "training": Compose([RescaleIntensity((0, 1))])}
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader, cohorts=cohorts, transforms=transforms)
        sub = ds.get_cohort_dataset("training")
        assert len(sub) == 4
        s = sub[0]
        assert np.asarray(s["t1"].data).max() <= 1.0  # training transform became default

    def test_getitem_by_name_and_deepcopy(self, dataset_root, loader):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        s1 = ds["sub-002"]
        s1["t1"].data[:] = 0
        s2 = ds["sub-002"]
        assert not np.allclose(np.asarray(s2["t1"].data), 0)

    def test_preload(self, dataset_root, loader):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        ds.preload_subjects()
        assert all(s["t1"].loaded for s in ds.all_subjects)

    def test_load_additional_data(self, dataset_root, loader, tmp_path):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        pred_dir = tmp_path / "preds"
        for i in range(2):
            d = pred_dir / f"sub-{i:03d}"
            d.mkdir(parents=True)
            write_nifti(d / "y_pred.nii.gz", np.ones((1, 12, 10, 8), np.int16), np.eye(4))
        ds.load_additional_data(str(pred_dir), ImageLoader(
            glob_pattern="y_pred.*", image_name="y_pred", image_constructor=LabelMap))
        assert "y_pred" in ds["sub-000"]
        assert "y_pred" not in ds["sub-003"]


class TestFilters:
    def _subjects(self, dataset_root, loader):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        return ds.all_subjects

    def test_require_forbid(self, dataset_root, loader):
        subjects = self._subjects(dataset_root, loader)
        assert len(RequireAttributes({"site": "A"})(subjects)) == 3
        assert len(ForbidAttributes({"site": "A"})(subjects)) == 3
        assert len(RequireAttributes(["t1", "seg"])(subjects)) == 6
        assert len(RequireAttributes({"age": range(20, 23)})(subjects)) == 3

    def test_compose_any_negate(self, dataset_root, loader):
        subjects = self._subjects(dataset_root, loader)
        a = RequireAttributes({"site": "A"})
        test = RequireAttributes({"test": True})
        assert len(ComposeFilters(a, test)(subjects)) == 0
        assert len(AnyFilter([a, test])(subjects)) == 5
        assert len(NegateFilter(a)(subjects)) == 3

    def test_random_fold_filter(self, dataset_root, loader):
        subjects = self._subjects(dataset_root, loader)
        fold0 = RandomFoldFilter(num_folds=3, selection=0, seed=7)(subjects)
        assert len(fold0) == 2
        assert all("fold" in s for s in subjects)
        # deterministic across re-application
        fold0b = RandomFoldFilter(num_folds=3, selection=0, seed=7)(subjects)
        assert [s["name"] for s in fold0] == [s["name"] for s in fold0b]

    def test_random_select(self, dataset_root, loader):
        subjects = self._subjects(dataset_root, loader)
        sel = RandomSelectFilter(num_subjects=3, seed=1)(subjects)
        assert len(sel) == 3


class TestFingerprint:
    def test_fingerprint(self, dataset_root, loader):
        ds = SubjectFolder(root=str(dataset_root), subject_path="subjects",
                           subject_loader=loader)
        ds.preload_subjects()
        per_subject, summary = get_dataset_fingerprint(ds, save=True)
        assert len(per_subject) == 6
        fp = per_subject["sub-000"]
        assert fp["spatial_shape"] == (12, 10, 8)
        assert "fg" in fp["label_bounds"]["seg"]
        assert (dataset_root / "fingerprint" / "fingerprint.json").exists()
        assert "spacing" in summary
