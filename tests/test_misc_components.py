"""nnUNet export, visualizations, config mixin, DWI augmentation tests."""
import json
import pickle

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.utils.config import Config, get_nested_config
from segmentation_pipeline_tpu.utils.nn_unet_convert import save_dataset_as_nn_unet
from tests.conftest import make_subject


class _MiniDataset:
    def __init__(self, subjects):
        self.subjects = subjects

    def __len__(self):
        return len(self.subjects)

    def __getitem__(self, i):
        return self.subjects[i]

    def __iter__(self):
        return iter(self.subjects)


class TestNNUnetExport:
    def test_export_layout(self, tmp_path):
        subjects = []
        for i in range(3):
            s = make_subject(seed=i, name=f"sub{i}", label_values={"fg": 1})
            s["fold"] = i % 2
            subjects.append(s)
        ds = _MiniDataset(subjects)
        save_dataset_as_nn_unet(
            ds, str(tmp_path), "Task501_test",
            image_names=["img"], label_map_name="seg",
            output_folds=True, num_folds=2)

        assert (tmp_path / "imagesTr" / "Task501_test_001_0000.nii.gz").exists()
        assert (tmp_path / "labelsTr" / "Task501_test_001.nii.gz").exists()
        with open(tmp_path / "dataset.json") as f:
            meta = json.load(f)
        assert meta["numTraining"] == 3
        assert meta["labels"] == {"0": "background", "1": "fg"}
        with open(tmp_path / "splits_final.pkl", "rb") as f:
            splits = pickle.load(f)
        assert len(splits) == 2
        assert isinstance(splits[0]["train"], np.ndarray)

    def test_convert_predictions_roundtrip(self, tmp_path):
        from research.dmri_hippo.nn_unet import convert_predictions
        import sys

        preds = tmp_path / "nn_out"
        preds.mkdir()
        sp.write_nifti(preds / "Task501_001.nii.gz",
                       np.ones((1, 4, 4, 4), np.int16), np.eye(4))
        names = tmp_path / "original_subject_names.json"
        with open(names, "w") as f:
            json.dump({"cross_validation_subjects": {"subA": "Task501_001"},
                       "test_subjects": {}}, f)
        out = tmp_path / "out"
        argv = sys.argv
        sys.argv = ["x", str(preds), str(names), str(out), "--label-name", "nnunet"]
        try:
            convert_predictions.main()
        finally:
            sys.argv = argv
        assert (out / "subjects" / "subA" / "nnunet.nii.gz").exists()


class TestVisualizations:
    def test_vis_features_headless(self):
        from segmentation_pipeline_tpu.visualizations import vis_features

        fm = np.random.default_rng(0).normal(size=(4, 8, 8, 8))
        fig = vis_features(fm)  # no ipywidgets -> static figure
        assert fig is not None

    def test_vis_model_intermediates(self):
        from segmentation_pipeline_tpu.training.model import SegModel
        from segmentation_pipeline_tpu.visualizations import vis_model

        s = make_subject(spatial_shape=(8, 8, 8))
        s["X"] = s["img"]
        model = SegModel(sp.NestedResUNet(input_channels=1, output_channels=2,
                                          filters=4))
        activations = vis_model(model, s)
        assert activations
        sample = next(iter(activations.values()))
        assert sample.ndim == 4  # (C, W, H, D)


class TestConfigMixin:
    def test_config_harvest(self):
        class Thing(Config):
            def __init__(self, a, b=2):
                self.a = a
                self.b = b

        cfg = Thing(1).get_config()
        assert cfg["a"] == 1 and cfg["b"] == 2
        nested = get_nested_config({"t": Thing(3)})
        assert nested["t"]["a"] == 3


class TestDWI:
    def test_reconstruct_mean_dwi(self):
        rng = np.random.default_rng(0)
        s = make_subject(spatial_shape=(8, 8, 8), with_label=False)
        n_grad = 20
        full = rng.normal(size=(n_grad, 8, 8, 8)).astype(np.float32)
        grad = np.concatenate([
            rng.normal(size=(n_grad, 3)), np.full((n_grad, 1), 400.0)], axis=1)
        grad[0, 3] = 0.0  # b0 excluded by bval_range
        s["full_dwi"] = sp.ScalarImage(tensor=full, affine=np.eye(4), grad=grad)
        t = sp.ReconstructMeanDWI(num_dwis=(1, 7), num_directions=(1, 3),
                                  directionality=(4, 10))
        t(s)
        assert "mean_dwi" in s
        assert s["mean_dwi"].data.shape == (1, 8, 8, 8)
