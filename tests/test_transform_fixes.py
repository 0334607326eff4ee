"""Regression tests for the transform/core findings of the framework-wide
code review: selective-inverse propagation, out-of-place inversion, p-gating,
empty-mask normalization, interpolation-order dispatch, OneOf filtering,
list-valued ranges, and selection-honoring CopyAffine.
"""
import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.transforms.base import invert_records
from tests.conftest import make_subject


def _two_image_subject(shape=(10, 10, 10)):
    s = Subject({"name": "s0", "folder": "/tmp"})
    rng = np.random.default_rng(0)
    s["a"] = ScalarImage(tensor=rng.normal(size=(1, *shape)).astype(np.float32),
                         affine=np.eye(4))
    s["b"] = ScalarImage(tensor=rng.normal(size=(1, *shape)).astype(np.float32),
                         affine=np.eye(4))
    return s


class TestSelectiveInverse:
    def test_crop_inverse_respects_include(self):
        s = _two_image_subject()
        b_before = np.asarray(s["b"].data).copy()
        sp.Crop((1, 1, 1, 1, 1, 1), include=["a"])(s)
        assert s["a"].spatial_shape == (8, 8, 8)
        assert s["b"].spatial_shape == (10, 10, 10)
        out = invert_records(s, s.get_composed_history(), warn=False)
        assert out["a"].spatial_shape == (10, 10, 10)
        assert out["b"].spatial_shape == (10, 10, 10)
        np.testing.assert_array_equal(np.asarray(out["b"].data), b_before)

    def test_pad_inverse_respects_include(self):
        s = _two_image_subject()
        sp.Pad((2, 2, 0, 0, 0, 0), include=["a"])(s)
        assert s["a"].spatial_shape == (14, 10, 10)
        out = invert_records(s, s.get_composed_history(), warn=False)
        assert out["a"].spatial_shape == (10, 10, 10)
        assert out["b"].spatial_shape == (10, 10, 10)

    def test_min_size_pad_inverse_respects_include(self):
        s = _two_image_subject()
        sp.MinSizePad(16, include=["a"])(s)
        assert s["a"].spatial_shape == (16, 16, 16)
        assert s["b"].spatial_shape == (10, 10, 10)
        out = invert_records(s, s.get_composed_history(), warn=False)
        assert out["a"].spatial_shape == (10, 10, 10)
        assert out["b"].spatial_shape == (10, 10, 10)


class TestApplyInverseTransform:
    def test_returns_new_subject_with_empty_history(self):
        s = _two_image_subject()
        sp.Pad((1, 1, 1, 1, 1, 1))(s)
        out = s.apply_inverse_transform(warn=False)
        assert out is not s
        assert out.history == []
        assert len(s.history) == 1  # original untouched
        assert s["a"].spatial_shape == (12, 12, 12)
        assert out["a"].spatial_shape == (10, 10, 10)
        # idempotent: inverting the returned subject again is a no-op
        out2 = out.apply_inverse_transform(warn=False)
        assert out2["a"].spatial_shape == (10, 10, 10)


class TestRandomPGating:
    def test_random_permute_respects_p_zero(self):
        applied = 0
        for seed in range(20):
            s = make_subject(spatial_shape=(8, 6, 4), seed=seed)
            t = sp.RandomPermuteDimensions(p=0.0)
            t(s)
            if s["img"].spatial_shape != (8, 6, 4) or s.history:
                applied += 1
        assert applied == 0

    def test_random_permute_applies_with_p_one(self):
        permuted = 0
        for seed in range(20):
            s = make_subject(spatial_shape=(8, 6, 4), seed=seed)
            t = sp.RandomPermuteDimensions(p=1.0)
            t(s)
            permuted += len(s.history)
        assert permuted == 20


class TestZNormalizationEmptyMask:
    def test_empty_mask_raises(self):
        s = make_subject(spatial_shape=(8, 8, 8))
        s["mask"] = LabelMap(tensor=np.zeros((1, 8, 8, 8), np.int32),
                             affine=np.eye(4))
        with pytest.raises(RuntimeError, match="no\\s*voxels|selects no"):
            sp.ZNormalization(masking_method="mask")(s)


class TestInterpolationOrders:
    def test_random_affine_nearest_preserves_quantization(self):
        s = make_subject(spatial_shape=(12, 12, 8))
        # quantized intensities: nearest must not invent new values
        data = np.asarray(s["img"].data)
        s["img"].set_data(np.rint(data * 2).astype(np.float32))
        values_before = set(np.unique(np.asarray(s["img"].data)))
        sp.RandomAffine(scales=0.1, degrees=10, translation=1,
                        image_interpolation="nearest")(s)
        values_after = set(np.unique(np.asarray(s["img"].data)))
        assert values_after <= values_before

    def test_unknown_interpolation_raises(self):
        with pytest.raises(ValueError):
            from segmentation_pipeline_tpu.transforms.random_spatial import (
                _interp_order)
            _interp_order("quartic", is_label=False)


class TestFilterTransformOneOf:
    def test_exclude_inside_oneof(self):
        pipeline = sp.Compose([
            sp.OneOf([sp.RandomNoise(), sp.RandomAffine()]),
            sp.RandomFlip(),
        ])
        out = sp.filter_transform(pipeline, exclude_types=[sp.RandomAffine])
        one_of = out.transforms[0]
        kinds = [type(t) for t in one_of.transforms]
        assert sp.RandomAffine not in kinds
        assert kinds == [sp.RandomNoise]
        # weights renormalized
        np.testing.assert_allclose(np.sum(one_of.weights), 1.0)

    def test_oneof_emptied_is_dropped(self):
        pipeline = sp.Compose([sp.OneOf([sp.RandomAffine()]), sp.RandomNoise()])
        out = sp.filter_transform(pipeline, exclude_types=[sp.RandomAffine])
        kinds = [type(t) for t in out.transforms]
        assert sp.RandomAffine not in kinds
        assert kinds == [sp.RandomNoise]


class TestListRanges:
    def test_intensity_transforms_accept_lists(self):
        s = make_subject(spatial_shape=(8, 8, 8))
        sp.RandomNoise(std=[0.0, 0.25])(s)
        sp.RandomBlur(std=[0, 2])(s)
        sp.RandomGamma(log_gamma=[-0.3, 0.3])(s)
        sp.RandomBiasField(coefficients=[-0.5, 0.5])(s)
        assert np.isfinite(np.asarray(s["img"].data)).all()


class TestCopyAffineSelection:
    def test_exclude_respected(self):
        s = _two_image_subject()
        s["b"].affine = np.diag([2.0, 2.0, 2.0, 1.0])
        s["c"] = ScalarImage(tensor=np.zeros((1, 10, 10, 10), np.float32),
                             affine=np.diag([3.0, 3.0, 3.0, 1.0]))
        sp.CopyAffine(target="a", exclude=["c"])(s)
        np.testing.assert_array_equal(s["b"].affine, np.eye(4))
        np.testing.assert_array_equal(s["c"].affine,
                                      np.diag([3.0, 3.0, 3.0, 1.0]))
