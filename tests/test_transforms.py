"""Transform engine tests: golden values + inverse round-trips (SURVEY §4)."""
import numpy as np
import pytest

from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.transforms import (
    Compose,
    ConcatenateImages,
    Crop,
    CropOrPad,
    CropToMask,
    CustomArgMax,
    CustomOneHot,
    CustomRemapLabels,
    CustomRemoveLabels,
    CustomSequentialLabels,
    EnforceConsistentAffine,
    Flip,
    ImageFromLabels,
    LabelTransform,
    MergeLabels,
    MinSizePad,
    OneOf,
    Pad,
    PermuteDimensions,
    RandomBiasField,
    RandomBlur,
    RandomElasticDeformation,
    RandomFlip,
    RandomGamma,
    RandomNoise,
    RenameProperty,
    ReplaceNan,
    Resample,
    RescaleIntensity,
    SetDataType,
    TargetResample,
    ZNormalization,
    apply_inverse_on_new_subject,
    filter_records,
    invert_records,
    seed_all,
)
from tests.conftest import make_subject


@pytest.fixture(autouse=True)
def _seed():
    seed_all(0)


class TestStructural:
    def test_concat_split_roundtrip(self):
        s = make_subject(channels=1)
        s["img2"] = ScalarImage(tensor=2 * np.ones((1, 24, 20, 16), dtype=np.float32))
        ConcatenateImages(["img", "img2"], [1, 1], "X")(s)
        assert s["X"].data.shape[0] == 2
        s2 = invert_records(s, s.history, warn=False)
        assert "X" in s2  # split re-creates components; X untouched by inverse split
        np.testing.assert_allclose(np.asarray(s2["img2"].data), 2.0)

    def test_rename_inverse(self):
        s = make_subject()
        RenameProperty("seg", "y")(s)
        assert "y" in s and "seg" not in s
        invert_records(s, s.history, warn=False)
        assert "seg" in s and "y" not in s

    def test_permute_roundtrip(self):
        s = make_subject(spatial_shape=(8, 10, 12))
        orig = np.asarray(s["img"].data).copy()
        PermuteDimensions((2, 0, 1))(s)
        assert s["img"].data.shape == (1, 12, 8, 10)
        invert_records(s, s.history, warn=False)
        np.testing.assert_array_equal(np.asarray(s["img"].data), orig)


class TestLabelTransforms:
    def test_remap_with_mask(self):
        s = make_subject(label_values={"left": 1, "right": 2})
        CustomRemapLabels(remapping=[("right", 2, 1)], masking_method="Right",
                          include=["seg"])(s)
        data = np.asarray(s["seg"].data)
        assert set(np.unique(data)) <= {0, 1}
        assert s["seg"]["label_values"]["right"] == 1
        # inverse restores the two-label map
        invert_records(s, s.history, warn=False)
        data = np.asarray(s["seg"].data)
        assert 2 in np.unique(data)

    def test_onehot_argmax_roundtrip(self):
        s = make_subject(label_values={"a": 1, "b": 2})
        orig = np.asarray(s["seg"].data).copy()
        CustomOneHot(include=["seg"])(s)
        assert s["seg"].data.shape[0] == 3
        assert s["seg"]["one_hot"] is True
        invert_records(s, s.history, warn=False)
        np.testing.assert_array_equal(np.asarray(s["seg"].data), orig)

    def test_label_transforms_skip_scalar_images(self):
        # torchio LabelTransform semantics: without include=, label transforms
        # touch only LabelMaps — a CustomOneHot at the end of a pipeline must
        # not one-hot the intensity image X.
        s = make_subject(label_values={"a": 1, "b": 2})
        x_orig = np.asarray(s["img"].data).copy()
        assert isinstance(s["img"], ScalarImage)
        CustomOneHot()(s)
        np.testing.assert_array_equal(np.asarray(s["img"].data), x_orig)
        assert s["seg"].data.shape[0] == 3  # the LabelMap did get one-hotted

    def test_remove_labels(self):
        s = make_subject(label_values={"a": 1, "b": 2})
        CustomRemoveLabels(["b"], include=["seg"])(s)
        assert 2 not in np.unique(np.asarray(s["seg"].data))
        assert "b" not in s["seg"]["label_values"]

    def test_sequential_labels(self):
        s = make_subject(label_values={"a": 3, "b": 7})
        data = np.asarray(s["seg"].data)
        data[data == 1] = 3
        data[data == 2] = 7
        s["seg"].set_data(data)
        CustomSequentialLabels(include=["seg"])(s)
        assert set(np.unique(np.asarray(s["seg"].data))) <= {0, 1, 2}
        assert s["seg"]["label_values"] == {"a": 1, "b": 2}

    def test_merge_labels(self):
        s = make_subject(label_values={"left_x": 1, "right_x": 2})
        MergeLabels([("left_x", "right_x")], left_masking_method="Left",
                    include=["seg"])(s)
        # after merging under the left mask, left voxels carry the right id
        data = np.asarray(s["seg"].data)
        left_half = data[:, :12]
        assert 1 not in np.unique(left_half)


class TestSpatial:
    def test_crop_pad_inverse(self):
        s = make_subject(spatial_shape=(16, 16, 16))
        orig_shape = s["img"].data.shape
        orig_affine = s["img"].affine.copy()
        Crop((2, 3, 1, 0, 4, 2))(s)
        assert s["img"].data.shape == (1, 11, 15, 10)
        invert_records(s, s.history, warn=False)
        assert s["img"].data.shape == orig_shape
        np.testing.assert_allclose(s["img"].affine, orig_affine)

    def test_pad_minimum_mode(self):
        s = make_subject()
        s["img"].set_data(np.full((1, 4, 4, 4), 7.0, dtype=np.float32))
        Pad((1, 1, 1, 1, 1, 1), padding_mode="minimum")(s)
        assert s["img"].data[0, 0, 0, 0] == 7.0

    def test_crop_or_pad_with_mask_inverse(self):
        s = make_subject(spatial_shape=(30, 20, 10))
        orig = np.asarray(s["img"].data).copy()
        CropOrPad((16, 24, 8), mask_name="seg", padding_mode="minimum")(s)
        assert s["img"].data.shape == (1, 16, 24, 8)
        s.check_consistent_spatial_shape()
        invert_records(s, s.history, warn=False)
        assert s["img"].data.shape == orig.shape
        # cropped-away voxels return zero-padded; overlap must match
        data = np.asarray(s["img"].data)
        inner = (slice(None), slice(6, 22), slice(0, 20), slice(0, 8))
        np.testing.assert_allclose(data[inner], orig[inner], atol=1e-5)

    def test_flip_affine_fixed_point(self):
        s = make_subject(spatial_shape=(8, 8, 8))
        affine_before = s["img"].affine.copy()
        world_before = affine_before @ np.array([3, 4, 5, 1.0])
        Flip((0,))(s)
        # voxel (4,4,5) now holds the value that was at (3,4,5); world coords consistent
        world_after = s["img"].affine @ np.array([8 - 1 - 3, 4, 5, 1.0])
        np.testing.assert_allclose(world_before, world_after)
        invert_records(s, s.history, warn=False)
        np.testing.assert_allclose(s["img"].affine, affine_before)

    def test_crop_to_mask(self):
        s = make_subject(spatial_shape=(24, 20, 16))
        CropToMask("seg")(s)
        # label blob spans quarter..3quarter
        assert s["img"].data.shape == (1, 12, 10, 8)

    def test_min_size_pad(self):
        s = make_subject(spatial_shape=(8, 30, 10))
        MinSizePad(16)(s)
        assert s["img"].spatial_shape == (16, 30, 16)
        invert_records(s, s.history, warn=False)
        assert s["img"].spatial_shape == (8, 30, 10)

    def test_resample_doubles_shape(self):
        s = make_subject(spatial_shape=(10, 10, 10), spacing=(2.0, 2.0, 2.0))
        Resample(1.0)(s)
        assert s["img"].spatial_shape == (20, 20, 20)
        assert s["img"].spacing == (1.0, 1.0, 1.0)
        assert np.issubdtype(np.asarray(s["seg"].data).dtype, np.integer)

    def test_resample_constant_image_exact(self):
        s = make_subject(spatial_shape=(10, 10, 10), spacing=(2.0, 2.0, 2.0))
        s["img"].set_data(np.full((1, 10, 10, 10), 3.5, dtype=np.float32))
        Resample(1.0)(s)
        interior = np.asarray(s["img"].data)[:, 2:-2, 2:-2, 2:-2]
        np.testing.assert_allclose(interior, 3.5, atol=1e-4)

    def test_target_resample_within_tolerance_noop(self):
        s = make_subject(spacing=(1.05, 1.0, 0.95))
        shape = s["img"].spatial_shape
        TargetResample(1.0, tolerance=0.11)(s)
        assert s["img"].spatial_shape == shape

    def test_target_resample_outside_tolerance(self):
        s = make_subject(spatial_shape=(10, 10, 10), spacing=(3.0, 1.0, 1.0))
        TargetResample(1.0, tolerance=0.11)(s)
        w_spacing = s["img"].spacing[0]
        assert abs(w_spacing - 1.0) <= 0.11

    def test_enforce_consistent_affine(self):
        s = make_subject()
        s["seg"].affine = np.diag([2.0, 2.0, 2.0, 1.0])
        EnforceConsistentAffine(source_image_name="img")(s)
        np.testing.assert_allclose(s["seg"].affine, s["img"].affine)


class TestIntensity:
    def test_replace_nan(self):
        s = make_subject()
        data = np.asarray(s["img"].data)
        data[0, 0, 0, 0] = np.nan
        s["img"].set_data(data)
        ReplaceNan()(s)
        assert np.isfinite(np.asarray(s["img"].data)).all()

    def test_rescale_intensity(self):
        s = make_subject()
        RescaleIntensity((-1, 1), (1, 99))(s)
        data = np.asarray(s["img"].data)
        assert data.min() >= -1.0 - 1e-6 and data.max() <= 1.0 + 1e-6

    def test_znorm(self):
        s = make_subject()
        ZNormalization()(s)
        data = np.asarray(s["img"].data)
        assert abs(data.mean()) < 1e-5
        assert abs(data.std() - 1.0) < 1e-4

    def test_set_data_type(self):
        s = make_subject()
        SetDataType(np.float64)(s)
        assert np.asarray(s["img"].data).dtype == np.float64
        assert np.asarray(s["seg"].data).dtype == np.int32  # labels untouched

    def test_random_noise_changes_data(self):
        s = make_subject()
        before = np.asarray(s["img"].data).copy()
        RandomNoise(std=0.5)(s)
        assert not np.allclose(before, np.asarray(s["img"].data))

    def test_random_blur_smooths(self):
        s = make_subject()
        before_var = np.asarray(s["img"].data).var()
        RandomBlur((1.0, 2.0))(s)
        assert np.asarray(s["img"].data).var() < before_var

    def test_random_gamma_positive(self):
        s = make_subject()
        s["img"].set_data(np.abs(np.asarray(s["img"].data)) + 0.1)
        RandomGamma((0.2, 0.3))(s)
        assert np.isfinite(np.asarray(s["img"].data)).all()

    def test_bias_field_multiplicative(self):
        s = make_subject()
        s["img"].set_data(np.ones((1, 24, 20, 16), dtype=np.float32))
        RandomBiasField(coefficients=0.5)(s)
        data = np.asarray(s["img"].data)
        assert data.std() > 0  # field varies smoothly
        assert (data > 0).all()  # exp() keeps positivity


class TestRandomSpatial:
    def test_random_flip_invertible_via_tape(self):
        seed_all(3)
        s = make_subject()
        orig = np.asarray(s["img"].data).copy()
        RandomFlip(axes=(0, 1, 2), flip_probability=1.0)(s)
        assert not np.array_equal(orig, np.asarray(s["img"].data))
        invert_records(s, s.history, warn=False)
        np.testing.assert_array_equal(orig, np.asarray(s["img"].data))

    def test_elastic_moves_data(self):
        s = make_subject(spatial_shape=(24, 24, 24))
        before = np.asarray(s["img"].data).copy()
        RandomElasticDeformation(num_control_points=5, max_displacement=6.0,
                                 locked_borders=1)(s)
        assert not np.allclose(before, np.asarray(s["img"].data))
        assert np.asarray(s["seg"].data).dtype == np.int32

    def test_affine_identity_params(self):
        from segmentation_pipeline_tpu.transforms import RandomAffine

        s = make_subject()
        before = np.asarray(s["img"].data).copy()
        t = RandomAffine(scales=(1.0, 1.0), degrees=(0.0, 0.0), translation=(0.0, 0.0))
        t(s)
        np.testing.assert_allclose(before, np.asarray(s["img"].data), atol=1e-4)


class TestPipeline:
    def test_compose_and_eval_inverse(self):
        """End-to-end: the add_evaluation_labels-style label-only inverse."""
        s = make_subject(spatial_shape=(30, 20, 10), label_values={"fg": 1})
        pipeline = Compose([
            ReplaceNan(),
            CropOrPad((16, 16, 8), padding_mode="minimum", mask_name="seg"),
            RenameProperty("seg", "y"),
            CustomOneHot(include=["y"]),
        ])
        pipeline(s)
        assert s["y"].data.shape == (2, 16, 16, 8)

        # prediction in transformed space
        pred = Subject({"y": LabelMap(tensor=np.asarray(s["y"].data).copy(),
                                      affine=s["y"].affine,
                                      label_values={"fg": 1})})
        from segmentation_pipeline_tpu.transforms.structural import (
            ConcatenateImages as CI,
            CopyProperty,
            RenameProperty as RP,
        )

        label_types = [LabelTransform, CopyProperty, RP, CI]
        out = apply_inverse_on_new_subject(s.history, pred, include_types=label_types)
        img = out.get_first_image()
        # back to 1-channel int labels in the *cropped* space (CropOrPad is not
        # a label transform, matching ref prediction.py:158 semantics)
        assert img.data.shape == (1, 16, 16, 8)
        assert set(np.unique(np.asarray(img.data))) <= {0, 1}

    def test_oneof_picks_one(self):
        seed_all(1)
        s = make_subject()
        t = OneOf({RandomNoise(std=0.5): 0.5, RandomBlur((1.0, 2.0)): 0.5})
        t(s)
        assert len(s.history) == 1

    def test_filter_records(self):
        s = make_subject()
        RescaleIntensity((0, 1))(s)
        CustomOneHot(include=["seg"])(s)
        label_only = filter_records(s.history, include_types=[LabelTransform])
        assert len(label_only) == 1

    def test_image_from_labels(self):
        s = make_subject(label_values={"fg": 1})
        ImageFromLabels(new_image_name="patch_probability",
                        label_weights=[("seg", "fg", 100)])(s)
        pp = np.asarray(s["patch_probability"].data)
        assert pp.max() == 100
        assert pp.min() == 0
