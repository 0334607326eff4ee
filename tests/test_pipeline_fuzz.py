"""Property-based round-trip fuzz: random invertible geometric pipelines
applied to a subject must invert exactly through the history tape.

The per-op inverse tests (test_transforms.py) don't exercise COMPOSITIONS:
inverse records must replay in reverse order with correct include/exclude
propagation across arbitrary crop/pad/flip/permute stacks. The label blob
is kept far enough from every face that no crop in the pipeline can clip
it, so a lossless round trip is the exact property."""
import numpy as np
import pytest

from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.transforms import (
    Compose,
    Crop,
    CropOrPad,
    Flip,
    Pad,
    PermuteDimensions,
)

S = 20          # cube side
BLOB = (8, 13)  # blob extent per axis: margin 8 >= max cumulative crop 6


def make_subject(seed):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(2, S, S, S)).astype(np.float32)
    lab = np.zeros((1, S, S, S), np.int16)
    lab[:, BLOB[0]:BLOB[1], BLOB[0]:BLOB[1], BLOB[0]:BLOB[1]] = \
        rng.integers(1, 4, (BLOB[1] - BLOB[0],) * 3)
    subject = Subject(name=f"fuzz-{seed}", folder="/tmp")
    subject["img"] = ScalarImage(tensor=img, affine=np.diag([1.5, 1.0, 2.0, 1.0]))
    subject["seg"] = LabelMap(tensor=lab, affine=np.diag([1.5, 1.0, 2.0, 1.0]),
                              label_values={"a": 1, "b": 2, "c": 3})
    return subject


def random_op(rng):
    kind = rng.integers(0, 4)
    if kind == 0:
        bounds = tuple(int(b) for b in rng.integers(0, 3, 6))
        return Crop(bounds)
    if kind == 1:
        bounds = tuple(int(b) for b in rng.integers(0, 4, 6))
        return Pad(bounds)
    if kind == 2:
        axes = tuple(int(a) for a in np.flatnonzero(rng.integers(0, 2, 3)))
        return Flip(axes) if axes else Flip((0,))
    perm = tuple(int(p) for p in rng.permutation(3))
    return PermuteDimensions(perm)


@pytest.mark.parametrize("seed", range(20))
def test_random_pipeline_roundtrip(seed):
    rng = np.random.default_rng(seed)
    ops = [random_op(rng) for _ in range(int(rng.integers(1, 4)))]
    # half the runs get a final CropOrPad to a nearby shape
    if rng.integers(0, 2):
        target = tuple(int(t) for t in rng.integers(S - 2, S + 5, 3))
        ops.append(CropOrPad(target))
    pipeline = Compose(ops)

    subject = make_subject(seed)
    original_img = np.asarray(subject["img"].data).copy()
    original_lab = np.asarray(subject["seg"].data).copy()
    original_affine = np.asarray(subject["img"].affine).copy()

    pipeline(subject)
    assert len(subject.history) >= 1
    subject = subject.apply_inverse_transform(warn=False)

    assert subject["seg"].data.shape == original_lab.shape
    assert subject["img"].data.shape == original_img.shape
    np.testing.assert_allclose(np.asarray(subject["img"].affine),
                               original_affine, atol=1e-5)
    # the blob never touches a cropped face: label round trip is exact
    np.testing.assert_array_equal(np.asarray(subject["seg"].data),
                                  original_lab)
    # image content inside the blob region is exact too (never cropped)
    inner = (slice(None),) + (slice(*BLOB),) * 3
    np.testing.assert_allclose(np.asarray(subject["img"].data)[inner],
                               original_img[inner], atol=1e-5)


class TestEvalSpaceInversionFuzz:
    """add_evaluation_labels must map y_pred and y through the SAME
    label-only inverse: for a fabricated y_pred identical to y, the eval
    images must come out identical for any random pipeline."""

    @pytest.mark.parametrize("seed", range(10))
    def test_pred_and_target_land_in_same_space(self, seed):
        import copy

        from segmentation_pipeline_tpu.prediction import add_evaluation_labels
        from segmentation_pipeline_tpu.transforms import (
            CustomOneHot,
            RandomNoise,
            RenameProperty,
            RescaleIntensity,
        )

        rng = np.random.default_rng(100 + seed)
        ops = [random_op(rng) for _ in range(int(rng.integers(1, 4)))]
        pipeline = Compose(ops + [
            RescaleIntensity((-1, 1)),
            RandomNoise(std=(0.05, 0.05)),
            RenameProperty(old_name="seg", new_name="y"),
            CustomOneHot(include=["y"]),
        ])
        subject = make_subject(200 + seed)
        pipeline(subject)

        subject["y_pred"] = copy.deepcopy(subject["y"])
        add_evaluation_labels([subject])
        assert "y_eval" in subject and "y_pred_eval" in subject
        y_eval = np.asarray(subject["y_eval"].data)
        y_pred_eval = np.asarray(subject["y_pred_eval"].data)
        np.testing.assert_array_equal(y_pred_eval, y_eval)
        # eval space is the TRANSFORMED (post-geometry) space: only the
        # label-ENCODING transforms invert (ref prediction.py:155-170), so
        # y_eval must be the integer ids of the one-hot y, same grid
        y = np.asarray(subject["y"].data)
        assert y_eval.shape[1:] == y.shape[1:]
        got_ids = y_eval[0] if y_eval.shape[0] == 1 else np.argmax(y_eval, 0)
        np.testing.assert_array_equal(got_ids, np.argmax(y, axis=0))
