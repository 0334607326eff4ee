"""Invertible RandomAffine / RandomElasticDeformation (VERDICT r2 #2).

The reference inherits invertible applied Affine/ElasticDeformation objects
from torchio (the machinery behind ref prediction.py:157-170 and
hippo_inference.py:27-32 full-history inversion); here the Random* transforms
dispatch concrete invertible Affine/ElasticDeformation onto the tape.

Round-trip correctness is asserted on LINEAR RAMP images: linear/cubic spline
interpolation reproduces affine functions exactly, so any interior error is
coordinate error, not interpolation loss.
"""
import numpy as np
import pytest

from segmentation_pipeline_tpu.core.subject import LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.transforms import (
    Affine,
    ElasticDeformation,
    RandomAffine,
    RandomElasticDeformation,
    invert_records,
    seed_all,
)
from segmentation_pipeline_tpu.transforms.random_spatial import (
    invert_displacement_field_voxels,
)


def _ramp_subject(shape=(32, 28, 24), spacing=(1.0, 1.0, 1.0), label=True):
    W, H, D = shape
    w, h, d = np.meshgrid(np.arange(W), np.arange(H), np.arange(D),
                          indexing="ij")
    ramp = (0.5 * w + 0.25 * h - 0.125 * d).astype(np.float32)[None]
    s = Subject(name="ramp")
    affine = np.diag([*spacing, 1.0])
    s["img"] = ScalarImage(tensor=ramp, affine=affine)
    if label:
        seg = np.zeros((1, W, H, D), np.int32)
        seg[:, W // 4: 3 * W // 4, H // 4: 3 * H // 4, D // 4: 3 * D // 4] = 1
        s["seg"] = LabelMap(tensor=seg, affine=affine,
                            label_values={"fg": 1})
    return s


def _interior(arr, m):
    return arr[..., m:-m, m:-m, m:-m]


class TestAffineInverse:
    def test_records_concrete_affine_on_tape(self):
        seed_all(0)
        s = _ramp_subject()
        RandomAffine(scales=0.05, degrees=5, translation=1)(s)
        (rec,) = s.history
        assert isinstance(rec.transform, Affine)
        assert rec.transform.is_invertible()

    def test_inverse_params_are_exact(self):
        M = np.array([[1.1, 0.02, 0.0], [0.0, 0.95, 0.01], [0.03, 0.0, 1.0]])
        t = np.array([1.5, -0.5, 0.25])
        inv = Affine(matrix=M, translation=t).inverse()
        np.testing.assert_allclose(inv.matrix @ M, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(M @ inv.translation + t, 0.0, atol=1e-12)
        # inverse of inverse == forward
        fwd2 = inv.inverse()
        np.testing.assert_allclose(fwd2.matrix, M, atol=1e-12)
        np.testing.assert_allclose(fwd2.translation, t, atol=1e-10)

    @pytest.mark.parametrize("spacing", [(1.0, 1.0, 1.0), (1.0, 2.0, 0.5)])
    def test_round_trip_on_ramp(self, spacing):
        seed_all(1)
        s = _ramp_subject(spacing=spacing)
        orig = np.asarray(s["img"].data).copy()
        RandomAffine(scales=0.08, degrees=8, translation=2)(s)
        assert not np.allclose(orig, np.asarray(s["img"].data), atol=1e-3)
        invert_records(s, s.history, warn=True)  # must not warn-skip
        got = np.asarray(s["img"].data)
        # interior: away from pad-value contamination near borders
        np.testing.assert_allclose(_interior(got, 5), _interior(orig, 5),
                                   atol=1e-3)

    def test_label_round_trip_dice(self):
        seed_all(2)
        s = _ramp_subject()
        orig = np.asarray(s["seg"].data).copy()
        RandomAffine(scales=0.08, degrees=8, translation=2)(s)
        invert_records(s, s.history, warn=False)
        got = np.asarray(s["seg"].data)
        inter = float(np.logical_and(orig > 0, got > 0).sum())
        dice = 2 * inter / (orig.sum() + got.sum())
        assert dice > 0.97  # nearest-neighbor boundary loss only

    def test_subject_apply_inverse_transform(self):
        """The full-history inversion entry (ref hippo_inference.py:27-32)
        now carries spatial augs back instead of skipping them."""
        seed_all(3)
        s = _ramp_subject()
        orig = np.asarray(s["img"].data).copy()
        RandomAffine(scales=0.05, degrees=6, translation=1)(s)
        out = s.apply_inverse_transform(warn=True)
        assert out.history == []
        np.testing.assert_allclose(
            _interior(np.asarray(out["img"].data), 5), _interior(orig, 5),
            atol=1e-3)
        # original subject untouched by the inversion
        assert not np.allclose(np.asarray(s["img"].data), orig, atol=1e-3)

    def test_include_propagates_to_inverse(self):
        seed_all(4)
        s = _ramp_subject()
        seg_orig = np.asarray(s["seg"].data).copy()
        RandomAffine(scales=0.1, degrees=10, translation=2,
                     include=["img"])(s)
        np.testing.assert_array_equal(np.asarray(s["seg"].data), seg_orig)
        invert_records(s, s.history, warn=False)
        # inverse must not warp the never-touched seg either
        np.testing.assert_array_equal(np.asarray(s["seg"].data), seg_orig)


class TestElasticInverse:
    def test_records_concrete_elastic_on_tape(self):
        seed_all(5)
        s = _ramp_subject()
        RandomElasticDeformation(num_control_points=5, max_displacement=2.0)(s)
        (rec,) = s.history
        assert isinstance(rec.transform, ElasticDeformation)
        assert rec.transform.is_invertible()
        assert rec.transform.inverse().invert is True
        assert rec.transform.inverse().inverse().invert is False

    def test_fixed_point_inverts_field(self):
        """v solves v(x) = -u(x + v(x)): warping x -> x+u then x -> x+v
        returns each interior coordinate to itself."""
        rng = np.random.default_rng(0)
        cg = rng.uniform(-1.5, 1.5, size=(3, 5, 5, 5)).astype(np.float32)
        cg[:, :1] = cg[:, -1:] = 0
        u = ElasticDeformation.dense_field(cg, (24, 24, 24))
        v = invert_displacement_field_voxels(u, tol=1e-4)
        idx = np.meshgrid(*[np.arange(24, dtype=np.float32)] * 3,
                          indexing="ij")
        from scipy import ndimage as ndi

        # composed map: x -> x + v(x) -> (x + v) + u(x + v)
        coords = [idx[a] + v[a] for a in range(3)]
        u_at = np.stack([ndi.map_coordinates(u[a], coords, order=1,
                                             mode="nearest")
                         for a in range(3)])
        residual = v + u_at  # should be ~0
        assert float(np.abs(_interior(residual, 4)).max()) < 5e-3

    def test_round_trip_on_ramp(self):
        seed_all(6)
        s = _ramp_subject()
        orig = np.asarray(s["img"].data).copy()
        RandomElasticDeformation(num_control_points=5, max_displacement=1.5,
                                 locked_borders=1)(s)
        assert not np.allclose(orig, np.asarray(s["img"].data), atol=1e-2)
        invert_records(s, s.history, warn=True)
        got = np.asarray(s["img"].data)
        np.testing.assert_allclose(_interior(got, 6), _interior(orig, 6),
                                   atol=2e-2)

    def test_fixed_point_beats_negated_field(self):
        """The negated-field shortcut (torchio's approximation) is exactly
        the first fixed-point iterate; more iterations must reduce the
        round-trip error."""
        seed_all(7)
        base = _ramp_subject(shape=(32, 28, 24), label=False)
        orig = np.asarray(base["img"].data).copy()
        RandomElasticDeformation(num_control_points=5, max_displacement=1.5,
                                 locked_borders=1)(base)
        (rec,) = base.history
        warped = np.asarray(base["img"].data)

        def invert_with(max_iterations):
            import segmentation_pipeline_tpu.transforms.random_spatial as rs

            s2 = Subject({"img": ScalarImage(tensor=warped.copy())})
            inv = rec.transform.inverse()
            real = rs.invert_displacement_field_voxels
            rs_invert = lambda f: real(f, max_iterations=max_iterations)  # noqa: E731
            rs.invert_displacement_field_voxels = rs_invert
            try:
                inv(s2, record=False)
            finally:
                rs.invert_displacement_field_voxels = real
            return float(np.abs(_interior(np.asarray(s2["img"].data), 7)
                                - _interior(orig, 7)).max())

        err_negated = invert_with(0)  # v = -u, no correction sweeps
        err_fixed = invert_with(30)
        assert err_fixed < err_negated * 0.5
