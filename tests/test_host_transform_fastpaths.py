"""Fast-path host transform kernels must match their reference formulations
exactly (the optimizations in intensity.py / random_spatial.py)."""
import numpy as np
from scipy import ndimage as ndi

from segmentation_pipeline_tpu.core.subject import ScalarImage, Subject
from segmentation_pipeline_tpu.transforms import RescaleIntensity
from segmentation_pipeline_tpu.transforms.random_spatial import (
    RandomElasticDeformation,
)


class TestPercentilePartition:
    def test_matches_np_percentile(self):
        rng = np.random.default_rng(0)
        for p in [(0.5, 99.5), (5, 95), (0, 100), (1.3, 98.6), (50, 50)]:
            x = rng.normal(size=(3, 41, 37, 29)).astype(np.float32)
            want_lo, want_hi = np.percentile(x, p)
            got_lo, got_hi = RescaleIntensity._percentiles(
                x.ravel().copy(), *p)
            assert abs(got_lo - want_lo) < 5e-6
            assert abs(got_hi - want_hi) < 5e-6

    def test_end_to_end_semantics(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 30, 31, 29)).astype(np.float32)
        s = Subject(name="q", folder="/tmp")
        s["X"] = ScalarImage(tensor=x.copy(), affine=np.eye(4))
        RescaleIntensity((-1, 1), (0.5, 99.5))(s)
        lo, hi = np.percentile(x, (0.5, 99.5))
        want = (np.clip(x, lo, hi) - lo) / (hi - lo) * 2 - 1
        np.testing.assert_allclose(np.asarray(s["X"].data), want, atol=2e-6)

    def test_does_not_mutate_caller_arrays(self):
        """The in-place fast path must own its buffer: the caller's array
        (non-f32 source forces a conversion copy) stays untouched, and an
        f32 source may be reused in place only via the image itself."""
        x64 = np.random.default_rng(2).normal(size=(1, 8, 8, 8))
        keep = x64.copy()
        s = Subject(name="q", folder="/tmp")
        s["X"] = ScalarImage(tensor=x64, affine=np.eye(4))
        RescaleIntensity((0, 1))(s)
        np.testing.assert_array_equal(x64, keep)


class TestSeparableBsplineField:
    def test_matches_generic_map_coordinates(self):
        rng = np.random.default_rng(0)
        cg = rng.uniform(-7.5, 7.5, (3, 7, 7, 7)).astype(np.float32)
        spatial = (40, 52, 33)
        got = RandomElasticDeformation.dense_field(cg, spatial)
        coords = np.stack(np.meshgrid(
            *[np.linspace(0, 6, s, dtype=np.float32) for s in spatial],
            indexing="ij"))
        want = np.stack([ndi.map_coordinates(cg[a], coords, order=3,
                                             mode="nearest")
                         for a in range(3)])
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_asymmetric_control_grid(self):
        rng = np.random.default_rng(3)
        cg = rng.uniform(-3, 3, (3, 5, 9, 6)).astype(np.float32)
        spatial = (17, 23, 11)
        got = RandomElasticDeformation.dense_field(cg, spatial)
        coords = np.stack(np.meshgrid(
            np.linspace(0, 4, 17, dtype=np.float32),
            np.linspace(0, 8, 23, dtype=np.float32),
            np.linspace(0, 5, 11, dtype=np.float32), indexing="ij"))
        want = np.stack([ndi.map_coordinates(cg[a], coords, order=3,
                                             mode="nearest")
                         for a in range(3)])
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_locked_borders_still_zero_displacement_at_edges(self):
        t = RandomElasticDeformation(num_control_points=7,
                                     max_displacement=7.5, locked_borders=2)
        t.reseed(0) if hasattr(t, "reseed") else None
        grid = t.sample_control_grid()
        field = RandomElasticDeformation.dense_field(grid, (24, 24, 16))
        # control points span the extent; with 2 locked border layers the
        # corner displacement is exactly zero
        assert abs(field[:, 0, 0, 0]).max() < 1e-5
        assert abs(field[:, -1, -1, -1]).max() < 1e-5
