"""Native C++ CCL/morphology vs scipy.ndimage: exact-output contract."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from segmentation_pipeline_tpu.native import (
    connected_components_native,
    grey_dilation_native,
    native_available,
)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNative:
    @pytest.mark.parametrize("connectivity", [1, 2, 3])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_label_matches_scipy_exactly(self, connectivity, seed):
        rng = np.random.default_rng(seed)
        mask = rng.random((24, 20, 16)) > 0.7
        ours, n_ours = connected_components_native(mask, connectivity)
        ref, n_ref = ndi.label(mask,
                               structure=ndi.generate_binary_structure(3, connectivity))
        assert n_ours == n_ref
        np.testing.assert_array_equal(ours, ref)

    def test_empty_and_full(self):
        empty = np.zeros((8, 8, 8), bool)
        labels, n = connected_components_native(empty)
        assert n == 0 and not labels.any()
        full = np.ones((8, 8, 8), bool)
        labels, n = connected_components_native(full)
        assert n == 1 and (labels == 1).all()

    def test_dilation_matches_scipy(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 5, (16, 14, 12)).astype(np.int32)
        ours = grey_dilation_native(img)
        ref = ndi.grey_dilation(img,
                                footprint=ndi.generate_binary_structure(3, 1))
        np.testing.assert_array_equal(ours, ref)


class TestPostProcessingUsesNative:
    def test_keep_components_still_exact(self):
        """post_processing outputs stay identical after the native swap."""
        from segmentation_pipeline_tpu.post_processing import keep_components

        img = np.zeros((16, 16, 16), np.int32)
        img[2:8, 2:8, 2:8] = 1
        img[10:14, 10:14, 10:14] = 2
        img[1, 14, 14] = 1
        out, removed, elems = keep_components(img, 2)
        assert removed == 1
