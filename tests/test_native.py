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


class TestConfusionHistogram:
    def test_native_confusion_stats_match_boolean_reference(self):
        """confusion_stats' native joint-histogram fast path must agree with
        per-label boolean reductions exactly — counts, ratios, and the
        nan/inf division edges — including raw values outside label_values
        and negative values."""
        from segmentation_pipeline_tpu.evaluators.segmentation_evaluator import (
            _div,
            confusion_stats,
        )

        rng = np.random.default_rng(3)
        label_values = {"bg": 0, "a": 2, "b": 5, "absent": 9}
        vals = [-1, 0, 1, 2, 5, 7]
        pred = rng.choice(vals, size=(1, 24, 20, 16)).astype(np.int32)
        target = rng.choice(vals, size=(1, 24, 20, 16)).astype(np.int32)

        got = confusion_stats(pred, target, label_values)
        n_vox = pred.size
        for name, v in label_values.items():
            p = pred == v
            t = target == v
            tp = float(np.logical_and(t, p).sum())
            fp = float(np.logical_and(~t, p).sum())
            fn = float(np.logical_and(t, ~p).sum())
            assert got["TP"][name] == tp
            assert got["FP"][name] == fp
            assert got["FN"][name] == fn
            assert got["TN"][name] == n_vox - tp - fp - fn
            want_dice = _div(2 * tp, 2 * tp + fp + fn)
            gd = got["dice"][name]
            assert (np.isnan(want_dice) and np.isnan(gd)) or want_dice == gd
