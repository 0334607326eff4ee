"""Bit-packed label-id transfer (ops/bitpack.py): exact round trips and
the predictor fetch paths that use it."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_pipeline_tpu.ops.bitpack import (
    bits_for,
    fetch_ids,
    pack_ids,
    unpack_ids,
)


class TestBitsFor:
    def test_thresholds(self):
        assert bits_for(2) == 1
        assert bits_for(3) == 2
        assert bits_for(4) == 2
        assert bits_for(5) == 4
        assert bits_for(16) == 4
        assert bits_for(17) == 8
        assert bits_for(255) == 8


class TestRoundTrip:
    @pytest.mark.parametrize("n_classes", [2, 3, 4, 5, 10, 16, 17, 255])
    def test_exact(self, n_classes):
        rng = np.random.default_rng(n_classes)
        for shape in [(7,), (5, 9), (4, 6, 5), (2, 3, 5, 7)]:
            ids = rng.integers(0, n_classes, size=shape).astype(np.uint8)
            packed = np.asarray(pack_ids(jnp.asarray(ids), n_classes))
            assert packed.dtype == np.uint8 and packed.ndim == 1
            got = unpack_ids(packed, n_classes, shape)
            np.testing.assert_array_equal(got, ids)

    def test_packed_size(self):
        ids = jnp.zeros((96, 96, 96), jnp.uint8)
        assert pack_ids(ids, 2).size == 96 ** 3 // 8
        assert pack_ids(ids, 4).size == 96 ** 3 // 4
        assert pack_ids(ids, 16).size == 96 ** 3 // 2
        assert pack_ids(ids, 200).size == 96 ** 3

    def test_size_not_multiple_of_byte(self):
        # 13 voxels at 1 bit -> 2 bytes; tail bits must be dropped cleanly
        ids = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 1], np.uint8)
        packed = np.asarray(pack_ids(jnp.asarray(ids), 2))
        assert packed.size == 2
        np.testing.assert_array_equal(unpack_ids(packed, 2, (13,)), ids)

    def test_int32_input_ids(self):
        ids = np.array([[3, 1], [0, 2]], np.int32)
        got = fetch_ids(jnp.asarray(ids), 4)
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, ids)

    def test_fetch_matches_plain_asarray(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 6, size=(11, 13, 7)).astype(np.uint8)
        dev = jnp.asarray(ids)
        np.testing.assert_array_equal(fetch_ids(dev, 6), np.asarray(dev))


class TestPredictorPackedFetch:
    """StandardPredict with device_argmax must stay bit-identical to the
    full-probability fetch now that its ids cross the link packed."""

    def test_standard_predict_equivalence(self):
        import copy

        import segmentation_pipeline_tpu as sp

        rng = np.random.default_rng(3)

        class FakeModel:
            def __call__(self, x):
                # deterministic 3-class logits from the input
                x = jnp.asarray(x)
                return jnp.concatenate([x, x * 0.5 + 1.0, -x], axis=1)

        subjects = []
        for i in range(2):
            s = sp.Subject(name=f"s{i}", folder="/tmp")
            s["X"] = sp.ScalarImage(
                tensor=rng.normal(size=(1, 10, 12, 8)).astype(np.float32),
                affine=np.eye(4))
            subjects.append(s)

        pred_full = sp.StandardPredict(image_names=["X"])
        out_full, _ = pred_full.predict(FakeModel(), copy.deepcopy(subjects))
        pred_ids = sp.StandardPredict(image_names=["X"], device_argmax=True)
        out_ids, _ = pred_ids.predict(FakeModel(), copy.deepcopy(subjects))
        for a, b in zip(out_full, out_ids):
            np.testing.assert_array_equal(
                np.argmax(np.asarray(a["y_pred"].data), 0),
                np.argmax(np.asarray(b["y_pred"].data), 0))
