"""Device-resident input cache for repeated prediction sweeps.

``Image.device_mirror`` keeps a subject's host->device upload alive across
the per-sweep deepcopies the loader makes, so the scheduled validation
sweep (trainer.py) re-predicts preloaded subjects without re-crossing the
host link. Correctness contract: cached predictions are identical to
uncached ones, and any data reassignment invalidates the mirror.
"""
import copy
import pickle

import jax.numpy as jnp
import numpy as np

from segmentation_pipeline_tpu.core.subject import (Image, ScalarImage,
                                                    collate_subjects)
from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.prediction import PatchPredict, StandardPredict
from segmentation_pipeline_tpu.training.model import SegModel
from tests.conftest import make_subject


class TestDeviceMirror:
    def test_hit_and_invalidate(self):
        img = ScalarImage(tensor=np.ones((1, 4, 4, 4), np.float32))
        calls = []

        def make(data):
            calls.append(1)
            return jnp.asarray(data)

        a = img.device_mirror("k", make)
        b = img.device_mirror("k", make)
        assert a is b and len(calls) == 1
        img.set_data(np.zeros((1, 4, 4, 4), np.float32))
        c = img.device_mirror("k", make)
        assert len(calls) == 2
        np.testing.assert_array_equal(np.asarray(c), 0)

    def test_shared_across_deepcopy_both_directions(self):
        img = ScalarImage(tensor=np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2))
        clone = copy.deepcopy(img)
        # mirror built on the COPY is visible to the original (the validation
        # sweep predicts on per-sweep deepcopies; the pristine subject keeps
        # the upload)
        dev = clone.device_mirror("k", lambda d: jnp.asarray(d))
        assert img.device_mirror("k", lambda d: 1 / 0) is dev
        # reassigning the copy's data detaches only the copy
        clone.set_data(np.zeros((1, 2, 2, 2), np.float32))
        assert img.device_mirror("k", lambda d: 1 / 0) is dev
        fresh = clone.device_mirror("k", lambda d: jnp.asarray(d))
        np.testing.assert_array_equal(np.asarray(fresh), 0)
        # and the original still serves the old values
        np.testing.assert_array_equal(
            np.asarray(img.device_mirror("k", lambda d: 1 / 0)),
            np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2))

    def test_pickle_drops_mirror(self):
        img = ScalarImage(tensor=np.ones((1, 2, 2, 2), np.float32))
        img.device_mirror("k", lambda d: jnp.asarray(d))
        out = pickle.loads(pickle.dumps(img))
        assert out._device_mirror == {}
        np.testing.assert_array_equal(out.data, img.data)

    def test_collate_cache_matches_plain(self):
        subs = []
        for i in range(2):
            s = make_subject(spatial_shape=(6, 5, 4), channels=2, name=f"s{i}")
            s["X"] = s["img"]
            subs.append(s)
        plain = collate_subjects(subs, ["X"])
        cached = collate_subjects(subs, ["X"], cache=True)
        np.testing.assert_array_equal(np.asarray(plain["X"]),
                                      np.asarray(cached["X"]))
        # second collate over deepcopies hits the mirrors
        copies = [copy.deepcopy(s) for s in subs]
        again = collate_subjects(copies, ["X"], cache=True)
        np.testing.assert_array_equal(np.asarray(plain["X"]),
                                      np.asarray(again["X"]))


def _fresh_subject(name="s0", shape=(16, 16, 16)):
    s = make_subject(spatial_shape=shape, channels=2, name=name)
    s["X"] = s["img"]
    return s


class TestPredictorsCacheInputs:
    def test_standard_predict_cached_equals_uncached(self):
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=0)
        s = _fresh_subject()
        ref, _ = StandardPredict(image_names=["X"]).predict(
            model, [copy.deepcopy(s)], label_attributes={})
        pred = StandardPredict(image_names=["X"], cache_inputs=True)
        # two sweeps over deepcopies: the second hits the shared mirror
        for _ in range(2):
            got, _ = pred.predict(model, [copy.deepcopy(s)],
                                  label_attributes={})
            np.testing.assert_array_equal(
                np.asarray(got[0]["y_pred"].data),
                np.asarray(ref[0]["y_pred"].data))
        assert ("collate",) in s["X"]._device_mirror

    def test_patch_predict_cached_equals_uncached(self):
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=1)
        kw = dict(image_names=["X"], patch_size=8, patch_overlap=4,
                  patch_batch_size=4)
        s = _fresh_subject(shape=(16, 12, 10))  # padded to the patch grid
        ref, _ = PatchPredict(**kw).predict(model, [copy.deepcopy(s)],
                                            label_attributes={})
        pred = PatchPredict(**kw, cache_inputs=True)
        for _ in range(2):
            got, _ = pred.predict(model, [copy.deepcopy(s)],
                                  label_attributes={})
            np.testing.assert_array_equal(
                np.asarray(got[0]["y_pred"].data),
                np.asarray(ref[0]["y_pred"].data))
        assert any(k[0] == "swi" for k in s["X"]._device_mirror)

    def test_patch_predict_cache_not_stale_after_mutation(self):
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=2)
        kw = dict(image_names=["X"], patch_size=8, patch_overlap=4,
                  patch_batch_size=4)
        s = _fresh_subject()
        pred = PatchPredict(**kw, cache_inputs=True)
        pred.predict(model, [copy.deepcopy(s)], label_attributes={})
        s["X"].set_data(np.asarray(s["X"].data) * -1.0)
        got, _ = pred.predict(model, [copy.deepcopy(s)], label_attributes={})
        fresh, _ = PatchPredict(**kw).predict(model, [copy.deepcopy(s)],
                                              label_attributes={})
        np.testing.assert_array_equal(np.asarray(got[0]["y_pred"].data),
                                      np.asarray(fresh[0]["y_pred"].data))
