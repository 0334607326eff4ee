"""Device-side argmax output + low-precision transfer for sliding-window
inference: the host-transfer-lean inference path (D2H shrinks from the
C-channel float32 volume to one uint8 channel; H2D halves under bf16).
Metrics and hard segmentations must be identical to the probability path.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.ops.sliding_window import sliding_window_inference
from segmentation_pipeline_tpu.prediction import PatchPredict
from segmentation_pipeline_tpu.training.model import SegModel
from tests.conftest import make_subject


def _model_fn(p):
    fg = (p[..., 0:1] > 0).astype(jnp.float32)
    return jnp.concatenate([1 - fg, fg], axis=-1)


class TestSlidingWindowLabels:
    def test_output_labels_matches_argmax_of_probs(self):
        rng = np.random.default_rng(0)
        vol = rng.normal(size=(2, 20, 16, 8)).astype(np.float32)
        probs = sliding_window_inference(vol, _model_fn, patch_size=8,
                                         patch_overlap=4, patch_batch=4)
        ids = sliding_window_inference(vol, _model_fn, patch_size=8,
                                       patch_overlap=4, patch_batch=4,
                                       output_labels=True)
        assert np.asarray(ids).dtype == np.uint8
        assert ids.shape == (20, 16, 8)
        np.testing.assert_array_equal(np.asarray(ids),
                                      np.argmax(np.asarray(probs), axis=0))

    def test_transfer_dtype_bf16_close(self):
        rng = np.random.default_rng(1)
        vol = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
        f32 = sliding_window_inference(vol, _model_fn, patch_size=8,
                                       patch_overlap=4, patch_batch=2)
        bf16 = sliding_window_inference(vol, _model_fn, patch_size=8,
                                        patch_overlap=4, patch_batch=2,
                                        transfer_dtype=jnp.bfloat16)
        # thresholding model: bf16 rounding flips only voxels near 0
        agree = (np.argmax(np.asarray(f32), 0) ==
                 np.argmax(np.asarray(bf16), 0)).mean()
        assert agree > 0.99


class TestPatchPredictDeviceArgmax:
    def _subjects(self):
        s = make_subject(spatial_shape=(16, 16, 16), channels=2, name="s0")
        s["X"] = s["img"]
        return s

    def test_matches_probability_path(self):
        model = SegModel(NestedResUNet(input_channels=2, output_channels=3,
                                       filters=4), seed=3)
        kw = dict(image_names=["X"], patch_size=8, patch_overlap=4,
                  patch_batch_size=4)
        subs_p, batch_p = PatchPredict(**kw).predict(
            model, [self._subjects()], label_attributes={})
        subs_l, batch_l = PatchPredict(**kw, device_argmax=True).predict(
            model, [self._subjects()], label_attributes={})
        y_p = np.asarray(batch_p["y_pred"])[0]
        y_l = np.asarray(batch_l["y_pred"])[0]
        assert y_l.shape == y_p.shape
        # one-hot expansion of device argmax == argmax of probabilities
        np.testing.assert_array_equal(np.argmax(y_l, 0), np.argmax(y_p, 0))
        # and it IS one-hot
        assert set(np.unique(y_l)) <= {0.0, 1.0}
        np.testing.assert_allclose(y_l.sum(axis=0), 1.0)

    def test_padded_volume_cropped(self):
        # volume smaller than the patch: padding must be cropped from ids too
        s = make_subject(spatial_shape=(10, 9, 6), channels=2, name="s1")
        s["X"] = s["img"]
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=0)
        subs, batch = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=2, device_argmax=True).predict(
            model, [copy.deepcopy(s)], label_attributes={})
        assert np.asarray(batch["y_pred"]).shape == (1, 2, 10, 9, 6)

    def test_bf16_model_uses_half_transfer_and_matches(self):
        model16 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                         filters=4), seed=5,
                           compute_dtype="bfloat16")
        model32 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                         filters=4), seed=5)
        kw = dict(image_names=["X"], patch_size=8, patch_overlap=4,
                  patch_batch_size=4, device_argmax=True)
        _, b16 = PatchPredict(**kw).predict(model16, [self._subjects()],
                                            label_attributes={})
        _, b32 = PatchPredict(**kw).predict(model32, [self._subjects()],
                                            label_attributes={})
        ids16 = np.argmax(np.asarray(b16["y_pred"])[0], 0)
        ids32 = np.argmax(np.asarray(b32["y_pred"])[0], 0)
        assert (ids16 == ids32).mean() > 0.98

    def test_single_channel_model_falls_back(self):
        """C == 1: the channel IS the mask — device_argmax must not collapse
        it to all-zero ids (it falls back to the full fetch)."""
        from segmentation_pipeline_tpu.prediction import StandardPredict

        class OneChannel:
            def __call__(self, x):
                return jax.nn.sigmoid(jnp.asarray(x)[:, :1])

        s = self._subjects()
        subs, _ = StandardPredict(image_names=["X"], device_argmax=True).predict(
            OneChannel(), [s], label_attributes={})
        y = np.asarray(subs[0]["y_pred"].data)
        assert y.shape[0] == 1
        assert 0.0 < y.mean() < 1.0  # real probabilities, not an all-X mask

        # PatchPredict path: probe-based fallback
        s2 = self._subjects()
        subs2, batch2 = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=4, device_argmax=True).predict(
            OneChannel(), [s2], label_attributes={})
        y2 = np.asarray(subs2[0]["y_pred"].data)
        assert y2.shape[0] == 1
        assert 0.0 < y2.mean() < 1.0

    def test_mesh_patch_predict_device_argmax(self):
        from jax.sharding import Mesh

        devices = np.array(jax.devices()[:4]).reshape(4)
        mesh = Mesh(devices, ("data",))
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=4)
        kw = dict(image_names=["X"], patch_size=8, patch_overlap=4,
                  patch_batch_size=4)
        subs_p, batch_p = PatchPredict(**kw).predict(
            model, [self._subjects()], label_attributes={})
        subs_l, batch_l = PatchPredict(**kw, mesh=mesh,
                                       device_argmax=True).predict(
            model, [self._subjects()], label_attributes={})
        ids_mesh = np.argmax(np.asarray(batch_l["y_pred"])[0], 0)
        ids_single = np.argmax(np.asarray(batch_p["y_pred"])[0], 0)
        np.testing.assert_array_equal(ids_mesh, ids_single)

    def test_standard_predict_device_argmax(self):
        from segmentation_pipeline_tpu.prediction import StandardPredict

        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4), seed=2)
        s1, s2 = self._subjects(), self._subjects()
        subs_p, _ = StandardPredict(image_names=["X"]).predict(
            model, [s1], label_attributes={})
        subs_l, _ = StandardPredict(image_names=["X"], device_argmax=True).predict(
            model, [s2], label_attributes={})
        y_p = np.asarray(subs_p[0]["y_pred"].data)
        y_l = np.asarray(subs_l[0]["y_pred"].data)
        np.testing.assert_array_equal(np.argmax(y_l, 0), np.argmax(y_p, 0))
        assert set(np.unique(y_l)) <= {0.0, 1.0}

    def test_evaluator_metrics_identical(self):
        from segmentation_pipeline_tpu.evaluators import SegmentationEvaluator
        from segmentation_pipeline_tpu.prediction import add_evaluation_labels
        from segmentation_pipeline_tpu.transforms import CustomOneHot

        model = SegModel(NestedResUNet(input_channels=1, output_channels=2,
                                       filters=4), seed=1)
        results = {}
        for tag, argmax in (("probs", False), ("ids", True)):
            s = make_subject(spatial_shape=(16, 16, 16), name="s0")
            s["X"] = s["img"]
            s["y"] = s["seg"]
            CustomOneHot(include=["y"])(s)
            subs, _ = PatchPredict(
                image_names=["X"], patch_size=8, patch_overlap=4,
                patch_batch_size=4, device_argmax=argmax).predict(
                model, [s], label_attributes=dict(s["y"].metadata))
            add_evaluation_labels(subs)
            ev = SegmentationEvaluator("y_pred_eval", "y_eval")(subs)
            results[tag] = ev["summary_stats"]["mean", :, "dice"].mean()
        assert float(results["probs"]) == float(results["ids"])


class TestPipelinedSubjectLoop:
    """PatchPredict dispatches subject i+1's window program while subject
    i's prediction crosses the host link. Results and subject order must be
    identical to processing each subject alone — across mixed shapes
    (first-of-shape runs the blocking degrade path, repeats the async one)
    and both fetch modes."""

    @staticmethod
    def _subjects():
        subs = []
        for i in range(4):  # subject 0 takes the blocking first-of-shape
            s = make_subject(spatial_shape=(20, 16, 8), channels=2, seed=i,
                             name=f"s{i}", with_label=False)  # path; 1-3
            s["X"] = s["img"]  # dispatch async behind the previous fetch
            del s["img"]
            subs.append(s)
        return subs

    def _run(self, device_argmax, batched):
        import segmentation_pipeline_tpu as sp

        model = lambda x: jnp.moveaxis(_model_fn(jnp.moveaxis(x, 1, -1)),
                                       -1, 1)
        pred = PatchPredict(image_names=["X"], patch_size=(8, 8, 8),
                            patch_overlap=4, patch_batch_size=4,
                            device_argmax=device_argmax)
        if batched:
            out, batch = pred.predict(model, copy.deepcopy(self._subjects()))
            return out
        outs = []
        for s in self._subjects():
            o, _ = pred.predict(model, [copy.deepcopy(s)])
            outs += o
        return outs

    def test_matches_per_subject_runs(self):
        for device_argmax in (False, True):
            together = self._run(device_argmax, batched=True)
            alone = self._run(device_argmax, batched=False)
            assert [s["name"] for s in together] == [f"s{i}" for i in range(4)]
            for a, b in zip(together, alone):
                np.testing.assert_array_equal(
                    np.asarray(a["y_pred"].data), np.asarray(b["y_pred"].data))
