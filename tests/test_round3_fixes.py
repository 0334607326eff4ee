"""Round-3 fixes: PatchPredict batch contract (VERDICT #8 + ADVICE medium),
bounded/validated device mirrors (ADVICE lows), and the ImageRegionEvaluator
golden-value test (VERDICT #6)."""
import os

import numpy as np
import pytest

from segmentation_pipeline_tpu.core.subject import Image, LabelMap, ScalarImage, Subject
from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.prediction import PatchPredict
from segmentation_pipeline_tpu.training.model import SegModel
from tests.conftest import make_subject


def _patch_subject(name="s0"):
    s = make_subject(spatial_shape=(16, 16, 16), channels=2, name=name)
    s["X"] = s["img"]
    return s


class TestPatchPredictBatchContract:
    """batch['y_pred'] is ALWAYS host numpy (N, C, W, H, D) — identical type
    and values with device_argmax on or off — and the input-image entries
    collate lazily (the trainer's validation sweep discards the batch)."""

    def _predict(self, **kw):
        model = SegModel(NestedResUNet(input_channels=2, output_channels=3,
                                       filters=4), seed=3)
        pred = PatchPredict(image_names=["X"], patch_size=8, patch_overlap=4,
                            patch_batch_size=4, **kw)
        return pred.predict(model, [_patch_subject()], label_attributes={})

    @pytest.mark.parametrize("argmax", [False, True])
    def test_y_pred_is_numpy(self, argmax):
        _, batch = self._predict(device_argmax=argmax)
        assert type(batch["y_pred"]) is np.ndarray
        assert batch["y_pred"].shape == (1, 3, 16, 16, 16)

    def test_consumer_sees_same_contract_both_modes(self):
        _, b_prob = self._predict(device_argmax=False)
        _, b_ids = self._predict(device_argmax=True)
        assert type(b_prob["y_pred"]) is type(b_ids["y_pred"])
        np.testing.assert_array_equal(np.argmax(b_prob["y_pred"], axis=1),
                                      np.argmax(b_ids["y_pred"], axis=1))

    def test_input_images_collate_lazily(self):
        _, batch = self._predict()
        # not materialized by predict() itself...
        assert not dict.__contains__(batch, "X")
        # ...but fully present through the dict API
        assert "X" in batch and set(batch.keys()) == {"y_pred", "X"}
        x = batch["X"]
        assert dict.__contains__(batch, "X")
        assert x.shape == (1, 2, 16, 16, 16)
        np.testing.assert_allclose(np.asarray(x)[0],
                                   np.asarray(_patch_subject()["X"].data),
                                   rtol=1e-6)

    def test_lazy_batch_dict_surface(self):
        _, batch = self._predict()
        assert len(batch) == 2
        assert batch.get("nope") is None
        items = dict(batch.items())
        assert set(items) == {"y_pred", "X"}
        with pytest.raises(KeyError):
            batch["not_an_image"]


class TestDeviceMirrorBounds:
    def test_lru_eviction_caps_entries(self):
        img = ScalarImage(tensor=np.ones((1, 4, 4, 4), np.float32))
        cap = Image.DEVICE_MIRROR_MAX
        builds = []
        for i in range(cap + 2):
            img.device_mirror(("k", i), lambda d, i=i: builds.append(i) or i)
        assert len(img._device_mirror) == cap
        # oldest entries evicted, newest retained
        kept = {k[1] for k in img._device_mirror}
        assert kept == set(range(2, cap + 2))
        # hit on a retained key does not rebuild
        n = len(builds)
        assert img.device_mirror(("k", cap + 1), lambda d: 1 / 0) == cap + 1
        assert len(builds) == n

    def test_lru_hit_refreshes_recency(self):
        img = ScalarImage(tensor=np.ones((1, 4, 4, 4), np.float32))
        cap = Image.DEVICE_MIRROR_MAX
        for i in range(cap):
            img.device_mirror(("k", i), lambda d, i=i: i)
        img.device_mirror(("k", 0), lambda d: 1 / 0)  # refresh oldest
        img.device_mirror(("k", cap), lambda d: cap)  # evicts ("k", 1)
        assert ("k", 0) in img._device_mirror
        assert ("k", 1) not in img._device_mirror

    def test_inplace_write_detected_by_fingerprint(self):
        data = np.arange(64, dtype=np.float32).reshape(1, 4, 4, 4)
        img = ScalarImage(tensor=data.copy())
        first = img.device_mirror("k", lambda d: d.sum())
        # in-place write through the raw ndarray (bypasses the data setter)
        img.data[0, 0, 0, 0] = 999.0
        second = img.device_mirror("k", lambda d: d.sum())
        assert second != first
        assert second == float(img.data.sum())

    def test_zero_cap_disables_caching(self):
        img = ScalarImage(tensor=np.ones((1, 4, 4, 4), np.float32))
        old = Image.DEVICE_MIRROR_MAX
        try:
            Image.DEVICE_MIRROR_MAX = 0
            calls = []
            img.device_mirror("k", lambda d: calls.append(1))
            img.device_mirror("k", lambda d: calls.append(1))
            assert len(calls) == 2 and img._device_mirror == {}
        finally:
            Image.DEVICE_MIRROR_MAX = old


class TestImageRegionEvaluatorGolden:
    """Hand-computed golden values for the completed reference stub
    (ref evaluators/image_region_evaluator.py:7-36)."""

    def _subjects(self):
        img = np.zeros((1, 2, 2, 2), np.float32)
        img[0, :, :, 0] = [[1.0, 2.0], [3.0, 4.0]]  # region A intensities
        img[0, :, :, 1] = [[10.0, 20.0], [30.0, 40.0]]  # region B
        labels = np.zeros((1, 2, 2, 2), np.int32)
        labels[0, :, :, 0] = 1
        labels[0, :, :, 1] = 2
        s = Subject(name="sub-A")
        s["img"] = ScalarImage(tensor=img)
        s["seg"] = LabelMap(tensor=labels,
                            label_values={"a": 1, "b": 2, "empty": 7})
        return [s]

    def test_golden_region_stats(self):
        from segmentation_pipeline_tpu.evaluators import ImageRegionEvaluator

        out = ImageRegionEvaluator(image_name="img", label_map_name="seg")(
            self._subjects())
        df = out["subject_stats"]  # columns: subject, label, <stat names>
        row = lambda label, stat: float(  # noqa: E731
            df[df["label"] == label][stat].iloc[0])
        assert row("a", "mean") == pytest.approx(2.5)
        assert row("a", "min") == 1.0 and row("a", "max") == 4.0
        assert row("a", "std") == pytest.approx(np.std([1, 2, 3, 4], ddof=1))
        assert row("b", "mean") == pytest.approx(25.0)
        assert row("b", "min") == 10.0 and row("b", "max") == 40.0

    def test_empty_region_is_nan(self):
        from segmentation_pipeline_tpu.evaluators import ImageRegionEvaluator

        out = ImageRegionEvaluator(image_name="img", label_map_name="seg")(
            self._subjects())
        df = out["subject_stats"]
        empty = df[df["label"] == "empty"]
        assert len(empty) == 1
        for stat in ("mean", "std", "min", "max"):
            assert np.isnan(float(empty[stat].iloc[0]))

    def test_summary_stats(self):
        from segmentation_pipeline_tpu.evaluators import ImageRegionEvaluator

        out = ImageRegionEvaluator(image_name="img", label_map_name="seg")(
            self._subjects())
        summary = out["summary_stats"]
        # nan-robust summary over subjects: mean-over-subjects of region-a mean
        assert float(summary["mean", "a", "mean"]) == pytest.approx(2.5)
        # fix_tensor maps the all-nan 'empty' region to 0.0 in the summary
        # (LabeledTensor nan/inf robustness, ref labeled_tensor.py:95-101)
        assert float(summary["mean", "empty", "mean"]) == 0.0


class TestSeedAllCoversEveryRngDomain:
    """seed_all must reset Python's ``random`` module too: RandomSampler
    shuffles with it (data/loader.py:89), so leaving it unseeded made the
    training batch composition — and therefore the whole loss trajectory —
    vary run to run even under identical seeds (found as a divergence
    between same-seed trainer runs at iteration 0)."""

    def test_python_random_is_reset(self):
        import random

        from segmentation_pipeline_tpu import seed_all

        seed_all(123)
        a = [random.random() for _ in range(5)]
        shuffle_a = list(range(10))
        random.shuffle(shuffle_a)
        seed_all(123)
        b = [random.random() for _ in range(5)]
        shuffle_b = list(range(10))
        random.shuffle(shuffle_b)
        assert a == b
        assert shuffle_a == shuffle_b

    def test_numpy_global_is_reset(self):
        from segmentation_pipeline_tpu import seed_all

        seed_all(7)
        a = np.random.random(4)
        seed_all(7)
        b = np.random.random(4)
        np.testing.assert_array_equal(a, b)

    def test_random_sampler_order_is_deterministic(self):
        from segmentation_pipeline_tpu import seed_all
        from segmentation_pipeline_tpu.data.loader import RandomSampler

        class _D:
            def __len__(self):
                return 12

        seed_all(42)
        a = list(iter(RandomSampler(_D())))
        seed_all(42)
        b = list(iter(RandomSampler(_D())))
        assert a == b
class TestCompilationCache:
    """Persistent XLA compilation cache (utils/compile_cache): entries are
    written by one process and hit by the next."""

    def test_cross_process_cache_hits(self, tmp_path):
        import subprocess
        import sys

        cache = tmp_path / "xla_cache"
        prog = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import segmentation_pipeline_tpu as sp\n"
            # the 1 s min-compile-time default gates tiny test programs out
            f"sp.enable_compilation_cache({str(cache)!r}, "
            "min_compile_time_secs=0.0)\n"
            "import jax.numpy as jnp\n"
            "f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())\n"
            "print(float(f(jnp.ones((256, 256)))))\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        for _ in range(2):
            out = subprocess.run([sys.executable, "-c", prog], env=env,
                                 capture_output=True, text=True)
            assert out.returncode == 0, out.stderr[-800:]
        assert cache.is_dir() and any(cache.iterdir()), \
            "no persistent cache entries written"

    def test_enable_returns_default_dir(self, monkeypatch, tmp_path):
        from segmentation_pipeline_tpu.utils import compile_cache

        monkeypatch.setenv("HOME", str(tmp_path))
        path = compile_cache.enable_compilation_cache()
        assert str(tmp_path) in path
        import jax
        assert jax.config.jax_compilation_cache_dir == path


class TestPredictorCheckpointCompat:
    """Predictors ride inside every checkpoint: states pickled BEFORE newer
    attributes existed must still resume (review finding r3)."""

    def test_patch_predict_old_state(self):
        import pickle

        import segmentation_pipeline_tpu as sp

        p = sp.PatchPredict(patch_size=(8, 8, 8), device_argmax=True)
        state = p.__getstate__()
        # simulate a pre-round-3 checkpoint
        state.pop("device_postprocess", None)
        state.pop("cache_inputs", None)
        restored = sp.PatchPredict.__new__(sp.PatchPredict)
        restored.__setstate__(state)
        assert restored.device_postprocess is None
        assert restored.cache_inputs is None
        assert restored._confusion_plan is None

    def test_standard_predict_old_pickle_roundtrip(self):
        import pickle

        import segmentation_pipeline_tpu as sp

        p = sp.StandardPredict(image_names=["X"], device_argmax=True)
        blob = pickle.dumps(p)
        restored = pickle.loads(blob)
        # strip instance attrs newer checkpoints carry; class-level
        # fallbacks must keep the hot paths alive
        restored.__dict__.pop("_confusion_plan", None)
        restored.__dict__.pop("cache_inputs", None)
        assert restored._confusion_plan is None
        assert restored.cache_inputs is None
