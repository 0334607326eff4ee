"""Mixed-precision (bfloat16 compute) training and inference.

The TPU-native half-precision recipe: activations and conv compute in
bfloat16, while params, optimizer state, BatchNorm statistics (flax computes
them in float32 regardless of input dtype), the loss, and every user-visible
prediction stay float32.  The reference trains f32-only on V100
(no AMP anywhere in the repo); this is a beyond-reference capability.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
from segmentation_pipeline_tpu.models import NestedResUNet
from segmentation_pipeline_tpu.training.model import SegModel
from segmentation_pipeline_tpu.training.optimizers import Adam
from segmentation_pipeline_tpu.training.train_step import (
    collate_to_device,
    create_train_state,
    make_train_step,
)


def _toy_batch(batch=2, shape=(16, 16, 8), channels=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(batch, channels, *shape)).astype(np.float32)
    lab = (X[:, 0] > 0.3).astype(np.float32)
    y = np.stack([1 - lab, lab], axis=1)
    return {"X": X, "y": y}


def _make(compute_dtype=None, sagittal_split=False):
    model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                   filters=4, dropout_p=0.0))
    criterion = HybridLogisticDiceLoss()
    optimizer = Adam(lr=1e-3)
    batch_cf = _toy_batch()
    state = create_train_state(model, optimizer, batch_cf)
    step = make_train_step(model.module, criterion, optimizer,
                           sagittal_split=sagittal_split,
                           compute_dtype=compute_dtype)
    return model, state, step, collate_to_device(batch_cf)


class TestMixedPrecisionTrainStep:
    def test_bf16_step_keeps_f32_state_and_outputs(self):
        _, state, step, batch = _make(compute_dtype="bfloat16")
        new_state, loss_dict, y_pred = step(state, batch, jax.random.PRNGKey(0))
        assert y_pred.dtype == jnp.float32
        assert loss_dict["loss"].dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(new_state.batch_stats):
            assert leaf.dtype == jnp.float32
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(new_state.params))

    def test_bf16_training_converges_and_tracks_f32(self):
        # same init, same data, same rng: bf16 loss trajectory should track
        # the f32 one closely and decrease
        _, state32, step32, batch = _make(compute_dtype=None)
        _, state16, step16, _ = _make(compute_dtype="bfloat16")
        losses32, losses16 = [], []
        s32, s16 = state32, state16
        for i in range(8):
            rng = jax.random.PRNGKey(i)
            s32, ld32, _ = step32(s32, batch, rng)
            s16, ld16, _ = step16(s16, batch, rng)
            losses32.append(float(ld32["loss"]))
            losses16.append(float(ld16["loss"]))
        assert losses16[-1] < losses16[0], "bf16 training did not reduce loss"
        np.testing.assert_allclose(losses16, losses32, atol=2e-2)

    def test_dtype_string_and_f32_noop(self):
        # 'float32' (and np dtype objects) behave exactly like None
        _, state, step_none, batch = _make(compute_dtype=None)
        _, _, step_f32, _ = _make(compute_dtype="float32")
        rng = jax.random.PRNGKey(0)
        fresh = lambda: jax.tree_util.tree_map(  # noqa: E731
            lambda a: jnp.array(a, copy=True), state)
        _, ld_a, ya = step_none(fresh(), batch, rng)
        _, ld_b, yb = step_f32(fresh(), batch, rng)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=0, atol=0)

    def test_sagittal_split_bf16(self):
        _, state, step, batch = _make(compute_dtype="bfloat16",
                                      sagittal_split=True)
        new_state, loss_dict, y_pred = step(state, batch, jax.random.PRNGKey(0))
        assert y_pred.shape == batch["y"].shape
        assert np.isfinite(float(loss_dict["loss"]))


class TestMixedPrecisionInference:
    def test_segmodel_compute_dtype_close_to_f32(self):
        x = _toy_batch()["X"]
        m32 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                     filters=4), seed=7)
        m16 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                     filters=4), seed=7,
                       compute_dtype="bfloat16")
        y32 = np.asarray(m32(x))
        y16 = np.asarray(m16(x))
        assert y16.dtype == np.float32
        # softmax probabilities: bf16 activations keep them within ~1e-2
        np.testing.assert_allclose(y16, y32, atol=2e-2)

    def test_patch_predict_honors_compute_dtype(self):
        from segmentation_pipeline_tpu.prediction import PatchPredict
        from tests.conftest import make_subject

        subject = make_subject(spatial_shape=(16, 16, 8), channels=2)
        subject["X"] = subject["img"]
        m16 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                     filters=4), seed=7,
                       compute_dtype="bfloat16")
        m32 = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                     filters=4), seed=7)
        pred = PatchPredict(patch_size=(8, 8, 8), patch_overlap=(4, 4, 4),
                            patch_batch_size=4)
        import copy
        subs16, batch16 = pred.predict(m16, [copy.deepcopy(subject)])
        subs32, batch32 = pred.predict(m32, [copy.deepcopy(subject)])
        y16 = np.asarray(batch16["y_pred"])
        y32 = np.asarray(batch32["y_pred"])
        assert y16.dtype == np.float32
        np.testing.assert_allclose(y16, y32, atol=2e-2)


class TestTrainerMixedPrecision:
    def test_trainer_compute_dtype_end_to_end(self, tmp_path):
        from tests.test_trainer import build_context, build_dataset

        root = tmp_path / "ds"
        root.mkdir()
        build_dataset(root)
        context = build_context(root, tmp_path)
        trainer_def = context.get_component_definition("trainer")
        trainer_def["params"]["compute_dtype"] = "bfloat16"
        context.init_components()
        losses = []

        class Capture:
            def setup(self, context):
                pass

            def save_context(self, *a, **k):
                pass

            def log(self, log_dict):
                losses.append(log_dict["loss"])

        context.trainer.train(context, max_iterations=6, logger=Capture())
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))
        # the trainer propagates its compute dtype onto the model so the
        # predictor-driven validation sweeps run the same mixed precision
        assert context.model.compute_dtype == "bfloat16"

    def test_compute_dtype_change_rebuilds_eval_fn(self):
        """Setting compute_dtype AFTER first use must not be silently
        ignored (inference --bf16 sets it post-init)."""
        x = _toy_batch()["X"]
        m = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                   filters=4), seed=7)
        y32 = np.asarray(m(x))
        assert m._eval_fn is not None
        m.compute_dtype = "bfloat16"
        assert m._eval_fn is None  # invalidated
        y16 = np.asarray(m(x))
        assert y16.dtype == np.float32
        assert not np.array_equal(y16, y32)  # bf16 path actually ran
        np.testing.assert_allclose(y16, y32, atol=2e-2)
        # pickle round trip keeps the property-backed field
        import pickle

        m2 = pickle.loads(pickle.dumps(m))
        assert m2.compute_dtype == "bfloat16"


class TestSpatialShardedMixedPrecision:
    def test_spatial_bf16_step_runs(self):
        from jax.sharding import Mesh
        from segmentation_pipeline_tpu.training.train_step import (
            make_spatial_train_step)

        devices = np.array(jax.devices()[:4])
        if devices.size < 4:
            pytest.skip("needs 4 devices")
        mesh = Mesh(devices, ("spatial",))
        model = SegModel(NestedResUNet(input_channels=2, output_channels=2,
                                       filters=4, dropout_p=0.0))
        criterion = HybridLogisticDiceLoss()
        optimizer = Adam(lr=1e-3)
        batch_cf = _toy_batch(batch=2, shape=(32, 16, 8))
        state = create_train_state(model, optimizer, batch_cf)
        step = make_spatial_train_step(model.module, criterion, optimizer,
                                       mesh, spatial_axis="spatial",
                                       compute_dtype="bfloat16")
        batch = collate_to_device(batch_cf, mesh=mesh, data_axis=None,
                                  spatial_axis="spatial")
        new_state, loss_dict, y_pred = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss_dict["loss"]))
        for leaf in jax.tree_util.tree_leaves(new_state.params):
            assert leaf.dtype == jnp.float32
