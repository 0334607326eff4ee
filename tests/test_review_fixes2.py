"""Regression tests for the training/ops/parallel review findings:
torch-parity Adam weight decay, loud validation-evaluator misconfiguration,
single-channel label background in device augmentation, and the resample
constant fill.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import segmentation_pipeline_tpu as sp


class TestAdamWeightDecay:
    def test_l2_into_grad_matches_torch_semantics(self):
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        g = jnp.asarray([0.1, 0.2, -0.3])
        wd, lr = 0.01, 1e-2

        tx = sp.Adam(lr=lr, weight_decay=wd)
        state = tx.init(p0)
        updates, _ = tx.update(g, state, p0)
        p1 = optax.apply_updates(p0, updates)

        # torch.optim.Adam semantics: grad += wd * param, then plain Adam
        ref_tx = optax.adam(learning_rate=lr)
        ref_state = ref_tx.init(p0)
        ref_updates, _ = ref_tx.update(g + wd * p0, ref_state, p0)
        p1_ref = optax.apply_updates(p0, ref_updates)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p1_ref),
                                   atol=1e-7)

    def test_decoupled_differs(self):
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        g = jnp.asarray([0.1, 0.2, -0.3])
        tx_l2 = sp.Adam(lr=1e-2, weight_decay=0.1)
        tx_dec = sp.Adam(lr=1e-2, weight_decay=0.1, decoupled=True)
        u1, _ = tx_l2.update(g, tx_l2.init(p0), p0)
        u2, _ = tx_dec.update(g, tx_dec.init(p0), p0)
        assert not np.allclose(np.asarray(u1), np.asarray(u2))


class TestValidationEvaluatorValidation:
    def test_neither_cohorts_nor_subjects_raises(self, tmp_path):
        from tests.test_trainer import build_context, build_dataset

        root = tmp_path / "ds"
        root.mkdir()
        build_dataset(root)
        context = build_context(root, tmp_path)
        trainer_def = context.get_component_definition("trainer")
        trainer_def["params"]["validation_evaluators"] = [
            sp.ScheduledEvaluation(
                evaluator=sp.SegmentationEvaluator("y_pred_eval", "y_eval"),
                log_name="silent", interval=10),
        ]
        context.init_components()
        with pytest.raises(ValueError, match="cohorts.*subjects|silent"):
            context.trainer.train(context, max_iterations=1)


class TestAugmentSingleChannelLabels:
    def test_oob_background_is_zero_for_binary_mask(self):
        from segmentation_pipeline_tpu.ops.augment import random_affine_warp

        x = jnp.ones((16, 16, 8, 1), jnp.float32)
        y = jnp.ones((16, 16, 8, 1), jnp.float32)  # all-foreground binary mask
        key = jax.random.PRNGKey(0)
        x_out, y_out = random_affine_warp(key, x, y, degrees=30.0,
                                          scales=0.0, pad_value=0.0)
        y_np = np.asarray(y_out)[..., 0]
        x_np = np.asarray(x_out)[..., 0]
        oob = x_np == 0.0  # rotated-out corners
        assert oob.any(), "rotation should push some voxels out of bounds"
        assert (y_np[oob] == 0.0).all(), \
            "out-of-bounds binary-mask voxels must be background (0), not 1"

    def test_onehot_background_channel(self):
        from segmentation_pipeline_tpu.ops.augment import random_affine_warp

        x = jnp.ones((16, 16, 8, 1), jnp.float32)
        y = jnp.zeros((16, 16, 8, 2), jnp.float32).at[..., 1].set(1.0)
        x_out, y_out = random_affine_warp(jax.random.PRNGKey(0), x, y,
                                          degrees=30.0, scales=0.0,
                                          pad_value=0.0)
        y_np = np.asarray(y_out)
        oob = np.asarray(x_out)[..., 0] == 0.0
        assert oob.any()
        np.testing.assert_array_equal(y_np[oob][:, 0], 1.0)
        np.testing.assert_array_equal(y_np[oob][:, 1], 0.0)


class TestResampleConstantFill:
    def test_outside_fov_is_constant_zero(self):
        from segmentation_pipeline_tpu.ops.resample import resample_volume

        data = np.full((1, 8, 8, 8), 5.0, np.float32)
        src_affine = np.eye(4)
        dst_affine = np.eye(4)
        dst_affine[:3, 3] = -4.0  # dst grid starts 4 voxels before the src
        out = np.asarray(resample_volume(data, src_affine, dst_affine,
                                         (16, 16, 16), order=0))
        assert out[0, 0, 0, 0] == 0.0, "outside the source FOV must be cval"
        assert out[0, 8, 8, 8] == 5.0, "inside the source FOV keeps data"
