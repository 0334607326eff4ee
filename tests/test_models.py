"""Model + loss + train-step tests (CPU jax, virtual 8-device mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_pipeline_tpu.criterions import HybridLogisticDiceLoss
from segmentation_pipeline_tpu.models import (
    Block3d,
    BlurConv3d,
    BlurConvTranspose3d,
    ModularUNet,
    NestedResUNet,
    StochasticMatrix,
    WSConv3d,
)
from segmentation_pipeline_tpu.ops.convolution import (
    avg_pool3d,
    conv3d,
    conv_transpose3d,
    upsample_trilinear2x,
)
from segmentation_pipeline_tpu.training.model import SegModel
from segmentation_pipeline_tpu.training.optimizers import SGD, Adam
from segmentation_pipeline_tpu.training.train_step import (
    collate_to_device,
    create_train_state,
    make_train_step,
)


class TestOps:
    def test_conv3d_matches_explicit(self):
        """conv3d with padding=1 k=3 stride=1 preserves shape."""
        x = jnp.ones((2, 8, 8, 8, 3))
        k = jnp.ones((3, 3, 3, 3, 5)) / (27 * 3)
        y = conv3d(x, k, stride=1, padding=1)
        assert y.shape == (2, 8, 8, 8, 5)
        # interior voxels average to 1
        np.testing.assert_allclose(y[0, 4, 4, 4, 0], 1.0, rtol=1e-5)

    def test_conv_transpose_shape(self):
        """torch formula: out = (in-1)*s - 2p + k."""
        x = jnp.ones((1, 8, 8, 8, 4))
        k = jnp.ones((4, 4, 4, 4, 4)) * 0.01
        y = conv_transpose3d(x, k, stride=2, padding=1)
        assert y.shape == (1, 16, 16, 16, 4)

    def test_conv_transpose_matches_torch(self):
        """Cross-check against torch (CPU) on random tensors."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 6, 5, 4)).astype(np.float32)  # N,C,W,H,D
        w = rng.normal(size=(3, 2, 4, 4, 4)).astype(np.float32)  # in,out,k,k,k
        ref = torch.nn.functional.conv_transpose3d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
        # to channels-last/HWDIO
        x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
        w_io = jnp.asarray(np.transpose(w, (2, 3, 4, 0, 1)))
        out = conv_transpose3d(x_cl, w_io, stride=2, padding=1)
        out_cf = np.moveaxis(np.asarray(out), -1, 1)
        np.testing.assert_allclose(out_cf, ref, atol=1e-4)

    def test_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 8, 7, 6)).astype(np.float32)
        w = rng.normal(size=(5, 3, 3, 3, 3)).astype(np.float32)  # out,in,k,k,k
        ref = torch.nn.functional.conv3d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1).numpy()
        x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
        w_io = jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)))
        out = conv3d(x_cl, w_io, stride=2, padding=1)
        out_cf = np.moveaxis(np.asarray(out), -1, 1)
        np.testing.assert_allclose(out_cf, ref, atol=1e-4)

    def test_avg_pool_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 2, 8, 6, 4)).astype(np.float32)
        ref = torch.nn.AvgPool3d(2, 2)(torch.from_numpy(x)).numpy()
        out = avg_pool3d(jnp.asarray(np.moveaxis(x, 1, -1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-5)

    def test_trilinear_up_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 2, 4, 6, 3)).astype(np.float32)
        ref = torch.nn.Upsample(scale_factor=2, mode="trilinear",
                                align_corners=True)(torch.from_numpy(x)).numpy()
        out = upsample_trilinear2x(jnp.asarray(np.moveaxis(x, 1, -1)))
        np.testing.assert_allclose(np.moveaxis(np.asarray(out), -1, 1), ref, atol=1e-4)


class TestLoss:
    def test_loss_matches_torch_reference_math(self):
        """Golden check against a hand-written numpy version of the reference
        loss (ref criterions/hybrid_logistic_dice_loss.py:13-43)."""
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32)
        pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        labels = rng.integers(0, 3, size=(2, 4, 4, 4))
        target = np.eye(3, dtype=np.float32)[labels]

        out = HybridLogisticDiceLoss(dice_weight=0.3,
                                     logistic_class_weights=[1.0, 2.0, 0.5])(
            jnp.asarray(pred), jnp.asarray(target))

        eps = 1e-8
        overlap = (pred * target).sum((1, 2, 3))
        total = (target ** 2).sum((1, 2, 3)) + (pred ** 2).sum((1, 2, 3))
        dice = 2 * overlap / (total + eps)
        dice_loss = (1 - dice).mean()
        safe = (pred + eps) / (1 + eps)
        logistic = (target * np.log(safe)).mean((1, 2, 3)) * np.array([1.0, 2.0, 0.5])
        logistic_loss = -logistic.mean()
        expected = 0.7 * logistic_loss + 0.3 * dice_loss
        np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)


class TestModels:
    def test_nested_unet_shapes(self):
        model = NestedResUNet(input_channels=3, output_channels=2, filters=8,
                              dropout_p=0.2)
        x = jnp.zeros((2, 16, 16, 8, 3))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 16, 16, 8, 2)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)  # softmax
        assert "batch_stats" in variables

    def test_modular_unet_blur_updown(self):
        model = ModularUNet(
            in_channels=2, out_channels=2, filters=[8, 8, 16], depth=3,
            block_params={"residual": True},
            downsample_class=BlurConv3d,
            downsample_params={"kernel_size": 3, "stride": 2, "padding": 1},
            upsample_class=BlurConvTranspose3d,
            upsample_params={"kernel_size": 3, "stride": 2, "padding": 1,
                             "output_padding": 0},
        )
        x = jnp.zeros((1, 16, 16, 16, 2))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 16, 16, 16, 2)

    def test_ws_conv(self):
        m = WSConv3d(features=4, kernel_size=3, padding=1)
        x = jnp.ones((1, 4, 4, 4, 2))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 4, 4, 4, 4)

    def test_stochastic_matrix(self):
        m = StochasticMatrix(channels=3)
        x = jnp.zeros((1, 2, 2, 2, 9))
        y = m.apply({}, x)
        out = np.asarray(y).reshape(1, 2, 2, 2, 3, 3)
        np.testing.assert_allclose(out.sum(-2), 1.0, atol=1e-5)  # columns sum to 1

    def test_segmodel_wrapper_channel_first(self):
        model = SegModel(NestedResUNet(input_channels=1, output_channels=2, filters=4))
        x = np.zeros((2, 1, 8, 8, 8), np.float32)
        y = model(x)
        assert y.shape == (2, 2, 8, 8, 8)
        assert model.num_params > 0


class TestTrainStep:
    def _setup(self, mesh=None, batch=4):
        model = SegModel(NestedResUNet(input_channels=1, output_channels=2, filters=4))
        criterion = HybridLogisticDiceLoss()
        optimizer = Adam(lr=3e-3)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(batch, 1, 8, 8, 8)).astype(np.float32)
        labels = (X[:, 0] > 0).astype(np.int32)
        y = np.stack([1 - labels, labels], axis=1).astype(np.float32)
        batch_cf = {"X": X, "y": y}
        state = create_train_state(model, optimizer, batch_cf)
        step = make_train_step(model.module, criterion, optimizer, mesh=mesh)
        return model, state, step, batch_cf

    def test_overfit_single_batch(self):
        model, state, step, batch_cf = self._setup()
        batch = collate_to_device(batch_cf)
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(30):
            rng, sub = jax.random.split(rng)
            state, loss_dict, _ = step(state, batch, sub)
            losses.append(float(loss_dict["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::10]
        # sync weights back into the wrapper and predict
        model.update_variables(state.params, state.batch_stats)
        y_pred = model(batch_cf["X"])
        pred_labels = np.argmax(np.asarray(y_pred), axis=1)
        true_labels = np.argmax(batch_cf["y"], axis=1)
        acc = (pred_labels == true_labels).mean()
        assert acc > 0.7, acc

    def test_train_step_on_mesh(self):
        """DP over the virtual 8-device CPU mesh."""
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        assert mesh.devices.size == 8
        model, state, step, batch_cf = self._setup(mesh=mesh, batch=8)
        batch = collate_to_device(batch_cf, mesh=mesh)
        rng = jax.random.PRNGKey(0)
        state, loss_dict, _ = step(state, batch, rng)
        assert np.isfinite(float(loss_dict["loss"]))
        state, loss_dict2, _ = step(state, batch, rng)
        assert float(loss_dict2["loss"]) != float(loss_dict["loss"])

    def test_sgd_momentum(self):
        model, state, _, batch_cf = self._setup()
        optimizer = SGD(lr=0.01, momentum=0.95)
        state = create_train_state(model, optimizer, batch_cf)
        step = make_train_step(model.module, HybridLogisticDiceLoss(), optimizer)
        batch = collate_to_device(batch_cf)
        state2, loss, _ = step(state, batch, jax.random.PRNGKey(0))
        assert int(state2.step) == 1
