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


class TestCascadeRefinement:
    def test_apply_stochastic_matrix_is_markov_update(self):
        rng = np.random.default_rng(0)
        N, C, sp_shape = 2, 3, (4, 4, 2)
        logits = rng.normal(size=(N, C, C, *sp_shape)).astype(np.float32)
        M = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)  # col-stochastic
        prior = rng.random((N, C, *sp_shape)).astype(np.float32)
        prior /= prior.sum(axis=1, keepdims=True)

        out = np.asarray(sp.apply_stochastic_matrix(
            jnp.asarray(M.reshape(N, C * C, *sp_shape)), jnp.asarray(prior)))
        expected = np.einsum("nrcwhd,ncwhd->nrwhd", M, prior)
        np.testing.assert_allclose(out, expected, atol=1e-6)
        # a proper refinement: NOT the identity the reference computes
        assert not np.allclose(out, prior)
        # still a distribution per voxel
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)

    def test_standard_predict_applies_refinement(self):
        from tests.conftest import make_subject

        class MatrixModel:
            def __call__(self, x):
                x = jnp.asarray(x)
                N, _, W, H, D = x.shape
                logits = jnp.stack([x[:, 0], -x[:, 0], x[:, 0] * 0, x[:, 0] * 0],
                                   axis=1).reshape(N, 2, 2, W, H, D)
                M = jax.nn.softmax(logits, axis=1)
                return M.reshape(N, 4, W, H, D)

        s = make_subject(spatial_shape=(8, 8, 4))
        s["X"] = s["img"]
        prior = np.zeros((2, 8, 8, 4), np.float32)
        prior[0] = 0.3
        prior[1] = 0.7
        from segmentation_pipeline_tpu.core.subject import ScalarImage
        s["y_prior"] = ScalarImage(tensor=prior, affine=np.eye(4))

        subs, batch = sp.StandardPredict(
            image_names=["X"], refine_image="y_prior").predict(
            MatrixModel(), [s], label_attributes={})
        y = np.asarray(subs[0]["y_pred"].data)
        assert y.shape[0] == 2, "refined prediction has C channels, not C^2"
        np.testing.assert_allclose(y.sum(axis=0), 1.0, atol=1e-5)

    def test_cascade_training_end_to_end(self, tmp_path):
        """The fused train step contracts the C^2 head with the prior: loss
        is finite and decreases (was: shape crash / silently unusable)."""
        from research.dmri_hippo.configs import cascade
        import tests.test_research_configs as rc
        from tests.test_research_configs import CROP

        class _F:
            def __init__(self, p):
                self._p = p

            def mktemp(self, name):
                d = self._p / name
                d.mkdir(exist_ok=True)
                return d

        root = rc.hippo_root.__wrapped__(_F(tmp_path))
        preds = tmp_path / "preds"
        for sub in (root / "subjects").iterdir():
            d = preds / "subjects" / sub.name
            d.mkdir(parents=True)
            if (sub / "whole_roi.nii.gz").exists():
                data, affine = sp.read_nifti(sub / "whole_roi.nii.gz")
            else:
                # stage-1 predictions exist for every subject in practice
                data, affine = sp.read_nifti(sub / "mean_dwi.nii.gz")
                data = (np.asarray(data) > np.asarray(data).mean()).astype(np.int16)
            sp.write_nifti(d / "standard.nii.gz", np.asarray(data).astype(np.int16),
                           affine)

        context = cascade.get_context(
            variables={"DATASET_PATH": str(root), "PREDICTIONS_PATH": str(preds)},
            prior_label_name="standard", fold=0, predict_hbt=False,
            crop_shape=CROP, filters=4)
        context.init_components()
        losses = []

        class Capture:
            def setup(self, context):
                pass

            def save_context(self, *a, **k):
                pass

            def log(self, d):
                losses.append(d["loss"])

        context.trainer.train(context, max_iterations=6, logger=Capture())
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


class TestTTAWithOneHotHistory:
    def test_tta_inverts_before_argmax(self, tmp_path):
        """A pipeline ending in CustomOneHot(include=['y']) records an
        inverse CustomArgMax; TTA must invert the C-channel prediction,
        not argmax first (which zeroed every prediction)."""
        import run_inference as ri
        from tests.conftest import make_subject

        class _Model:
            def __call__(self, x):
                fg = (jnp.asarray(x)[:, 0:1] > 0).astype(jnp.float32)
                return jnp.concatenate([1 - fg, fg], axis=1)

        import copy

        s = make_subject(spatial_shape=(8, 8, 8))
        # distinct objects: aliasing one Image under two names would apply
        # each spatial transform twice to it
        s["X"] = copy.deepcopy(s["img"])
        s["y"] = copy.deepcopy(s["seg"])
        del s["img"], s["seg"]
        sp.CustomOneHot(include=["y"])(s)  # recorded on the history tape
        assert len(s.history) == 1

        out = ri.test_time_augmentation(s, sp.StandardPredict(image_names=["X"]),
                                        _Model(), orientation_count=8)
        expected = (np.asarray(s["X"].data)[0] > 0).astype(np.int32)
        assert out.sum() > 0, "TTA must not zero the prediction"
        np.testing.assert_array_equal(out[0], expected)


class TestNiftiSclSlopeSpec:
    def test_slope_zero_ignores_scaling(self, tmp_path):
        import gzip
        import struct

        path = tmp_path / "x.nii.gz"
        data = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
        sp.write_nifti(path, data, np.eye(4))
        raw = bytearray(gzip.open(path, "rb").read())
        # scl_slope at offset 112, scl_inter at 116
        struct.pack_into("<f", raw, 112, 0.0)
        struct.pack_into("<f", raw, 116, 100.0)
        with gzip.open(path, "wb") as f:
            f.write(bytes(raw))
        out, _ = sp.read_nifti(path)
        np.testing.assert_allclose(np.asarray(out), data, atol=1e-6)


class TestDatasetStaging:
    def test_dotted_archive_name_and_real_root(self, tmp_path):
        import tarfile

        src = tmp_path / "data.v2"
        (src / "subjects").mkdir(parents=True)
        (src / "subjects" / "f.txt").write_text("x")
        archive = tmp_path / "data.v2.tar.gz"
        with tarfile.open(archive, "w:gz") as tar:
            tar.add(src, arcname="data.v2")
        work = tmp_path / "work"
        out = sp.prepare_dataset_files(archive, work)
        assert out.exists()
        assert (out / "subjects" / "f.txt").read_text() == "x"
        # second call: no re-extraction crash, same path
        assert sp.prepare_dataset_files(archive, work) == out

    def test_flat_rooted_archive(self, tmp_path):
        import tarfile

        src = tmp_path / "stuff"
        src.mkdir()
        (src / "a.txt").write_text("a")
        (src / "b.txt").write_text("b")
        archive = tmp_path / "flat.tar"
        with tarfile.open(archive, "w") as tar:
            tar.add(src / "a.txt", arcname="a.txt")
            tar.add(src / "b.txt", arcname="b.txt")
        out = sp.prepare_dataset_files(archive, tmp_path / "work2")
        assert (out / "a.txt").exists() and (out / "b.txt").exists()


class TestCheckpointListing:
    def test_arrays_sidecars_excluded(self, tmp_path):
        (tmp_path / "ctx-1.ckpt").write_bytes(b"x")
        (tmp_path / "ctx-2.ckpt").write_bytes(b"x")
        (tmp_path / "ctx-2.ckpt.arrays").mkdir()
        files = sp.list_checkpoint_files(tmp_path)
        names = [f.name for f in files]
        assert names == ["ctx-1.ckpt", "ctx-2.ckpt"]
