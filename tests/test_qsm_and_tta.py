"""QSM config integration + run_inference TTA tests."""
import json

import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.loggers import FileLogger


@pytest.fixture(scope="module")
def qsm_root(tmp_path_factory):
    """Synthetic QSM dataset with the full 17-structure label dict."""
    from research.qsm_deep_grey_matter.qsm_deep_grey_matter import DGM_LABEL_VALUES

    root = tmp_path_factory.mktemp("qsm")
    rng = np.random.default_rng(0)
    W, H, D = 40, 40, 24
    values = list(DGM_LABEL_VALUES.values())
    for i in range(4):
        d = root / "subjects" / f"Cb_Brain_{i:03d}"
        d.mkdir(parents=True)
        dgm = np.zeros((1, W, H, D), np.int16)
        # plant each structure as a small block (left half / right half)
        rs = np.random.default_rng(i)
        for v in values:
            cx = rs.integers(2, W // 2 - 4) if v % 2 == 1 else rs.integers(W // 2, W - 6)
            cy = rs.integers(2, H - 6)
            cz = rs.integers(2, D - 5)
            dgm[:, cx:cx + 3, cy:cy + 3, cz:cz + 2] = v
        t1 = rng.normal(size=(1, W, H, D)).astype(np.float32) + (dgm > 0) * 2.0
        qsm = rng.normal(size=(1, W, H, D)).astype(np.float32) + (dgm > 0)
        sp.write_nifti(d / "MPRAGE.nii.gz", t1, np.eye(4))
        sp.write_nifti(d / "QSM.nii.gz", qsm, np.eye(4))
        sp.write_nifti(d / "vB_PS_r.nii.gz", dgm, np.eye(4))
    return root


class TestQsmConfig:
    def test_label_pipeline_and_training(self, qsm_root, tmp_path):
        from research.qsm_deep_grey_matter.qsm_deep_grey_matter import get_context

        context = get_context(
            variables={"DATASET_PATH": str(qsm_root)},
            crop=(4, 4, 4, 4, 0, 0), filters=4,
            val_subjects=["Cb_Brain_000"])
        context.init_components()
        assert len(context.dataset) == 4

        s = context.dataset[0]
        # ventricles/dentate removed, L/R merged, sequential to <=9 fg classes
        y = np.asarray(s["y"].data)
        assert y.shape[0] == 10  # one-hot with num_classes=10
        assert s["X"].data.shape[0] == 2
        label_values = s["dgm"]["label_values"]
        assert "left_ventricle" not in label_values
        assert max(label_values.values()) <= 9

        logger = FileLogger(str(tmp_path))
        context.trainer.train(context, max_iterations=2, logger=logger)
        metrics = [json.loads(l) for l in open(logger.run_dir / "metrics.jsonl")]
        assert len(metrics) == 2
        assert np.isfinite(metrics[-1]["loss"])

    def test_single_chip_fit_recipe(self, qsm_root, tmp_path, capsys):
        """The PARITY.md single-chip recipe: microbatch=2 + grad
        accumulation, tpu_fast_path (remat + device cache + auto device
        aug — a no-op derivation here, the qsm pipeline is deterministic)
        and bfloat16 compute. Params must only move every accumulate_steps
        micro-steps and must stay f32 master weights."""
        import jax

        from research.qsm_deep_grey_matter.qsm_deep_grey_matter import get_context

        context = get_context(
            variables={"DATASET_PATH": str(qsm_root)},
            crop=(4, 4, 4, 4, 0, 0), filters=4,
            val_subjects=["Cb_Brain_000"],
            tpu_fast_path=True, microbatch=2, compute_dtype="bfloat16")
        context.init_components()
        assert context.trainer.training_batch_size == 2
        assert context.model.module.remat is True

        logger = FileLogger(str(tmp_path))
        context.trainer.train(context, max_iterations=2, logger=logger)
        p2 = jax.tree_util.tree_map(np.asarray, context.model.params)
        # accumulate_steps=2 and the optimizer state persists across
        # in-process train() re-entry: micro-step 3 only banks grads...
        context.trainer.train(context, max_iterations=1, logger=logger,
                              force_continue=True)
        p3 = jax.tree_util.tree_map(np.asarray, context.model.params)
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.array_equal(a, b), p2, p3))
        assert same, "params moved on a banked accumulation micro-step"
        # ...and micro-step 4 applies the averaged update
        context.trainer.train(context, max_iterations=1, logger=logger,
                              force_continue=True)
        p4 = jax.tree_util.tree_map(np.asarray, context.model.params)
        moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.array_equal(a, b), p3, p4))
        assert moved, "params never moved across full accumulation windows"
        assert all(l.dtype == np.float32
                   for l in jax.tree_util.tree_leaves(context.model.params))
        out = capsys.readouterr().out
        assert "declares no stochastic transforms" in out


class TestRunInferenceTTA:
    def test_orientation_tta(self, tmp_path):
        """48-orientation transforms + majority vote on a voxelwise model."""
        import run_inference as ri

        transforms = ri.get_test_time_transforms()
        assert len(transforms) == 48

        class _Model:
            def __call__(self, x):
                import jax.numpy as jnp

                fg = (jnp.asarray(x)[:, 0:1] > 0).astype(jnp.float32)
                return jnp.concatenate([1 - fg, fg], axis=1)

        s = sp.Subject({"name": "s0", "folder": str(tmp_path)})
        rng = np.random.default_rng(0)
        data = rng.normal(size=(1, 8, 8, 8)).astype(np.float32)
        s["X"] = sp.ScalarImage(tensor=data, affine=np.eye(4))
        predictor = sp.StandardPredict(image_names=["X"])
        out = ri.test_time_augmentation(s, predictor, _Model(),
                                        orientation_count=8)
        # voxelwise model is orientation-equivariant: TTA must equal direct
        expected = (data[0] > 0).astype(np.int32)
        np.testing.assert_array_equal(out[0], expected)


class TestEnsembleOrientations:
    def test_orientation_ensemble_invariance(self):
        import jax.numpy as jnp

        from segmentation_pipeline_tpu.models.ensemble import EnsembleOrientations

        def model(x):
            fg = (jnp.asarray(x)[:, 0:1] > 0).astype(jnp.float32)
            return jnp.concatenate([1 - fg, fg], axis=1)

        x = np.random.default_rng(1).normal(size=(1, 1, 4, 4, 4)).astype(np.float32)
        direct = np.asarray(model(x))
        tta = np.asarray(EnsembleOrientations(model, "mean")(x))
        np.testing.assert_allclose(tta, direct, atol=1e-6)


class TestBatchedShardedTTA:
    """batched / mesh-sharded TTA == the unrolled reference semantics."""

    @pytest.fixture(scope="class")
    def seg_model(self):
        import jax.numpy as jnp

        from segmentation_pipeline_tpu.models.nested_unet import NestedResUNet
        from segmentation_pipeline_tpu.training.model import SegModel

        model = SegModel(NestedResUNet(input_channels=1, output_channels=2,
                                       filters=4), seed=0)
        model.ensure_initialized(jnp.zeros((1, 1, 8, 8, 8)))
        return model

    @pytest.fixture(scope="class")
    def x(self):
        return np.random.default_rng(3).normal(size=(1, 1, 8, 8, 8)).astype(np.float32)

    def test_batched_flips_match_unrolled(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleFlips

        ref = np.asarray(EnsembleFlips(seg_model, "mean")(x))
        fused = np.asarray(EnsembleFlips(seg_model, "mean", batched=True)(x))
        np.testing.assert_allclose(fused, ref, atol=1e-5)

    def test_mesh_sharded_flips_match_unrolled(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleFlips
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # 8 virtual devices; E=8 flips -> 1 member/device
        ref = np.asarray(EnsembleFlips(seg_model, "majority")(x))
        sharded = np.asarray(EnsembleFlips(seg_model, "majority", mesh=mesh)(x))
        np.testing.assert_allclose(sharded, ref, atol=1e-5)

    def test_batched_orientations_match_unrolled(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleOrientations

        ref = np.asarray(EnsembleOrientations(seg_model, "mean")(x))
        fused = np.asarray(EnsembleOrientations(seg_model, "mean", batched=True)(x))
        np.testing.assert_allclose(fused, ref, atol=1e-5)

    def test_mesh_sharded_flips_indivisible_members(self, seg_model, x):
        """(members x batch) not divisible by the mesh axis must pad-and-run,
        not crash: 2 spatial dims -> 4 flip members of a batch of 1 on the
        8-device mesh (the hippo_inference --tta_mesh trailing-batch case)."""
        from segmentation_pipeline_tpu.models.ensemble import EnsembleFlips
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        ref = np.asarray(EnsembleFlips(seg_model, "mean",
                                       spatial_dims=(3, 4))(x))
        sharded = np.asarray(EnsembleFlips(seg_model, "mean",
                                           spatial_dims=(3, 4), mesh=mesh)(x))
        np.testing.assert_allclose(sharded, ref, atol=1e-5)

        # odd batch: 3 subjects x 4 members = 12, not divisible by 8
        x3 = np.concatenate([x, x * 0.5, x * 2.0], axis=0)
        ref3 = np.asarray(EnsembleFlips(seg_model, "mean",
                                        spatial_dims=(3, 4))(x3))
        sharded3 = np.asarray(EnsembleFlips(seg_model, "mean",
                                            spatial_dims=(3, 4), mesh=mesh)(x3))
        np.testing.assert_allclose(sharded3, ref3, atol=1e-5)


class TestEnsembleAffines:
    """Affine-family TTA (the capability the reference inherits from
    torchio's invertible Affine history, ref hippo_inference.py:27-32):
    warp -> forward -> inverse-warp -> masked combine."""

    @pytest.fixture(scope="class")
    def seg_model(self):
        import jax.numpy as jnp

        from segmentation_pipeline_tpu.models.nested_unet import NestedResUNet
        from segmentation_pipeline_tpu.training.model import SegModel

        model = SegModel(NestedResUNet(input_channels=1, output_channels=2,
                                       filters=4), seed=0)
        model.ensure_initialized(jnp.zeros((1, 1, 8, 8, 8)))
        return model

    @pytest.fixture(scope="class")
    def x(self):
        return np.random.default_rng(5).normal(
            size=(2, 1, 8, 8, 8)).astype(np.float32)

    def test_identity_member_only_is_direct_forward(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines

        tta = EnsembleAffines(seg_model, num_members=1)
        np.testing.assert_allclose(np.asarray(tta(x)),
                                   np.asarray(seg_model(x)), atol=1e-6)

    def test_constant_model_survives_warp_round_trip(self):
        """Inverse-interpolating a constant field is exact, so TTA over any
        matrices must reproduce the constant everywhere (plumbing + mask
        normalization check)."""
        import jax.numpy as jnp

        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines

        def const_model(x):
            n = jnp.asarray(x).shape[0]
            spatial = jnp.asarray(x).shape[2:]
            p = jnp.full((n, 1, *spatial), 0.3, jnp.float32)
            return jnp.concatenate([p, 1 - p], axis=1)

        x = np.random.default_rng(0).normal(size=(1, 1, 10, 10, 10)
                                            ).astype(np.float32)
        out = np.asarray(EnsembleAffines(const_model, num_members=5,
                                         scales=0.2, degrees=30)(x))
        np.testing.assert_allclose(out[:, 0], 0.3, atol=1e-5)
        np.testing.assert_allclose(out[:, 1], 0.7, atol=1e-5)

    def test_linear_field_round_trip_interior(self):
        """Trilinear interpolation reproduces linear functions exactly, so a
        model that echoes a linear ramp comes back unchanged in the region
        every member covers (boundary voxels are masked or clamped)."""
        import jax.numpy as jnp

        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines

        def echo_model(x):
            x = jnp.asarray(x)
            return jnp.concatenate([x, 1 - x], axis=1)

        W = 12
        ramp = (np.arange(W, dtype=np.float32) / (2 * W))[:, None, None]
        x = np.broadcast_to(ramp, (W, W, W))[None, None].copy()
        out = np.asarray(EnsembleAffines(echo_model, num_members=3,
                                         scales=0.05, degrees=5, seed=1)(x))
        c = slice(3, W - 3)
        np.testing.assert_allclose(out[0, 0, c, c, c], x[0, 0, c, c, c],
                                   atol=1e-4)

    def test_batched_matches_unrolled(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines

        ref = np.asarray(EnsembleAffines(seg_model, num_members=3,
                                         seed=2)(x))
        fused = np.asarray(EnsembleAffines(seg_model, num_members=3,
                                           seed=2, batched=True)(x))
        np.testing.assert_allclose(fused, ref, atol=1e-5)

    def test_mesh_sharded_matches_unrolled(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines
        from segmentation_pipeline_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # 3 members x batch 2 = 6 rows -> pad to 8
        ref = np.asarray(EnsembleAffines(seg_model, num_members=3,
                                         seed=2)(x))
        sharded = np.asarray(EnsembleAffines(seg_model, num_members=3,
                                             seed=2, mesh=mesh)(x))
        np.testing.assert_allclose(sharded, ref, atol=1e-5)

    def test_majority_is_one_hot_and_deterministic(self, seg_model, x):
        from segmentation_pipeline_tpu.models.ensemble import EnsembleAffines

        out1 = np.asarray(EnsembleAffines(seg_model, num_members=4,
                                          strategy="majority", seed=7)(x))
        out2 = np.asarray(EnsembleAffines(seg_model, num_members=4,
                                          strategy="majority", seed=7)(x))
        np.testing.assert_array_equal(out1, out2)
        assert set(np.unique(out1)) <= {0.0, 1.0}
        np.testing.assert_allclose(out1.sum(axis=1), 1.0)
