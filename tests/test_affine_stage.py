"""Staged device-augmentation pipeline (ops/augment.py): the batched affine
stage must be exact under both batching strategies and preserve the original
per-op random streams and label contracts."""
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_pipeline_tpu.ops.augment import (
    _affine_coords_oob,
    _affine_stage,
    augment_batch,
    draw_affine_matrix,
    random_affine_warp,
    trilinear_sample,
)


def rand_A(seed, n):
    return jax.vmap(lambda k: draw_affine_matrix(k, 0.2, 45.0))(
        jax.random.split(jax.random.PRNGKey(seed), n))


class TestAffineStage:
    def test_map_and_vmap_batchings_agree(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, 14, 12, 10, 2)).astype(np.float32))
        y = (x[..., :1] > 0).astype(jnp.float32)
        do = jnp.array([True, False, True])
        A = rand_A(1, 3)
        Xm, ym = _affine_stage(do, A, x, y, batching="map")
        Xv, yv = _affine_stage(do, A, x, y, batching="vmap")
        np.testing.assert_allclose(np.asarray(Xm), np.asarray(Xv), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ym), np.asarray(yv))

    def test_do_false_is_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 12, 12, 8, 2)).astype(np.float32))
        y = (x[..., :1] > 0).astype(jnp.float32)
        do = jnp.array([False, False])
        X2, y2 = _affine_stage(do, rand_A(2, 2), x, y)
        np.testing.assert_allclose(np.asarray(X2), np.asarray(x), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(y2), np.asarray(y))

    def test_matches_per_sample_random_affine_warp(self):
        """The batched stage samples the same coords as the per-sample
        reference warp: feeding the same A must give identical output."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 12, 10, 8, 2)).astype(np.float32))
        A = rand_A(4, 2)
        do = jnp.array([True, True])
        Xs, _ = _affine_stage(do, A, x, None)
        for b in range(2):
            coords, oob = _affine_coords_oob(A[b], (12, 10, 8))
            want = jnp.where(oob[..., None], 0.0,
                             trilinear_sample(x[b], coords))
            np.testing.assert_allclose(np.asarray(Xs[b]), np.asarray(want),
                                       atol=1e-4)

    def test_one_hot_labels_stay_valid_partition(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8, 1)).astype(np.float32))
        lab = (np.asarray(x[..., :1]) > 0).astype(np.float32)
        y = jnp.asarray(np.concatenate([1 - lab, lab], axis=-1))
        _, y2 = _affine_stage(jnp.array([True, True]), rand_A(6, 2), x, y)
        y2 = np.asarray(y2)
        assert set(np.round(np.unique(y2), 6)) <= {0.0, 1.0}
        np.testing.assert_array_equal(y2.sum(-1), np.ones(y2.shape[:-1]))


class TestStagedPipelineContracts:
    def test_full_pipeline_contract(self):
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(size=(2, 16, 16, 8, 3)).astype(np.float32))
        lab = (np.asarray(X[..., :1]) > 0).astype(np.float32)
        y = jnp.asarray(np.concatenate([1 - lab, lab], axis=-1))
        X2, y2 = augment_batch(jax.random.PRNGKey(0), X, y,
                               config={"affine_p": 1.0})
        assert X2.shape == X.shape and y2.shape == y.shape
        assert set(np.round(np.unique(np.asarray(y2)), 6)) <= {0.0, 1.0}

    def test_per_sample_warp_reference_unchanged(self):
        """random_affine_warp (the public per-sample op) still works and
        masks out-of-bounds voxels to the pad value."""
        x = jnp.asarray(np.random.default_rng(7).normal(
            size=(12, 12, 8, 1)).astype(np.float32) + 10.0)
        x2, _ = random_affine_warp(jax.random.PRNGKey(0), x, None,
                                   scales=0.0, degrees=40.0, pad_value=-7.0)
        assert (np.asarray(x2) == -7.0).any()  # rotated corners masked
