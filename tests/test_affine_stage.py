"""Staged device-augmentation pipeline (ops/augment.py): the batched affine
stage must be exact under both batching strategies and preserve the original
per-op random streams and label contracts."""
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_pipeline_tpu.ops.augment import (
    _affine_stage,
    augment_batch,
    draw_affine_matrix,
    random_affine_warp,
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

    @staticmethod
    def _scipy_warp(x, A, pad=0.0):
        """Independent oracle: center-relative affine resample via
        scipy.ndimage.map_coordinates (order-1 = trilinear, mode='nearest'
        = the same edge clamp), coords built with einsum over an explicit
        identity grid — shares no code with _affine_coords_oob."""
        from scipy.ndimage import map_coordinates

        W, H, D, C = x.shape
        sp = np.array([W, H, D], np.float64)
        center = (sp - 1) / 2
        grid = np.stack(np.meshgrid(np.arange(W), np.arange(H),
                                    np.arange(D), indexing="ij")).astype(
                                        np.float64)
        rel = grid - center[:, None, None, None]
        co = np.einsum("ij,jwhd->iwhd", np.asarray(A, np.float64),
                       rel) + center[:, None, None, None]
        oob = ((co < 0)
               | (co > (sp - 1)[:, None, None, None])).any(axis=0)
        out = np.stack([map_coordinates(np.asarray(x[..., c], np.float64),
                                        co, order=1, mode="nearest")
                        for c in range(C)], axis=-1)
        return np.where(oob[..., None], pad, out)

    def test_matches_independent_scipy_oracle(self):
        """Both the batched stage AND the public per-sample op must match a
        scipy map_coordinates oracle that shares no coordinate code with
        either (guards against sign/center errors in _affine_coords_oob,
        which both paths share)."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 12, 10, 8, 2)).astype(np.float32))
        A = rand_A(4, 2)
        do = jnp.array([True, True])
        Xs, _ = _affine_stage(do, A, x, None)
        for b in range(2):
            want = self._scipy_warp(x[b], A[b])
            np.testing.assert_allclose(np.asarray(Xs[b]), want, atol=1e-4)

    def test_per_sample_op_matches_oracle(self):
        key = jax.random.PRNGKey(11)
        x = jnp.asarray(np.random.default_rng(8).normal(
            size=(12, 10, 8, 2)).astype(np.float32))
        got, _ = random_affine_warp(key, x, None, scales=0.2, degrees=45.0,
                                    pad_value=-3.0)
        A = draw_affine_matrix(key, 0.2, 45.0)  # the same matrix the op drew
        want = self._scipy_warp(x, A, pad=-3.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

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
