"""Fused on-device augmentation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from segmentation_pipeline_tpu.ops.augment import (
    augment_batch,
    random_affine_warp,
    random_bias_field,
    random_flip,
    rescale_intensity,
    trilinear_sample,
)


class TestTrilinearSample:
    def test_identity_coords(self):
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.normal(size=(8, 6, 5, 2)).astype(np.float32))
        coords = jnp.stack(jnp.meshgrid(
            jnp.arange(8.0), jnp.arange(6.0), jnp.arange(5.0), indexing="ij"))
        out = trilinear_sample(vol, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-6)

    def test_half_offset_interpolates(self):
        vol = jnp.arange(8, dtype=jnp.float32).reshape(8, 1, 1, 1)
        coords = jnp.array([[[[2.5]]], [[[0.0]]], [[[0.0]]]])
        out = trilinear_sample(vol, coords)
        assert abs(float(out[0, 0, 0, 0]) - 2.5) < 1e-6


class TestOps:
    def test_flip_consistent_image_label(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(6, 6, 6, 1)).astype(np.float32))
        y = (x > 0).astype(jnp.float32)
        x2, y2 = random_flip(jax.random.PRNGKey(0), x, y, flip_probability=1.0)
        np.testing.assert_array_equal(np.asarray(x2 > 0), np.asarray(y2 > 0))

    def test_affine_identityish(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 8, 8, 1)).astype(np.float32))
        x2, _ = random_affine_warp(jax.random.PRNGKey(0), x, None,
                                   scales=0.0, degrees=0.0)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)

    def test_bias_field_positive(self):
        x = jnp.ones((8, 8, 8, 1))
        out = random_bias_field(jax.random.PRNGKey(3), x)
        assert (np.asarray(out) > 0).all()
        assert np.asarray(out).std() > 0

    def test_rescale(self):
        x = jnp.asarray(np.random.default_rng(4).normal(size=(8, 8, 8, 1)))
        out = np.asarray(rescale_intensity(x, -1, 1))
        assert out.min() >= -1 - 1e-6 and out.max() <= 1 + 1e-6


class TestAugmentBatch:
    def test_shapes_and_label_integrity(self):
        rng = np.random.default_rng(5)
        X = jnp.asarray(rng.normal(size=(2, 16, 16, 8, 3)).astype(np.float32))
        labels = (np.asarray(X[..., :1]) > 0).astype(np.float32)
        y = jnp.asarray(np.concatenate([1 - labels, labels], axis=-1))
        X2, y2 = augment_batch(jax.random.PRNGKey(0), X, y)
        assert X2.shape == X.shape and y2.shape == y.shape
        vals = np.unique(np.asarray(y2))
        assert set(np.round(vals, 6)) <= {0.0, 1.0}  # labels stay crisp
        assert np.asarray(X2).min() >= -1 - 1e-5

    def test_deterministic_given_key(self):
        X = jnp.asarray(np.random.default_rng(6).normal(
            size=(2, 8, 8, 8, 1)).astype(np.float32))
        a, _ = augment_batch(jax.random.PRNGKey(7), X)
        b, _ = augment_batch(jax.random.PRNGKey(7), X)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c, _ = augment_batch(jax.random.PRNGKey(8), X)
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_bf16_input_runs_and_tracks_f32(self):
        """bf16-cached volumes must augment without dtype errors (the
        lax.cond gates need branch dtypes to agree; compute happens in f32
        with coords ALWAYS f32) and return bf16, tracking the f32 result
        to bf16 precision under both batchings."""
        rng = np.random.default_rng(13)
        X32 = jnp.asarray(rng.normal(size=(2, 12, 14, 8, 2)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 3, size=(2, 12, 14, 8)).astype(np.uint8))
        key = jax.random.PRNGKey(3)
        cfg = {"elastic_p": 0.5, "bias_p": 0.5, "gamma_p": 0.5,
               "noise_p": 0.5, "affine_p": 0.5}
        for batching in ("map", "vmap"):
            c = {**cfg, "affine_batching": batching}
            Xb, yb = augment_batch(key, X32.astype(jnp.bfloat16), ids,
                                   config=c)
            assert Xb.dtype == jnp.bfloat16 and yb.dtype == jnp.uint8
            Xf, yf = augment_batch(key, X32, ids, config=c)
            np.testing.assert_allclose(
                np.asarray(Xb, np.float32), np.asarray(Xf), atol=0.05)
            # the label path never touches the image dtype
            np.testing.assert_array_equal(np.asarray(yb), np.asarray(yf))

    def test_map_and_vmap_full_pipeline_agree(self):
        """The per-sample lax.map batching (whose lax.cond gates SKIP
        unapplied ops) must produce the same augmentation as the vmap
        batching (whose batched conds lower to selects) — every gate
        active so all cond branches are exercised."""
        rng = np.random.default_rng(21)
        X = jnp.asarray(rng.normal(size=(4, 12, 14, 8, 2)).astype(np.float32))
        ids = rng.integers(0, 3, size=(4, 12, 14, 8)).astype(np.uint8)
        cfg = {"elastic_p": 0.5, "bias_p": 0.5, "gamma_p": 0.5,
               "noise_p": 0.5, "affine_p": 0.5}
        key = jax.random.PRNGKey(7)
        Xm, ym = augment_batch(key, X, jnp.asarray(ids),
                               config={**cfg, "affine_batching": "map"})
        Xv, yv = augment_batch(key, X, jnp.asarray(ids),
                               config={**cfg, "affine_batching": "vmap"})
        np.testing.assert_allclose(np.asarray(Xm), np.asarray(Xv), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ym), np.asarray(yv))

    def test_ids_path_bitmatches_onehot_path(self):
        """Warping uint8 class ids == argmax of warping the one-hot planes
        (nearest sampling copies one source voxel, so it commutes with the
        encoding) — the trainer's fast label path must not drift."""
        rng = np.random.default_rng(11)
        X = jnp.asarray(rng.normal(size=(3, 16, 16, 8, 2)).astype(np.float32))
        ids = rng.integers(0, 3, size=(3, 16, 16, 8)).astype(np.uint8)
        onehot = jnp.asarray(jax.nn.one_hot(ids, 3, dtype=jnp.float32))
        cfg = {"elastic_p": 0.5}  # exercise the elastic label warp too
        key = jax.random.PRNGKey(42)
        X_a, y_onehot = augment_batch(key, X, onehot, config=cfg)
        X_b, y_ids = augment_batch(key, X, jnp.asarray(ids), config=cfg)
        assert y_ids.shape == ids.shape and y_ids.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(X_a), np.asarray(X_b))
        np.testing.assert_array_equal(np.argmax(np.asarray(y_onehot), -1),
                                      np.asarray(y_ids))

    def test_bf16_warp_gather_option(self):
        """warp_gather_dtype="bfloat16" (VERDICT r2 #9: the measured ~9%
        HBM lever) rounds only the affine warp's image taps: the output
        must track the exact-f32 pipeline within bf16 tap precision, the
        same random stream (identical geometry), and labels — which ride
        the nearest-neighbor ids path untouched — must stay bit-identical."""
        rng = np.random.default_rng(33)
        X = jnp.asarray(rng.normal(size=(3, 12, 14, 8, 2)).astype(np.float32))
        ids = rng.integers(0, 3, size=(3, 12, 14, 8)).astype(np.uint8)
        key = jax.random.PRNGKey(5)
        cfg = {"affine_p": 1.0, "elastic_p": 0.0, "bias_p": 0.0,
               "gamma_p": 0.0, "noise_p": 0.0}
        Xf, yf = augment_batch(key, X, jnp.asarray(ids), config=cfg)
        Xb, yb = augment_batch(key, X, jnp.asarray(ids),
                               config={**cfg, "warp_gather_dtype": "bfloat16"})
        assert Xb.dtype == Xf.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(yb), np.asarray(yf))
        # outputs are rescaled to [-1, 1]; bf16 taps carry ~2^-8 relative
        # rounding, amplified slightly by the percentile rescale
        np.testing.assert_allclose(np.asarray(Xb), np.asarray(Xf), atol=0.03)
        assert not np.array_equal(np.asarray(Xb), np.asarray(Xf))

    def test_per_sample_independence(self):
        X = jnp.asarray(np.tile(np.random.default_rng(9).normal(
            size=(1, 8, 8, 8, 1)).astype(np.float32), (2, 1, 1, 1, 1)))
        out, _ = augment_batch(jax.random.PRNGKey(1), X)
        assert not np.array_equal(np.asarray(out[0]), np.asarray(out[1]))


class TestDeviceResample:
    def test_matches_host_resample(self):
        from segmentation_pipeline_tpu.ops.resample import resample_volume
        from segmentation_pipeline_tpu.transforms.spatial import resample_array

        rng = np.random.default_rng(0)
        data = rng.normal(size=(2, 12, 10, 8)).astype(np.float32)
        src_affine = np.diag([2.0, 2.0, 2.0, 1.0])
        dst_affine = np.diag([1.0, 1.0, 1.0, 1.0])
        dst_shape = (24, 20, 16)
        host = resample_array(data, src_affine, dst_affine, dst_shape, order=1)
        dev = np.asarray(resample_volume(data, src_affine, dst_affine, dst_shape,
                                         order=1))
        # edge handling differs (scipy constant-pad vs clamp); compare interior
        inner = (slice(None), slice(1, 21), slice(1, 17), slice(1, 13))
        np.testing.assert_allclose(dev[inner], host[inner], atol=1e-4)

    def test_nearest_for_labels(self):
        from segmentation_pipeline_tpu.ops.resample import resample_volume

        labels = np.zeros((1, 8, 8, 8), np.float32)
        labels[:, 2:6, 2:6, 2:6] = 3.0
        out = np.asarray(resample_volume(labels, np.eye(4), np.eye(4), (8, 8, 8),
                                         order=0))
        np.testing.assert_array_equal(out, labels)


class TestDeviceMorphology:
    def test_device_cc_matches_native_partition(self):
        from segmentation_pipeline_tpu.native import connected_components_native
        from segmentation_pipeline_tpu.ops.morphology import (
            compact_labels,
            connected_components_device,
        )

        rng = np.random.default_rng(0)
        mask = rng.random((20, 18, 16)) > 0.75
        dev, n_dev = compact_labels(connected_components_device(mask, connectivity=3))
        ref, n_ref = connected_components_native(mask, connectivity=3)
        assert n_dev == n_ref
        # identical partitions: components must correspond 1:1
        for i in range(1, n_ref + 1):
            ids = np.unique(dev[ref == i])
            assert len(ids) == 1 and ids[0] != 0
        assert ((dev > 0) == (ref > 0)).all()

    def test_device_cc_connectivity_1(self):
        from segmentation_pipeline_tpu.ops.morphology import (
            compact_labels,
            connected_components_device,
        )

        mask = np.zeros((6, 6, 6), bool)
        mask[0, 0, 0] = True
        mask[1, 1, 1] = True  # diagonal: separate under 6-connectivity
        _, n6 = compact_labels(connected_components_device(mask, connectivity=1))
        _, n26 = compact_labels(connected_components_device(mask, connectivity=3))
        assert n6 == 2 and n26 == 1

    def test_device_dilation_matches_scipy(self):
        from scipy import ndimage as ndi

        from segmentation_pipeline_tpu.ops.morphology import binary_dilation_device

        rng = np.random.default_rng(1)
        mask = rng.random((12, 12, 12)) > 0.9
        dev = np.asarray(binary_dilation_device(mask, connectivity=1, iterations=2))
        ref = ndi.binary_dilation(mask, ndi.generate_binary_structure(3, 1),
                                  iterations=2)
        np.testing.assert_array_equal(dev, ref)
