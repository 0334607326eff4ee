"""Device post-processing pipelines (VERDICT r2 #3): exact parity of the
fused on-device remove_holes / keep_components / remove_small_components
chains against the host native-C++ path (post_processing.py, ref
post_processing.py:28-73)."""
import numpy as np
import pytest
from scipy import ndimage as ndi

from segmentation_pipeline_tpu.ops.morphology import (
    apply_device_postprocess,
    keep_components_device,
    remove_holes_device,
    remove_small_components_device,
)
from segmentation_pipeline_tpu.post_processing import (
    keep_components,
    remove_holes,
    remove_small_components,
)


def _blobby_labels(seed, shape=(28, 24, 20), n_classes=3, density=0.18,
                   grow=2):
    """Random multi-label volume with blobs, holes and small islands —
    component sizes are generically distinct (the device keep_components
    tie-break divergence never triggers)."""
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) < density
    mask = ndi.binary_dilation(mask, iterations=grow)
    labels = np.zeros(shape, np.int32)
    # label by connected component round-robin over classes 1..n_classes-1
    cc, n = ndi.label(mask, structure=np.ones((3, 3, 3)))
    for comp in range(1, n + 1):
        labels[cc == comp] = 1 + (comp % (n_classes - 1))
    # punch holes
    holes = rng.random(shape) < 0.03
    labels[holes] = 0
    return labels


class TestRemoveHolesDevice:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_host(self, seed):
        img = _blobby_labels(seed)
        host, host_holes = remove_holes(img.copy(), hole_size=24)
        dev, dev_holes = remove_holes_device(img, hole_size=24)
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert int(dev_holes) == host_holes

    def test_no_holes_noop(self):
        img = np.zeros((8, 8, 8), np.int32)
        img[2:6, 2:6, 2:6] = 1
        dev, holes = remove_holes_device(img, hole_size=10)
        np.testing.assert_array_equal(np.asarray(dev), img)
        assert int(holes) == 0


class TestKeepComponentsDevice:
    @pytest.mark.parametrize("seed,num", [(0, 2), (1, 1), (2, 3)])
    def test_matches_host(self, seed, num):
        img = _blobby_labels(seed)
        host, host_comp, host_elems = keep_components(img.copy(), num)
        dev, dev_comp, dev_elems = keep_components_device(
            img, num, num_classes=4)
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert int(dev_comp) == host_comp
        assert int(dev_elems) == host_elems

    def test_fewer_components_than_num(self):
        img = np.zeros((10, 10, 6), np.int32)
        img[1:4, 1:4, 1:4] = 2
        host, hc, he = keep_components(img.copy(), 3)
        dev, dc, de = keep_components_device(img, 3, num_classes=4)
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert (int(dc), int(de)) == (hc, he) == (0, 0)

    def test_background_competes_for_keep_slots(self):
        """Host sort_by_size ranks BACKGROUND like any component (ref
        post_processing.py:28-47): two slabs outsizing a thin background
        plane with num=1 means the host keeps both slabs and removes/fills
        the background — the device path must match, not protect cur==0."""
        img = np.zeros((12, 10, 10), np.int32)
        img[:5] = 1    # 500-voxel slab
        img[6:] = 2    # 600-voxel slab; img[5] stays 0 (100-voxel bg plane)
        host, hc, he = keep_components(img.copy(), 1)
        dev, dc, de = keep_components_device(img, 1, num_classes=3)
        assert (host == 0).sum() == 0   # the host really fills background
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert (int(dc), int(de)) == (hc, he)

    def test_single_component_no_background(self):
        """A volume with no background voxels is one component: nothing is
        removed and the report counts stay zero on both paths."""
        img = np.ones((8, 8, 8), np.int32)
        img[4:] = 2
        host, hc, he = keep_components(img.copy(), 1)
        dev, dc, de = keep_components_device(img, 1, num_classes=3)
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert (int(dc), int(de)) == (hc, he) == (0, 0)


class TestRemoveSmallComponentsDevice:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_host(self, seed):
        img = _blobby_labels(seed)
        host, host_counts = remove_small_components(img.copy(), 20)
        dev, dev_counts = remove_small_components_device(img, 20)
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert int(dev_counts) == host_counts


class TestFusedChain:
    def test_msseg2_style_chain(self):
        """The ms_inference cleanup order (remove_holes(64) then
        remove_small_components(3), ref ms-inference.py:47-51) fused on
        device equals the host chain voxel-for-voxel."""
        img = _blobby_labels(7, n_classes=2)
        host, _ = remove_holes(img.copy(), hole_size=64)
        host, _ = remove_small_components(host, 3)
        dev = np.asarray(apply_device_postprocess(
            img, [("remove_holes", 64), ("remove_small_components", 3)],
            num_classes=2))
        np.testing.assert_array_equal(dev, host)

    def test_hippo_style_chain(self):
        """The hippo_inference cleanup order (remove_holes(64) then
        keep_components, ref hippo_inference.py:36-50)."""
        img = _blobby_labels(9)
        host, _ = remove_holes(img.copy(), hole_size=64)
        host, _, _ = keep_components(host, 2)
        dev = np.asarray(apply_device_postprocess(
            img, [("remove_holes", 64), ("keep_components", 2)],
            num_classes=4))
        np.testing.assert_array_equal(dev, host)

    def test_unknown_op_raises(self):
        with pytest.raises(ValueError):
            apply_device_postprocess(np.zeros((4, 4, 4), np.int32),
                                     [("erode", 1)], num_classes=2)


class TestFusedPredictorPostprocess:
    """device_postprocess through the REAL PatchPredict path (the
    production composition, not just the op chain): sliding window ->
    device argmax -> fused cleanup -> bit-packed fetch -> one-hot attach
    must equal the same predictor followed by the host post_processing
    calls on the fetched segmentation."""

    def _subject(self, labels):
        from segmentation_pipeline_tpu.core.subject import ScalarImage, Subject

        x = np.where(labels > 0, 2.0, -2.0).astype(np.float32)[None]
        s = Subject(name="s0", folder="/tmp")
        s["X"] = ScalarImage(tensor=x, affine=np.eye(4))
        return s

    @staticmethod
    def _model(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        fg = (x[:, 0:1] > 0).astype(jnp.float32)
        return jnp.concatenate([1 - fg, fg], axis=1)

    def test_patch_predict_fused_equals_host_chain(self):
        from segmentation_pipeline_tpu.prediction import PatchPredict

        labels = _blobby_labels(11, shape=(24, 20, 16), n_classes=2)
        chain = [("remove_holes", 8), ("remove_small_components", 3)]

        fused_subjects, _ = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=4, device_argmax=True,
            device_postprocess=chain).predict(
                self._model, [self._subject(labels)])
        fused_ids = np.argmax(
            np.asarray(fused_subjects[0]["y_pred"].data), axis=0)

        plain_subjects, _ = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=4, device_argmax=True).predict(
                self._model, [self._subject(labels)])
        host_ids = np.argmax(
            np.asarray(plain_subjects[0]["y_pred"].data), axis=0).astype(np.int32)
        host_ids, _ = remove_holes(host_ids, hole_size=8)
        host_ids, _ = remove_small_components(host_ids, 3)

        assert fused_ids.any()  # the cleanup must not wipe the volume
        assert not np.array_equal(
            host_ids, np.argmax(np.asarray(plain_subjects[0]["y_pred"].data),
                                axis=0))  # ... and must actually do work
        np.testing.assert_array_equal(fused_ids, host_ids)

    def test_padded_ragged_shape(self):
        """A volume that is not a multiple of the patch stride exercises the
        pad -> cleanup-on-unpadded -> fetch order in finalize()."""
        from segmentation_pipeline_tpu.prediction import PatchPredict

        labels = _blobby_labels(13, shape=(21, 18, 15), n_classes=2)
        chain = [("remove_holes", 8), ("remove_small_components", 3)]
        fused_subjects, _ = PatchPredict(
            image_names=["X"], patch_size=8, patch_overlap=4,
            patch_batch_size=4, device_argmax=True,
            device_postprocess=chain).predict(
                self._model, [self._subject(labels)])
        fused_ids = np.argmax(
            np.asarray(fused_subjects[0]["y_pred"].data), axis=0)

        host_ids = labels.copy()  # voxelwise model reproduces the mask
        host_ids, _ = remove_holes(host_ids, hole_size=8)
        host_ids, _ = remove_small_components(host_ids, 3)
        assert fused_ids.shape == labels.shape
        np.testing.assert_array_equal(fused_ids, host_ids)

    def test_requested_cleanup_never_silently_skipped(self):
        """If device_argmax is demoted (C==1 model) or was never on, a
        REQUESTED device_postprocess must raise, not ship an uncleaned
        segmentation to a caller that skipped its host cleanup."""
        from segmentation_pipeline_tpu.prediction import PatchPredict

        labels = _blobby_labels(3, shape=(16, 16, 16), n_classes=2)
        chain = [("remove_holes", 8)]

        def one_channel_model(x):
            import jax.numpy as jnp

            return (jnp.asarray(x)[:, 0:1] > 0).astype(jnp.float32)

        with pytest.raises(ValueError, match="device_postprocess requires"):
            PatchPredict(image_names=["X"], patch_size=8, patch_overlap=4,
                         device_argmax=True, device_postprocess=chain
                         ).predict(one_channel_model, [self._subject(labels)])

        with pytest.raises(ValueError, match="device_postprocess requires"):
            PatchPredict(image_names=["X"], patch_size=8, patch_overlap=4,
                         device_argmax=False, device_postprocess=chain
                         ).predict(self._model, [self._subject(labels)])


class TestHoistedCCParity:
    """The round-3 optimization hoists connected components out of the
    dilation loops (remove_holes: always; keep_components: whenever
    background holds a keep slot). These tests force MANY dilation
    iterations and hole splits so any divergence from the host's
    recompute-every-iteration semantics shows."""

    def test_serpentine_hole_many_dilations(self):
        """A long 1-voxel-wide serpentine hole fills one shell per
        iteration (~20 iterations) and SPLITS into pieces as it fills —
        each remaining piece must still be treated as a hole."""
        img = np.ones((8, 24, 24), np.int32)
        # carve a serpentine tunnel in the z=4 plane: total < hole_size
        path = []
        for row in range(2, 22, 4):
            rng_cols = range(2, 22) if (row // 4) % 2 == 0 else range(21, 1, -1)
            path += [(row, c) for c in rng_cols]
            if row + 4 < 22:
                path += [(r, path[-1][1]) for r in range(row + 1, row + 4)]
        for r, c in path:
            img[4, r, c] = 0
        hole_voxels = int((img == 0).sum())
        host, hc = remove_holes(img.copy(), hole_size=hole_voxels + 8)
        dev, dc = remove_holes_device(img, hole_size=hole_voxels + 8)
        assert hc == hole_voxels and int(dc) == hc
        assert (host == 0).sum() == 0
        np.testing.assert_array_equal(np.asarray(dev), host)

    def test_multilabel_hole_fill_values_match(self):
        """Hole voxels adopt labels from grey dilation of the surround —
        with two labels bordering one hole the fill VALUES (not just the
        mask) must match host exactly across iterations."""
        img = np.zeros((12, 12, 12), np.int32)
        img[2:10, 2:10, 2:10] = 1
        img[6:10, 2:10, 2:10] = 2
        img[4:8, 4:8, 4:8] = 0  # 64-voxel hole straddling the 1|2 border
        host, hc = remove_holes(img.copy(), hole_size=64)
        dev, dc = remove_holes_device(img, hole_size=64)
        assert hc == 64 and int(dc) == 64
        np.testing.assert_array_equal(np.asarray(dev), host)

    def test_keep_components_speckle_fast_path(self):
        """Adversarial speckle (hundreds of removed components, the 240^3
        bench shape in miniature): background holds a keep slot so the
        fast path runs; it must equal the host's iterative fill exactly."""
        rng = np.random.default_rng(5)
        img = (rng.random((20, 20, 20)) < 0.25).astype(np.int32)
        img[4:14, 4:14, 4:14] = 1  # one dominant blob
        host, hcomp, helems = keep_components(img.copy(), 1)
        dev, dcomp, delems = keep_components_device(img, 1, num_classes=2)
        assert hcomp > 10  # really is speckle
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert (int(dcomp), int(delems)) == (hcomp, helems)

    def test_keep_components_deep_interior_removal(self):
        """A LARGE removed component (deep interior, many erosion shells on
        the host path) must still collapse to background in one fused pass."""
        img = np.zeros((24, 24, 24), np.int32)
        img[1:23, 1:11, 1:23] = 1   # big slab: kept
        img[2:20, 14:22, 2:20] = 2  # slightly smaller slab: removed (num=1)
        host, hcomp, helems = keep_components(img.copy(), 1)
        dev, dcomp, delems = keep_components_device(img, 1, num_classes=3)
        assert helems > 2000  # the removed slab is genuinely large
        np.testing.assert_array_equal(np.asarray(dev), host)
        assert (int(dcomp), int(delems)) == (hcomp, helems)


class TestUnionFindConvergence:
    """Hooking + path compression must converge in near-log sweeps: a
    small-id appendage merging into a large converged body re-propagates
    one shell per sweep under plain pointer jumping (~60+ sweeps here) but
    snaps via the root slot in a handful. The sweep cap makes any
    regression a hard output mismatch, not a slowdown."""

    def test_appendage_converges_under_capped_sweeps(self):
        from scipy import ndimage as ndi

        from segmentation_pipeline_tpu.ops.morphology import (
            compact_labels,
            connected_components_device,
        )

        mask = np.zeros((64, 64, 64), bool)
        mask[8:60, 8:60, 8:60] = True   # large body, min id deep inside
        mask[5:9, 56:59, 56:59] = True  # touching appendage with SMALLER ids
        dev = connected_components_device(mask, connectivity=3,
                                          max_iterations=12)
        compacted, n = compact_labels(dev)
        ref, n_ref = ndi.label(mask, structure=np.ones((3, 3, 3)))
        assert n == n_ref == 1
        np.testing.assert_array_equal(compacted > 0, ref > 0)
        # single component -> a single nonzero label everywhere
        assert set(np.unique(compacted)) == {0, 1}
