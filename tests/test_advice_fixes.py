"""Regression tests for round-1 advisor findings (ADVICE.md)."""
import tarfile

import numpy as np
import pytest

from segmentation_pipeline_tpu.post_processing import sort_by_size, unsort_by_size
from segmentation_pipeline_tpu.prediction import PatchPredict
from segmentation_pipeline_tpu.utils.dataset_files import prepare_dataset_files


class TestDotRootedTar:
    """GNU tar `-C parent ./data` produces './'-rooted member names; root
    detection must normalize them (ADVICE.md medium finding)."""

    def _build_tree(self, tmp_path):
        src = tmp_path / "parent" / "data"
        (src / "sub1").mkdir(parents=True)
        (src / "sub1" / "img.txt").write_text("x")
        return src

    def test_dot_slash_rooted_archive_single_root(self, tmp_path):
        src = self._build_tree(tmp_path)
        archive = tmp_path / "data.tar"
        with tarfile.open(archive, "w") as tar:
            tar.add(src, arcname="./data")  # './data/...' member names
        work = tmp_path / "work"
        work.mkdir()
        target = prepare_dataset_files(archive, work)
        assert target == work / "data"
        # subjects land under the returned path, not one level deeper
        assert (target / "sub1" / "img.txt").exists()
        assert not (target / "data").exists()

    def test_contents_archive_extracts_into_stem_folder(self, tmp_path):
        # `tar -C data .` — archive of the *contents*: multi-rooted after
        # normalization, goes into work/<stem>/ with subjects directly inside
        src = self._build_tree(tmp_path)
        (src / "sub2").mkdir()
        (src / "sub2" / "img.txt").write_text("y")
        archive = tmp_path / "flat.tar"
        with tarfile.open(archive, "w") as tar:
            for child in sorted(src.iterdir()):
                tar.add(child, arcname=f"./{child.name}")
        work = tmp_path / "work2"
        work.mkdir()
        target = prepare_dataset_files(archive, work)
        assert target == work / "flat"
        assert (target / "sub1" / "img.txt").exists()
        assert (target / "sub2" / "img.txt").exists()

    def test_hidden_junk_does_not_break_single_root(self, tmp_path):
        src = self._build_tree(tmp_path)
        junk = tmp_path / ".DS_Store"
        junk.write_text("")
        archive = tmp_path / "withjunk.tar"
        with tarfile.open(archive, "w") as tar:
            tar.add(src, arcname="data")
            tar.add(junk, arcname=".DS_Store")
        work = tmp_path / "work3"
        work.mkdir()
        target = prepare_dataset_files(archive, work)
        assert target == work / "data"
        assert (target / "sub1" / "img.txt").exists()


class TestUnsortBySizeGuard:
    def test_roundtrip(self):
        img = np.array([[0, 0, 5], [5, 9, 9], [9, 9, 0]])
        ranks, sorted_labels, counts = sort_by_size(img)
        assert np.array_equal(unsort_by_size(ranks, sorted_labels), img)

    def test_out_of_range_raises_not_wraps(self):
        sorted_labels = np.array([3, 7])
        with pytest.raises(ValueError, match="dense rank"):
            unsort_by_size(np.array([0, 1, 2]), sorted_labels)  # 2 >= K
        with pytest.raises(ValueError, match="dense rank"):
            unsort_by_size(np.array([-1, 0]), sorted_labels)  # negative wrap


class TestOutChannelsProbeFallback:
    def test_untraceable_callable_returns_none(self):
        def host_model(x):
            # host-side numpy work — not jax-traceable
            return np.asarray(x).sum(axis=1, keepdims=True)

        assert PatchPredict._out_channels_for(host_model, 3, (8, 8, 8)) is None

    def test_traceable_callable_still_probes(self):
        import jax.numpy as jnp

        def model(x):  # channel-first callable
            return jnp.concatenate([x, x], axis=1)

        assert PatchPredict._out_channels_for(model, 3, (8, 8, 8)) == 6
